"""PESQ speech loss (gated wrapper).

Capability parity with TorchPESQSpeechLoss (/root/reference/flowdec/
losses.py:14-37): a differentiable PESQ surrogate applied only to speech
audio (`only_applies_to = ['speech']`), values clamped at 10.

The reference delegates to the external `torch_pesq` package; this wrapper
gates on that package and degrades with a clear error otherwise. NOTE: this
wrapper is host-side and NON-differentiable inside jit (returns a Python
float) — for a PESQ TRAINING signal use losses.pesq_jax.PesqSurrogateLoss,
the JAX-native perceptual surrogate that runs inside the jitted finetune
step. Keep this wrapper for eval-style spot checks only.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TorchPESQSpeechLoss"]


class TorchPESQSpeechLoss:
    only_applies_to = ["speech"]

    def __repr__(self):
        return "TorchPESQSpeechLoss()"

    def __init__(self, sampling_rate: int):
        from torch_pesq import PesqLoss  # gated import

        import torch

        self._torch = torch
        self.pesq_loss = PesqLoss(1.0, sampling_rate)

    def __call__(self, x_hat, x):
        torch = self._torch
        x_hat_t = torch.as_tensor(np.asarray(x_hat)).reshape(-1, np.asarray(x_hat).shape[-1])
        x_t = torch.as_tensor(np.asarray(x)).reshape(-1, np.asarray(x).shape[-1])
        vals = self.pesq_loss(x_t, x_hat_t)
        return float(vals.clamp(max=10).mean())
