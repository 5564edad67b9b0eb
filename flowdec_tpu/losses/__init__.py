"""Auxiliary (finetuning / codec-training) losses, in JAX.

Capability parity with /root/reference/flowdec/losses.py — which the release
exports but never wires into training (SURVEY.md §2.5): multi-scale STFT
loss, multi-scale mel loss (slaney-norm filterbanks), and a PESQ speech loss
gated on its external runtime. Additionally restores the CQT + waveform
losses the reference stripped (its requirements.txt still pins cqt packages
and the `ablation_nocqt_nowav_75s` config names them).

Losses carry `only_applies_to` so the training loop can route them by
audiotype (e.g. PESQ on speech only, reference losses.py:15).
"""

from flowdec_tpu.losses.spectral import (
    ComplexSTFTLoss,
    SNRLoss,
    CQTLoss,
    MelSpectrogramLoss,
    MultiScaleSTFTLoss,
    WaveformL1Loss,
    mel_filterbank,
)
from flowdec_tpu.losses.pesq import TorchPESQSpeechLoss
from flowdec_tpu.losses.pesq_jax import PesqSurrogateLoss

__all__ = [
    "ComplexSTFTLoss",
    "SNRLoss",
    "CQTLoss",
    "MelSpectrogramLoss",
    "MultiScaleSTFTLoss",
    "WaveformL1Loss",
    "mel_filterbank",
    "TorchPESQSpeechLoss",
    "PesqSurrogateLoss",
]
