"""SigMOS (ITU-T P.804) estimator wrapper.

Capability parity with /root/reference/flowdec/eval/sigmos/sigmos.py: a
numpy STFT front-end (960-point sqrt-hann window, hop 480, power-law
compressed magnitude + complex features) feeding an ONNX model. The .onnx
weights are NOT shipped (same as the reference repo); construction requires
both `onnxruntime` and a model file.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

__all__ = ["SigMOS"]


def _sqrt_hann(n: int) -> np.ndarray:
    k = np.arange(n)
    return np.sqrt(0.5 - 0.5 * np.cos(2 * np.pi * k / n))


class SigMOS:
    """P.804 multi-dimension MOS estimator (OVRL/SIG/NOISE/COL/DISC/LOUD/REVERB)."""

    SAMPLE_RATE = 48000
    N_FFT = 960
    HOP = 480
    COMPRESSION = 0.3

    RESULT_KEYS = (
        "MOS_COL", "MOS_DISC", "MOS_LOUD", "MOS_NOISE", "MOS_REVERB",
        "MOS_SIG", "MOS_OVRL",
    )

    def __init__(self, model_dir: Optional[str] = None, model_name: str = "model-sigmos_1697718653_41d092e8-epo-200.onnx"):
        import onnxruntime as ort  # gated import

        model_dir = model_dir or os.path.dirname(__file__)
        model_path = os.path.join(model_dir, model_name)
        if not os.path.exists(model_path):
            raise FileNotFoundError(
                f"SigMOS ONNX weights not found at {model_path} — the model "
                "file is not distributed with this repo (nor the reference); "
                "place it there to enable SIGMOS."
            )
        opts = ort.SessionOptions()
        opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        self.session = ort.InferenceSession(model_path, opts, providers=["CPUExecutionProvider"])
        self.window = _sqrt_hann(self.N_FFT)

    def _stft_features(self, audio: np.ndarray) -> np.ndarray:
        """Power-law-compressed complex STFT features (frames, bins, 2)."""
        pad = self.N_FFT - self.HOP
        x = np.pad(audio, (pad, pad))
        n_frames = 1 + (len(x) - self.N_FFT) // self.HOP
        idx = np.arange(n_frames)[:, None] * self.HOP + np.arange(self.N_FFT)[None, :]
        frames = x[idx] * self.window
        spec = np.fft.rfft(frames, axis=-1)
        mag = np.abs(spec)
        comp = np.where(mag > 0, mag**self.COMPRESSION, 0.0)
        phase = np.where(mag > 0, spec / np.maximum(mag, 1e-12), 0.0)
        comp_spec = comp * phase
        return np.stack([comp_spec.real, comp_spec.imag], axis=-1).astype(np.float32)

    def run(self, audio: np.ndarray, sr: Optional[int] = None) -> Dict[str, float]:
        if sr is not None and sr != self.SAMPLE_RATE:
            from flowdec_tpu.data.dataset import resample_np

            audio = resample_np(np.asarray(audio, np.float32)[None], sr, self.SAMPLE_RATE)[0]
        feats = self._stft_features(np.asarray(audio, np.float32))[None]
        out = self.session.run(None, {self.session.get_inputs()[0].name: feats})[0][0]
        return {k: float(v) for k, v in zip(self.RESULT_KEYS, out)}
