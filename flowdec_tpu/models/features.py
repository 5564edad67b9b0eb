"""Invertible feature extractors: amplitude-compressed complex STFT.

Capability parity with /root/reference/flowdec/data/feature_extractors.py:
ComplexSTFT (:62-109), CompressAmplitudesAndScale (:112-139), their
composition AmplitudeCompressedComplexSTFT (:29-59), InvertibleSequential and
NoOp (:142-163) — as frozen config dataclasses with pure forward/invert
functions (closures don't jit; configs hash into the jit cache key).
Features are cpair arrays (B, F, T, 2) — see ops/cpair.py.

The invertibility contract `invert(forward(x)) == x` (declared but untested in
the reference, feature_extractors.py:22) is enforced by tests here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from flowdec_tpu.ops.compression import compress_pair, decompress_pair
from flowdec_tpu.ops.stft import StftConfig, istft_pair, stft_pair

__all__ = [
    "FeatureExtractor",
    "ComplexSTFT",
    "CompressAmplitudes",
    "AmplitudeCompressedComplexSTFT",
    "Sequential",
    "NoOp",
]


class FeatureExtractor:
    """Invertible one-to-one feature mapping: forward(x) and a true inverse.

    `window` optionally overrides the static analysis window with a runtime
    array — the hook that makes the window *learnable* (reference
    feature_extractors.py:75 stores it as an nn.Parameter with
    requires_grad=learnable_window; here the learned window lives in the
    model's param pytree and is threaded in per call)."""

    learnable_window: bool = False

    def forward(
        self,
        x: jax.Array,
        comp_eps: Optional[float] = None,
        window: Optional[jax.Array] = None,
    ) -> jax.Array:
        raise NotImplementedError

    def invert(
        self,
        X: jax.Array,
        orig_length: Optional[int] = None,
        window: Optional[jax.Array] = None,
    ) -> jax.Array:
        raise NotImplementedError

    def initial_window(self):
        """Initial window array for learnable-window params, or None."""
        return None

    def __call__(self, x, comp_eps=None, window=None):
        return self.forward(x, comp_eps=comp_eps, window=window)


@dataclasses.dataclass(frozen=True)
class ComplexSTFT(FeatureExtractor):
    """Complex STFT feature of a waveform (B, L), as a cpair array
    (B, F, T, 2); exact istft inverse.

    FlowDec-final geometry: n_fft=1534 → 768 bins, n_hops=4 → hop 384, hann
    (compressed_complex_stft_final.yaml). `method` picks the DFT
    implementation ("auto": matmul-DFT on TPU, FFT elsewhere).

    With learnable_window=True (reference feature_extractors.py:75), the
    window is a model parameter: EnhancementModel.init_params seeds it from
    initial_window() and forward/invert take the live array via `window=`.
    """

    stft_config: StftConfig
    method: str = "auto"
    learnable_window: bool = False

    @property
    def n_bins(self) -> int:
        return self.stft_config.n_bins

    def initial_window(self):
        return self.stft_config.window("float32") if self.learnable_window else None

    def _window(self, window, dtype):
        if window is None:
            return self.stft_config.window(dtype)
        return window.astype(dtype)

    def forward(self, x, comp_eps=None, window=None):
        return stft_pair(
            x, self._window(window, x.dtype), hop_length=self.stft_config.hop,
            center=self.stft_config.center, method=self.method,
        )

    def invert(self, X, orig_length=None, window=None):
        return istft_pair(
            X, self._window(window, X.dtype), hop_length=self.stft_config.hop,
            center=self.stft_config.center, length=orig_length, method=self.method,
        )


@dataclasses.dataclass(frozen=True)
class CompressAmplitudes(FeatureExtractor):
    """X ↦ β·|X|^α·e^{i∠X} with exact inverse."""

    compression_exponent: float  # alpha
    scale_factor: float  # beta

    def forward(self, X, comp_eps=None, window=None):
        return compress_pair(X, self.compression_exponent, self.scale_factor, comp_eps)

    def invert(self, X, orig_length=None, window=None):
        return decompress_pair(X, self.compression_exponent, self.scale_factor)


@dataclasses.dataclass(frozen=True)
class AmplitudeCompressedComplexSTFT(FeatureExtractor):
    """THE FlowDec feature extractor: ComplexSTFT ∘ CompressAmplitudesAndScale."""

    n_fft: int
    sampling_rate: int
    alpha: float
    beta: float
    window_fn: str = "hann"
    hop_length: Optional[int] = None
    n_hops: Optional[int] = None
    method: str = "auto"
    learnable_window: bool = False

    @property
    def complex_stft(self) -> ComplexSTFT:
        return ComplexSTFT(
            StftConfig(
                n_fft=self.n_fft,
                sampling_rate=self.sampling_rate,
                window_fn=self.window_fn,
                hop_length=self.hop_length,
                n_hops=self.n_hops,
            ),
            method=self.method,
            learnable_window=self.learnable_window,
        )

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, length: int) -> int:
        return self.complex_stft.stft_config.num_frames(length)

    def initial_window(self):
        return self.complex_stft.initial_window()

    def forward(self, x, comp_eps=None, window=None):
        X = self.complex_stft.forward(x, window=window)
        return compress_pair(X, self.alpha, self.beta, comp_eps)

    def invert(self, X, orig_length=None, window=None):
        X = decompress_pair(X, self.alpha, self.beta)
        return self.complex_stft.invert(X, orig_length=orig_length, window=window)


@dataclasses.dataclass(frozen=True)
class Sequential(FeatureExtractor):
    """Composable invertible chain (reference InvertibleSequential)."""

    extractors: Tuple[FeatureExtractor, ...]

    @property
    def learnable_window(self) -> bool:
        return any(getattr(e, "learnable_window", False) for e in self.extractors)

    def initial_window(self):
        for e in self.extractors:
            w = e.initial_window()
            if w is not None:
                return w
        return None

    def forward(self, x, comp_eps=None, window=None):
        for e in self.extractors:
            x = e.forward(x, comp_eps=comp_eps, window=window)
        return x

    def invert(self, X, orig_length=None, window=None):
        for e in reversed(self.extractors):
            X = e.invert(X, orig_length=orig_length, window=window)
        return X


@dataclasses.dataclass(frozen=True)
class NoOp(FeatureExtractor):
    def forward(self, x, comp_eps=None, window=None):
        return x

    def invert(self, X, orig_length=None, window=None):
        return X
