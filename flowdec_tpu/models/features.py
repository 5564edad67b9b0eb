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
    """Invertible one-to-one feature mapping: forward(x) and a true inverse."""

    def forward(self, x: jax.Array, comp_eps: Optional[float] = None) -> jax.Array:
        raise NotImplementedError

    def invert(self, X: jax.Array, orig_length: Optional[int] = None) -> jax.Array:
        raise NotImplementedError

    def __call__(self, x, comp_eps=None):
        return self.forward(x, comp_eps=comp_eps)


@dataclasses.dataclass(frozen=True)
class ComplexSTFT(FeatureExtractor):
    """Complex STFT feature of a waveform (B, L), as a cpair array
    (B, F, T, 2); exact istft inverse.

    FlowDec-final geometry: n_fft=1534 → 768 bins, n_hops=4 → hop 384, hann
    (compressed_complex_stft_final.yaml). `method` picks the DFT
    implementation ("auto": matmul-DFT on TPU, FFT elsewhere).

    The reference optionally makes the window a *learnable* nn.Parameter
    (feature_extractors.py:75, learnable_window); shipped configs never enable
    it, so the window is static here (a learnable window would live in model
    params — tracked as a capability TODO).
    """

    stft_config: StftConfig
    method: str = "auto"

    @property
    def n_bins(self) -> int:
        return self.stft_config.n_bins

    def forward(self, x, comp_eps=None):
        window = self.stft_config.window(x.dtype)
        return stft_pair(
            x, window, hop_length=self.stft_config.hop,
            center=self.stft_config.center, method=self.method,
        )

    def invert(self, X, orig_length=None):
        window = self.stft_config.window(X.dtype)
        return istft_pair(
            X, window, hop_length=self.stft_config.hop,
            center=self.stft_config.center, length=orig_length, method=self.method,
        )


@dataclasses.dataclass(frozen=True)
class CompressAmplitudes(FeatureExtractor):
    """X ↦ β·|X|^α·e^{i∠X} with exact inverse."""

    compression_exponent: float  # alpha
    scale_factor: float  # beta

    def forward(self, X, comp_eps=None):
        return compress_pair(X, self.compression_exponent, self.scale_factor, comp_eps)

    def invert(self, X, orig_length=None):
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
        )

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, length: int) -> int:
        return self.complex_stft.stft_config.num_frames(length)

    def forward(self, x, comp_eps=None):
        X = self.complex_stft.forward(x)
        return compress_pair(X, self.alpha, self.beta, comp_eps)

    def invert(self, X, orig_length=None):
        X = decompress_pair(X, self.alpha, self.beta)
        return self.complex_stft.invert(X, orig_length=orig_length)


@dataclasses.dataclass(frozen=True)
class Sequential(FeatureExtractor):
    """Composable invertible chain (reference InvertibleSequential)."""

    extractors: Tuple[FeatureExtractor, ...]

    def forward(self, x, comp_eps=None):
        for e in self.extractors:
            x = e.forward(x, comp_eps=comp_eps)
        return x

    def invert(self, X, orig_length=None):
        for e in reversed(self.extractors):
            X = e.invert(X, orig_length=orig_length)
        return X


@dataclasses.dataclass(frozen=True)
class NoOp(FeatureExtractor):
    def forward(self, x, comp_eps=None):
        return x

    def invert(self, X, orig_length=None):
        return X
