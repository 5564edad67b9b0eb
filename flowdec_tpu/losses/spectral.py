"""Spectral reconstruction losses (multi-scale STFT / mel / CQT / waveform).

Parity targets:
  * MultiScaleSTFTLoss (reference losses.py:39-124): windows
    [4096, 2048, 1024, 512], hop w/4, |X| L1 + log10(|X|^2 clamp 1e-5) L1.
    NOTE: the reference uses torch.hann_window (periodic) here — unlike the
    feature extractor's symmetric window — we match that.
  * MelSpectrogramLoss (reference losses.py:127-228): 6 scales, n_mels
    [10..320], windows [128..4096], slaney-normed HTK-less mel filterbanks
    (librosa semantics), log-only by default.
  * CQT + waveform losses: restored capability (stripped from the release).

All losses are differentiable pure functions of (x_hat, x) waveforms (B, L),
suitable for jit/grad inside a finetuning or codec-training step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.ops.stft import stft_pair
from flowdec_tpu.ops.cpair import cabs2

__all__ = [
    "MultiScaleSTFTLoss",
    "ComplexSTFTLoss",
    "SNRLoss",
    "MelSpectrogramLoss",
    "CQTLoss",
    "WaveformL1Loss",
    "mel_filterbank",
]


def _periodic_hann(n: int) -> jnp.ndarray:
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * k / n), jnp.float32)


def _magnitude(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """|STFT| with periodic hann (torch.stft default window in the loss).

    Grad-safe: sqrt(|z|²+eps), NOT plain |z| — d|z|/dz is 0/0=NaN at exactly-
    zero bins, and a tanh-saturated (constant) reconstruction early in codec
    training produces many of them; one such bin NaN'd the whole param tree
    (first NDAC campaign died at step ~50)."""
    window = _periodic_hann(n_fft)
    spec = stft_pair(x, window, hop_length=hop, center=True)
    return jnp.sqrt(cabs2(spec) + 1e-12)  # (..., F, T)


def _power(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """|STFT|² — no sqrt at all, so no zero-bin grad hazard."""
    window = _periodic_hann(n_fft)
    spec = stft_pair(x, window, hop_length=hop, center=True)
    return cabs2(spec)  # (..., F, T)


def _l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def _hz_to_mel(f):
    """Slaney mel scale (librosa htk=False): linear < 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    logstep = np.log(6.4) / 27.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)


@functools.lru_cache(maxsize=32)
def _mel_filterbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank (librosa.filters.mel
    semantics, norm='slaney', htk=False): (n_mels, n_fft//2+1)."""
    fmax = fmax if fmax is not None else sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney norm: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=None) -> jnp.ndarray:
    return jnp.asarray(_mel_filterbank_np(int(sr), int(n_fft), int(n_mels), float(fmin), fmax))


@dataclasses.dataclass(frozen=True)
class MultiScaleSTFTLoss:
    """DDSP-style multi-scale STFT loss."""

    window_lengths: Tuple[int, ...] = (4096, 2048, 1024, 512)
    clamp_eps: float = 1e-5
    mag_weight: float = 1.0
    log_weight: float = 1.0
    pow: float = 2.0
    weight: float = 1.0

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        loss = 0.0
        for w in self.window_lengths:
            m_hat = _magnitude(x_hat, w, w // 4)
            m = _magnitude(x, w, w // 4)
            loss += self.log_weight * _l1(
                jnp.log10(jnp.maximum(m_hat, self.clamp_eps) ** self.pow),
                jnp.log10(jnp.maximum(m, self.clamp_eps) ** self.pow),
            )
            loss += self.mag_weight * _l1(m_hat, m)
        return self.weight * loss


@dataclasses.dataclass(frozen=True)
class MelSpectrogramLoss:
    """Multi-scale mel loss (log-magnitude L1 by default)."""

    sampling_rate: int = 48000
    n_mels: Tuple[int, ...] = (10, 20, 40, 80, 160, 320)
    window_lengths: Tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096)
    clamp_eps: float = 1e-5
    mag_weight: float = 0.0
    log_weight: float = 1.0
    pow: float = 2.0
    weight: float = 1.0
    mel_fmin: Tuple[float, ...] = (0.0,) * 6
    mel_fmax: Tuple[Optional[float], ...] = (None,) * 6

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        loss = 0.0
        for n_mels, w, fmin, fmax in zip(
            self.n_mels, self.window_lengths, self.mel_fmin, self.mel_fmax
        ):
            fb = mel_filterbank(self.sampling_rate, w, n_mels, fmin, fmax)
            # torchaudio MelSpectrogram: power-2 spectrogram → mel
            m_hat = jnp.einsum("mf,...ft->...mt", fb, _power(x_hat, w, w // 4))
            m = jnp.einsum("mf,...ft->...mt", fb, _power(x, w, w // 4))
            if self.log_weight > 0:
                loss += self.log_weight * _l1(
                    jnp.log10(jnp.maximum(m_hat, self.clamp_eps) ** self.pow),
                    jnp.log10(jnp.maximum(m, self.clamp_eps) ** self.pow),
                )
            if self.mag_weight > 0:
                loss += self.mag_weight * _l1(m_hat, m)
        return self.weight * loss


@functools.lru_cache(maxsize=8)
def _cqt_kernels_np(
    sr: int, n_fft: int, bins_per_octave: int, n_bins: int, fmin: float
) -> np.ndarray:
    """Frequency-domain CQT kernel magnitudes: (n_bins, n_fft//2+1).

    Gaussian-window constant-Q bandpass bank evaluated on the FFT grid — the
    magnitude-CQT approximation is sufficient for a spectral loss."""
    n_fft_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_fft_bins)
    q = 1.0 / (2 ** (1.0 / bins_per_octave) - 1)
    kernels = np.zeros((n_bins, n_fft_bins), dtype=np.float32)
    for k in range(n_bins):
        fk = fmin * (2.0 ** (k / bins_per_octave))
        if fk >= sr / 2:
            break
        bw = fk / q
        kernels[k] = np.exp(-0.5 * ((freqs - fk) / (bw / 2 + 1e-9)) ** 2)
        s = kernels[k].sum()
        if s > 0:
            kernels[k] /= s
    return kernels


@dataclasses.dataclass(frozen=True)
class ComplexSTFTLoss:
    """Multi-scale L1 on the COMPLEX STFT residual — the phase-aware
    reconstruction term for non-adversarial codec training.

    Magnitude-only losses (mel / multi-scale |STFT|) leave phase completely
    unconstrained: the r3 NDAC trained on them alone autoencoded at SI-SDR
    −40 dB (spectrally structured, phase random — CAMPAIGN.md r3 §2). The
    residual magnitude |Ẑ−Z| penalizes phase rotation in exact proportion to
    the bin's energy and stays well-conditioned where waveform L1 is not
    (broadband misalignment averages out in the time domain). The DAC/Vocos
    literature's non-GAN phase recipe. Grad-safe at zero residual
    (sqrt(+eps), see _magnitude)."""

    window_lengths: Tuple[int, ...] = (2048, 1024, 512, 256)
    weight: float = 1.0

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        loss = 0.0
        for w in self.window_lengths:
            window = _periodic_hann(w)
            z_hat = stft_pair(x_hat, window, hop_length=w // 4, center=True)
            z = stft_pair(x, window, hop_length=w // 4, center=True)
            loss += jnp.mean(jnp.sqrt(cabs2(z_hat - z) + 1e-12))
        return self.weight * loss


@dataclasses.dataclass(frozen=True)
class SNRLoss:
    """Negative time-domain SNR in dB: −10·log₁₀(‖x‖²/‖x̂−x‖²), per sample.

    The direct waveform-alignment objective for non-adversarial codec
    training: the log makes the gradient self-normalizing (∂/∂x̂ ∝ e/‖e‖²),
    so it keeps pushing as the residual shrinks where an L1 term's gradient
    stays constant-scale and gets swamped by the spectral terms. Scale-
    DEPENDENT on purpose (a codec must reproduce level, so no SI projection).
    eps bounds both logs: silence-robust and ≤~80 dB dynamic range.
    """

    weight: float = 1.0
    eps: float = 1e-8

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        sig = jnp.sum(jnp.square(x), axis=-1)
        err = jnp.sum(jnp.square(x_hat - x), axis=-1)
        snr_db = 10.0 * (jnp.log10(sig + self.eps) - jnp.log10(err + self.eps))
        return self.weight * jnp.mean(-snr_db)


@dataclasses.dataclass(frozen=True)
class CQTLoss:
    """Constant-Q spectral loss (restores the reference's stripped CQT
    finetuning loss; cf. requirements.txt cqt-* pins and
    ablation_nocqt_nowav_75s.yaml)."""

    sampling_rate: int = 48000
    n_fft: int = 2048
    bins_per_octave: int = 12
    n_bins: int = 96  # 8 octaves from fmin
    fmin: float = 32.70  # C1
    clamp_eps: float = 1e-5
    log_weight: float = 1.0
    mag_weight: float = 0.0
    weight: float = 1.0

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        kernels = jnp.asarray(
            _cqt_kernels_np(
                self.sampling_rate, self.n_fft, self.bins_per_octave,
                self.n_bins, self.fmin,
            )
        )
        m_hat = jnp.einsum(
            "kf,...ft->...kt", kernels, _magnitude(x_hat, self.n_fft, self.n_fft // 4)
        )
        m = jnp.einsum(
            "kf,...ft->...kt", kernels, _magnitude(x, self.n_fft, self.n_fft // 4)
        )
        loss = 0.0
        if self.log_weight > 0:
            loss += self.log_weight * _l1(
                jnp.log10(jnp.maximum(m_hat, self.clamp_eps)),
                jnp.log10(jnp.maximum(m, self.clamp_eps)),
            )
        if self.mag_weight > 0:
            loss += self.mag_weight * _l1(m_hat, m)
        return self.weight * loss


@dataclasses.dataclass(frozen=True)
class WaveformL1Loss:
    """Plain time-domain L1 (the stripped waveform finetuning loss)."""

    weight: float = 1.0

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        return self.weight * _l1(x_hat, x)
