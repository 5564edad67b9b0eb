"""Native Extended STOI (ESTOI) — no external runtime required.

The reference can only compute ESTOI through the external `pystoi` package
(/root/reference/flowdec/eval/metrics.py:18,273-283); absent that package the
metric degrades to NaN. This is a from-the-paper implementation (J. Jensen
and C. H. Taal, "An Algorithm for Predicting the Intelligibility of Speech
Masked by Modulated Noise Maskers," IEEE/ACM TASLP 2016) so the eval harness
produces real ESTOI numbers in any environment:

  1. resample both signals to 10 kHz,
  2. remove silent frames (energy > max-40 dB VAD on the clean signal),
  3. 512-pt / 50% Hann STFT → 15 one-third-octave bands (150 Hz..~4.3 kHz),
  4. for every 384 ms segment (N=30 frames): mean/variance-normalize each
     band row, then each time column, and average the spectrogram
    correlations between clean and degraded segments.

Numpy only (eval is host-side, like the rest of eval/metrics.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["estoi_np"]

_SR = 10000
_N_FFT = 512
_HOP = 256
_N_BANDS = 15
_CF0 = 150.0
_SEG = 30  # frames per 384 ms segment
_DYN_RANGE = 40.0  # VAD dynamic range (dB)


def _third_octave_matrix() -> np.ndarray:
    """(15, 257) one-third-octave band matrix at 10 kHz / 512-pt FFT."""
    freqs = np.linspace(0.0, _SR / 2, _N_FFT // 2 + 1)
    cfs = _CF0 * 2.0 ** (np.arange(_N_BANDS) / 3.0)
    lo = cfs * 2.0 ** (-1.0 / 6.0)
    hi = cfs * 2.0 ** (1.0 / 6.0)
    H = np.zeros((_N_BANDS, freqs.size), np.float64)
    for i in range(_N_BANDS):
        H[i, (freqs >= lo[i]) & (freqs < hi[i])] = 1.0
    return H


def _resample_to_10k(x: np.ndarray, sr: int) -> np.ndarray:
    if sr == _SR:
        return x
    from scipy.signal import resample_poly

    g = np.gcd(sr, _SR)
    return resample_poly(x, _SR // g, sr // g)


def _frames(x: np.ndarray) -> np.ndarray:
    n = (len(x) - _N_FFT) // _HOP + 1
    if n <= 0:
        return np.zeros((0, _N_FFT))
    idx = np.arange(n)[:, None] * _HOP + np.arange(_N_FFT)[None, :]
    return x[idx]


def estoi_np(clean: np.ndarray, degraded: np.ndarray, sr: int) -> float:
    """ESTOI in [-1, 1] (≈0 for unrelated signals, 1 for identical)."""
    x = _resample_to_10k(np.asarray(clean, np.float64).ravel(), sr)
    y = _resample_to_10k(np.asarray(degraded, np.float64).ravel(), sr)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]

    win = np.hanning(_N_FFT + 2)[1:-1]
    fx, fy = _frames(x) * win, _frames(y) * win
    if fx.shape[0] < _SEG:
        raise ValueError("signal too short for ESTOI (needs ≥ 384 ms of speech)")

    # energy VAD on the clean signal
    e = 20 * np.log10(np.linalg.norm(fx, axis=1) + 1e-12)
    keep = e > (e.max() - _DYN_RANGE)
    fx, fy = fx[keep], fy[keep]
    if fx.shape[0] < _SEG:
        raise ValueError("too few active frames for ESTOI")

    H = _third_octave_matrix()
    X = np.sqrt(H @ (np.abs(np.fft.rfft(fx, axis=1)) ** 2).T)  # (15, T)
    Y = np.sqrt(H @ (np.abs(np.fft.rfft(fy, axis=1)) ** 2).T)

    T = X.shape[1]
    corrs = []
    for m in range(_SEG, T + 1):
        Xm = X[:, m - _SEG: m]
        Ym = Y[:, m - _SEG: m]
        # row (band) normalization
        Xm = Xm - Xm.mean(axis=1, keepdims=True)
        Ym = Ym - Ym.mean(axis=1, keepdims=True)
        Xm = Xm / (np.linalg.norm(Xm, axis=1, keepdims=True) + 1e-12)
        Ym = Ym / (np.linalg.norm(Ym, axis=1, keepdims=True) + 1e-12)
        # column (time) normalization
        Xm = Xm - Xm.mean(axis=0, keepdims=True)
        Ym = Ym - Ym.mean(axis=0, keepdims=True)
        Xm = Xm / (np.linalg.norm(Xm, axis=0, keepdims=True) + 1e-12)
        Ym = Ym / (np.linalg.norm(Ym, axis=0, keepdims=True) + 1e-12)
        # d_m = mean over the N unit-norm time columns of their inner
        # products (paper eq. 7-8): divide by N (=30 frames), not bands
        corrs.append(np.sum(Xm * Ym) / _SEG)
    return float(np.mean(corrs))
