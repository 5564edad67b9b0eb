"""Native Extended STOI (ESTOI) — no external runtime required.

The reference can only compute ESTOI through the external `pystoi` package
(/root/reference/flowdec/eval/metrics.py:18,273-283); absent that package the
metric degrades to NaN. This is a from-the-paper implementation (J. Jensen
and C. H. Taal, "An Algorithm for Predicting the Intelligibility of Speech
Masked by Modulated Noise Maskers," IEEE/ACM TASLP 2016) so the eval harness
produces real ESTOI numbers in any environment. It follows the published
framing exactly (= pystoi's), so native values track pystoi:

  1. resample both signals to 10 kHz,
  2. remove silent frames: 256-sample / 50%-overlap Hann frames, keep frames
     whose clean-signal energy is within 40 dB of the max, overlap-add the
     kept (windowed) frames back into a signal,
  3. 256-sample / hop-128 Hann frames zero-padded to a 512-pt rfft
     → 15 one-third-octave bands (150 Hz..~4.3 kHz, band edges snapped to
     the nearest FFT bin),
  4. for every 384 ms segment (N=30 frames at hop 128): mean/variance-
     normalize each band row, then each time column, and average the
     spectrogram correlations between clean and degraded segments.

Numpy only (eval is host-side, like the rest of eval/metrics.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["estoi_np"]

_SR = 10000
_N_FRAME = 256  # analysis window (25.6 ms)
_HOP = _N_FRAME // 2
_N_FFT = 512  # zero-padded FFT size
_N_BANDS = 15
_CF0 = 150.0
_SEG = 30  # frames per 384 ms segment (30 × 12.8 ms hop)
_DYN_RANGE = 40.0  # VAD dynamic range (dB)


def _third_octave_matrix() -> np.ndarray:
    """(15, 257) one-third-octave band matrix at 10 kHz / 512-pt FFT.

    Band edges are snapped to the nearest FFT bin (the published/pystoi
    construction), not thresholded, so edge bins land in the same band.
    """
    freqs = np.linspace(0.0, _SR / 2, _N_FFT // 2 + 1)
    k = np.arange(_N_BANDS, dtype=np.float64)
    lo = _CF0 * 2.0 ** ((2 * k - 1) / 6.0)
    hi = _CF0 * 2.0 ** ((2 * k + 1) / 6.0)
    H = np.zeros((_N_BANDS, freqs.size), np.float64)
    for i in range(_N_BANDS):
        lo_bin = int(np.argmin(np.abs(freqs - lo[i])))
        hi_bin = int(np.argmin(np.abs(freqs - hi[i])))
        H[i, lo_bin:hi_bin] = 1.0
    return H


def _resample_to_10k(x: np.ndarray, sr: int) -> np.ndarray:
    if sr == _SR:
        return x
    from scipy.signal import resample_poly

    g = np.gcd(sr, _SR)
    return resample_poly(x, _SR // g, sr // g)


def _hann(n: int) -> np.ndarray:
    # symmetric Hann without the zero endpoints (the STOI reference framing)
    return np.hanning(n + 2)[1:-1]


def _frames(x: np.ndarray, frame: int = _N_FRAME, hop: int = _HOP) -> np.ndarray:
    n = (len(x) - frame) // hop + 1
    if n <= 0:
        return np.zeros((0, frame))
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    return x[idx]


def _remove_silent_frames(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Energy VAD on the clean signal, applied to both by overlap-add of the
    kept windowed 256/128 frames (the published silent-frame removal)."""
    win = _hann(_N_FRAME)
    fx = _frames(x) * win
    fy = _frames(y) * win
    if fx.shape[0] == 0:
        raise ValueError("signal too short for ESTOI (needs ≥ 384 ms of speech)")
    e = 20 * np.log10(np.linalg.norm(fx, axis=1) + 1e-12)
    keep = e > (e.max() - _DYN_RANGE)
    fx, fy = fx[keep], fy[keep]
    n_keep = fx.shape[0]
    if n_keep == 0:
        raise ValueError("too few active frames for ESTOI")
    out_len = (n_keep - 1) * _HOP + _N_FRAME
    x_sil = np.zeros(out_len)
    y_sil = np.zeros(out_len)
    for i in range(n_keep):
        x_sil[i * _HOP: i * _HOP + _N_FRAME] += fx[i]
        y_sil[i * _HOP: i * _HOP + _N_FRAME] += fy[i]
    return x_sil, y_sil


def estoi_np(clean: np.ndarray, degraded: np.ndarray, sr: int) -> float:
    """ESTOI in [-1, 1] (≈0 for unrelated signals, 1 for identical)."""
    x = _resample_to_10k(np.asarray(clean, np.float64).ravel(), sr)
    y = _resample_to_10k(np.asarray(degraded, np.float64).ravel(), sr)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]

    x, y = _remove_silent_frames(x, y)

    win = _hann(_N_FRAME)
    fx = _frames(x) * win
    fy = _frames(y) * win
    if fx.shape[0] < _SEG:
        raise ValueError("too few active frames for ESTOI")

    H = _third_octave_matrix()
    # 256-sample frames zero-padded to a 512-pt rfft
    X = np.sqrt(H @ (np.abs(np.fft.rfft(fx, n=_N_FFT, axis=1)) ** 2).T)  # (15, T)
    Y = np.sqrt(H @ (np.abs(np.fft.rfft(fy, n=_N_FFT, axis=1)) ** 2).T)

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
