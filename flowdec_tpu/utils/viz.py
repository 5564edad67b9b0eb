"""Notebook visualization helpers (spectrograms, complex colormaps).

Capability parity with /root/reference/flowdec/util/viz.py (notebook-only
plotting). Gated on matplotlib; array inputs may be waveforms, magnitude
spectrograms, or cpair complex spectrograms.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["complex_to_rgb", "plot_spectrogram", "plot_complex_spectrogram", "plot_waveform"]


def complex_to_rgb(
    X: np.ndarray, mag_exponent: float = 0.5, max_mag: Optional[float] = None
) -> np.ndarray:
    """Complex (or cpair) spectrogram → RGB: hue = phase, value = |X|^exp."""
    import colorsys

    X = np.asarray(X)
    if X.ndim >= 1 and X.shape[-1] == 2 and not np.iscomplexobj(X):
        X = X[..., 0] + 1j * X[..., 1]
    mag = np.abs(X) ** mag_exponent
    max_mag = max_mag or (mag.max() + 1e-12)
    val = np.clip(mag / max_mag, 0, 1)
    hue = (np.angle(X) / (2 * np.pi)) % 1.0
    hsv = np.stack([hue, np.ones_like(hue), val], axis=-1)
    # vectorized hsv→rgb
    import matplotlib.colors as mcolors

    return mcolors.hsv_to_rgb(hsv)


def plot_spectrogram(x, sr: int, n_fft: int = 1024, hop: Optional[int] = None,
                     db_range: float = 80.0, ax=None, title: Optional[str] = None):
    """Log-magnitude spectrogram of a waveform (or direct magnitude array)."""
    import matplotlib.pyplot as plt

    x = np.asarray(x).squeeze()
    if x.ndim == 1:  # waveform
        from flowdec_tpu.eval.metrics import _power_spectrogram

        hop = hop or n_fft // 4
        spec = np.sqrt(_power_spectrogram(x, n_fft, hop))
    else:
        spec = np.abs(x)
    db = 20 * np.log10(np.maximum(spec, 1e-12))
    vmax = db.max()
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    im = ax.imshow(db, origin="lower", aspect="auto", vmin=vmax - db_range, vmax=vmax,
                   extent=[0, db.shape[1], 0, sr / 2 / 1000.0], cmap="magma")
    ax.set_xlabel("frame")
    ax.set_ylabel("kHz")
    if title:
        ax.set_title(title)
    plt.colorbar(im, ax=ax, label="dB")
    return ax


def plot_complex_spectrogram(X, ax=None, title: Optional[str] = None,
                             mag_exponent: float = 0.5):
    """Phase-as-hue complex spectrogram image (cpair or complex input)."""
    import matplotlib.pyplot as plt

    rgb = complex_to_rgb(np.asarray(X).squeeze(), mag_exponent=mag_exponent)
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    ax.imshow(rgb, origin="lower", aspect="auto")
    ax.set_xlabel("frame")
    ax.set_ylabel("bin")
    if title:
        ax.set_title(title)
    return ax


def plot_waveform(x, sr: int, ax=None, title: Optional[str] = None):
    import matplotlib.pyplot as plt

    x = np.asarray(x).squeeze()
    if ax is None:
        _, ax = plt.subplots(figsize=(10, 2))
    t = np.arange(len(x)) / sr
    ax.plot(t, x, linewidth=0.5)
    ax.set_xlabel("s")
    if title:
        ax.set_title(title)
    return ax


def compare_specs(named_signals, sr: int, n_fft: int = 1024):
    """Stacked spectrograms of {name: waveform} for side-by-side comparison
    (the demo-notebook equivalent of the reference's display cells)."""
    import matplotlib.pyplot as plt

    n = len(named_signals)
    fig, axes = plt.subplots(n, 1, figsize=(10, 3 * n), squeeze=False)
    for ax, (name, x) in zip(axes[:, 0], named_signals.items()):
        plot_spectrogram(x, sr, n_fft=n_fft, ax=ax, title=name)
    fig.tight_layout()
    return fig
