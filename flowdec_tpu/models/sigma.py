"""Per-frequency-band sigma models for FlowDec.

Capability parity with /root/reference/flowdec/data/sigma_models/__init__.py:
load a 1-D per-band sigma_y curve from .npy, optionally scale and
Gaussian-smooth it, and shape it to broadcast over (B, F, T) features.

The released curves (flowdec_autoparams_{25s,75m}.npy, shape (768,), values
≈0.16-0.58) are data artifacts shipped with this package.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from flowdec_tpu.utils.logging import log

__all__ = ["from_file", "as_band_sigma", "DATA_DIR"]

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def from_file(
    filename: str,
    factor: float = 1.0,
    kernel_bandwidth: Optional[float] = None,
) -> np.ndarray:
    """Load a per-band sigma curve; returns shape (n_bands, 1, 1) — broadcasts
    over the time and pair axes of (B, F, T, 2) cpair features.

    kernel_bandwidth is in frequency-band units (so its meaning depends on the
    curve's resolution, as in the reference).
    """
    if not os.path.isabs(filename):
        filename = os.path.join(DATA_DIR, filename)
    curve = np.load(filename)
    if kernel_bandwidth is not None:
        curve = gaussian_filter(curve, sigma=kernel_bandwidth, mode="nearest")
    log.info(
        f"Loaded sigma_y curve with factor={factor}, "
        f"kernel_bandwidth={kernel_bandwidth} from file {filename}"
    )
    return (factor * curve)[:, None, None].astype(np.float32)


def as_band_sigma(sigma: Union[float, np.ndarray, jax.Array]) -> jax.Array:
    """Normalize a sigma spec (scalar or per-band curve) to an array that
    broadcasts over cpair features (B, F, T, 2): scalar → (), curve (F,) /
    (F,1) / (F,1,1) → (F,1,1)."""
    arr = jnp.asarray(sigma, dtype=jnp.float32)
    if arr.ndim == 0:
        return arr
    if arr.ndim == 1:
        return arr[:, None, None]
    if arr.ndim == 2 and arr.shape[-1] == 1:
        return arr[:, :, None]
    if arr.ndim == 3 and arr.shape[-2:] == (1, 1):
        return arr
    raise ValueError(f"Cannot interpret sigma of shape {arr.shape}")
