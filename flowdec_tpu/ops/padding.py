"""Spectrogram padding and waveform normalization helpers.

Functional equivalents of pad_spec / normalize_noisy
(/root/reference/flowdec/util/other.py:25-82). JAX-idiomatic: instead of
returning an undo *closure*, padding returns the original length so callers
can slice — closures don't jit. The time axis is selectable because cpair
features (B, F, T, 2) carry time at axis -2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["pad_spec", "unpad_spec", "normalize_noisy", "padded_num_frames"]

_PAD_MODES = {"zero": "constant", "reflection": "reflect", "replication": "edge"}


def padded_num_frames(n_frames: int, multiple: int = 64) -> int:
    """Number of frames after padding to the given multiple."""
    rem = n_frames % multiple
    return n_frames if rem == 0 else n_frames + (multiple - rem)


def pad_spec(
    Y: jax.Array, mode: str = "zero", multiple: int = 64, axis: int = -1
) -> Tuple[jax.Array, int]:
    """Pad the time axis of a spectrogram to a multiple of `multiple`.

    The reference pads to 64 frames so the 2^k U-Net downsampling divides
    evenly (util/other.py:25-52). Returns (padded, original_n_frames).
    """
    axis = axis % Y.ndim
    T = Y.shape[axis]
    num_pad = padded_num_frames(T, multiple) - T
    if num_pad == 0:
        return Y, T
    pad_widths = [(0, 0)] * Y.ndim
    pad_widths[axis] = (0, num_pad)
    return jnp.pad(Y, pad_widths, mode=_PAD_MODES[mode]), T


def unpad_spec(Y: jax.Array, orig_frames: int, axis: int = -1) -> jax.Array:
    """Undo :func:`pad_spec` by cropping the time axis."""
    axis = axis % Y.ndim
    idx = [slice(None)] * Y.ndim
    idx[axis] = slice(0, orig_frames)
    return Y[tuple(idx)]


def normalize_noisy(
    y: jax.Array, mode: str, x: Optional[jax.Array] = None
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Per-sample peak normalization by max|y| (mode 'noisy').

    Returns (y', x', normfac) with y = y'·normfac. A silence guard resets
    normfac≈0 → 1 to avoid NaN/inf blowups (util/other.py:75-77).
    """
    if mode == "noisy":
        reduce_axes = tuple(range(1, y.ndim))
        normfac = jnp.max(jnp.abs(y), axis=reduce_axes, keepdims=True)
        # matches torch.isclose(normfac, 0) default tolerances (atol=1e-8)
        normfac = jnp.where(normfac <= 1e-8, 1.0, normfac)
    elif mode == "none":
        normfac = jnp.ones((y.shape[0],) + (1,) * (y.ndim - 1), dtype=y.dtype)
    else:
        raise ValueError(f"Unknown normalize mode: {mode}!")

    y = y / normfac
    if x is not None:
        x = x / normfac
    return y, x, normfac
