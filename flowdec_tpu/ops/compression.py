"""Power-law amplitude compression of complex spectrograms.

Capability parity with CompressAmplitudesAndScale
(/root/reference/flowdec/data/feature_extractors.py:112-139):
forward X ↦ β·|X|^α·e^{i∠X}, exact inverse X ↦ (X/β) with exponent 1/α.

Implemented without trig round-trips: |X|^α·e^{i∠X} == X·|X|^(α-1), which is
one rsqrt-free elementwise chain that XLA fuses on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compress", "decompress"]


def _pow_scale(X: jax.Array, exponent: float) -> jax.Array:
    """X * |X|^(exponent-1) with a 0-magnitude guard (0 stays exactly 0)."""
    mag = jnp.abs(X)
    safe = jnp.where(mag > 0, mag, 1.0)
    return X * jnp.where(mag > 0, safe ** (exponent - 1.0), 0.0).astype(X.dtype)


def compress(
    X: jax.Array, alpha: float, beta: float, comp_eps: float | None = None
) -> jax.Array:
    """β·|X|^α·e^{i∠X}; optional comp_eps added pre-compression (reference :125)."""
    if alpha != 1:
        if comp_eps is not None:
            X = X + comp_eps
        X = _pow_scale(X, alpha)
    return X * beta


def decompress(X: jax.Array, alpha: float, beta: float) -> jax.Array:
    """Exact inverse of :func:`compress` (up to the comp_eps shift)."""
    X = X / beta
    if alpha != 1:
        X = _pow_scale(X, 1.0 / alpha)
    return X
