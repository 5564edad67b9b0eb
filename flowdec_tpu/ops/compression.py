"""Power-law amplitude compression of (cpair) complex spectrograms.

Capability parity with CompressAmplitudesAndScale
(/root/reference/flowdec/data/feature_extractors.py:112-139):
forward X ↦ β·|X|^α·e^{i∠X}, exact inverse X ↦ (X/β) with exponent 1/α.

Implemented without trig round-trips: |X|^α·e^{i∠X} == X·|X|^(α-1), one
elementwise chain XLA fuses on the VPU. Operates on cpair arrays (..., 2);
complex-dtype wrappers exist for host-side/test use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flowdec_tpu.ops.cpair import cabs

__all__ = ["compress_pair", "decompress_pair", "compress", "decompress"]


def _pow_scale_pair(X: jax.Array, exponent: float) -> jax.Array:
    """X * |X|^(exponent-1) with a 0-magnitude guard (0 stays exactly 0)."""
    mag = cabs(X)[..., None]
    safe = jnp.where(mag > 0, mag, 1.0)
    return X * jnp.where(mag > 0, safe ** (exponent - 1.0), 0.0).astype(X.dtype)


def compress_pair(
    X: jax.Array, alpha: float, beta: float, comp_eps: float | None = None
) -> jax.Array:
    """β·|X|^α·e^{i∠X} on a cpair array; optional comp_eps added to the real
    part pre-compression (reference :125 adds a real scalar to complex X)."""
    if alpha != 1:
        if comp_eps is not None:
            X = X.at[..., 0].add(comp_eps)
        X = _pow_scale_pair(X, alpha)
    return X * beta


def decompress_pair(X: jax.Array, alpha: float, beta: float) -> jax.Array:
    """Exact inverse of :func:`compress_pair` (up to the comp_eps shift)."""
    X = X / beta
    if alpha != 1:
        X = _pow_scale_pair(X, 1.0 / alpha)
    return X


def compress(X, alpha, beta, comp_eps=None):
    """Complex-dtype wrapper (host/test convenience)."""
    p = jnp.stack([jnp.real(X), jnp.imag(X)], axis=-1)
    p = compress_pair(p, alpha, beta, comp_eps)
    return jax.lax.complex(p[..., 0], p[..., 1])


def decompress(X, alpha, beta):
    """Complex-dtype wrapper (host/test convenience)."""
    p = jnp.stack([jnp.real(X), jnp.imag(X)], axis=-1)
    p = decompress_pair(p, alpha, beta)
    return jax.lax.complex(p[..., 0], p[..., 1])
