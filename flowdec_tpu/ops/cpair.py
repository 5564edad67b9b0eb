"""Complex-as-real-pair representation ("cpair"): arrays (..., 2) = (re, im).

TPUs have no complex ALU; some TPU runtimes (including this one) don't even
implement XLA's complex decomposition. The framework therefore carries every
spectral feature as a float array with a trailing (re, im) axis and implements
the little complex arithmetic it needs explicitly. This also matches the
backbone's native view (complex x and y were always flattened to 4 real
channels at its input — reference ncsnpp.py:401-404).

Conventions:
  * waveforms: real float (B, L)
  * features:  float (B, F, T, 2)
  * "CN(0,1)" noise: each of re/im ~ N(0, 1/2) so E|z|² = 1, matching
    torch.randn_like on complex tensors (noise-scale parity with sigma_y).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "to_cpair",
    "from_cpair",
    "cabs",
    "cabs2",
    "cmul",
    "conj",
    "crandn_like",
    "crandn",
]


def to_cpair(z) -> jax.Array:
    """complex array → (..., 2) float pair."""
    z = jnp.asarray(z)
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def from_cpair(p) -> np.ndarray:
    """(..., 2) pair → complex numpy array (host-side boundary helper)."""
    p = np.asarray(p)
    return p[..., 0] + 1j * p[..., 1]


def cabs2(p: jax.Array) -> jax.Array:
    """|z|² — shape (..., ) with the pair axis reduced."""
    return jnp.sum(jnp.square(p), axis=-1)


def cabs(p: jax.Array) -> jax.Array:
    """|z| — shape (..., ) with the pair axis reduced."""
    return jnp.sqrt(cabs2(p))


def cmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Complex multiply of two cpair arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def conj(a: jax.Array) -> jax.Array:
    return a * jnp.asarray([1.0, -1.0], dtype=a.dtype)


def crandn(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """CN(0,1) noise as a cpair array of the given shape (must end in 2).

    Always DRAWN in f32 then cast: jax.random.normal returns different values
    for bf16 vs f32 under the same key, so drawing in the feature dtype would
    make the noise realization (and thus every seeded enhance/training result)
    silently depend on compute_dtype config.
    """
    assert shape[-1] == 2, f"cpair shape must end in 2, got {shape}"
    z = jax.random.normal(key, shape, jnp.float32) * np.float32(2.0**-0.5)
    return z.astype(dtype)


def crandn_like(key: jax.Array, x: jax.Array) -> jax.Array:
    """CN(0,1) noise shaped like the cpair array x."""
    return crandn(key, x.shape, jnp.asarray(x).dtype)
