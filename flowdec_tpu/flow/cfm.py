"""Conditional flow matching (OT-CFM, Tong et al. 2023) as pure functions.

Capability parity with the torchcfm.ConditionalFlowMatcher usage in the
reference (flowdec/model.py:421-434): given bridge endpoints x0 = Ys (noised
codec features) and x1 = Xs (noised clean features) and per-sample t ~ U(0,1),
produce the location Xt on the (straight, sigma-widened) bridge and the
conditional target velocity Ut.

All randomness is explicit JAX PRNG. Complex tensors use the circular complex
normal CN(0,1) (Re, Im each N(0, 1/2)) to match torch.randn_like on complex
dtypes — noise *scale* parity matters because sigma_y calibrates it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["randn_like", "sample_location_and_conditional_flow", "bridge_statistics"]


def randn_like(key: jax.Array, x: jax.Array) -> jax.Array:
    """Standard normal for real x; circular complex normal CN(0,1) for complex x."""
    if jnp.iscomplexobj(x):
        real_dtype = jnp.finfo(x.dtype).dtype
        z = jax.random.normal(key, (*x.shape, 2), dtype=real_dtype)
        return jax.lax.complex(z[..., 0], z[..., 1]) * (2.0 ** -0.5)
    return jax.random.normal(key, x.shape, dtype=x.dtype)


def _tpad(t: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast per-sample t (B,) over the trailing dims of x."""
    return t.reshape(t.shape + (1,) * (x.ndim - 1))


def bridge_statistics(
    x0: jax.Array, x1: jax.Array, t: jax.Array, sigma: float
) -> Tuple[jax.Array, jax.Array]:
    """Mean and velocity of the independent-coupling CFM bridge:
    mu_t = (1-t)·x0 + t·x1,  u_t = x1 - x0 (constant in t for sigma const)."""
    tb = _tpad(t, x0).astype(jnp.real(x0).dtype)
    mu_t = (1.0 - tb) * x0 + tb * x1
    u_t = x1 - x0
    return mu_t, u_t


def sample_location_and_conditional_flow(
    key: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    t: jax.Array,
    sigma: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample (t, Xt, Ut) for the CFM loss.

    Xt = mu_t + sigma·eps with eps ~ N(0,1) (CN(0,1) when complex); FlowDec's
    shipped configs use sigma=0 (flow_model_final.yaml), in which case no
    randomness beyond the caller-provided t is consumed.
    """
    xt, ut = bridge_statistics(x0, x1, t, sigma)
    if sigma > 0:
        xt = xt + sigma * randn_like(key, xt)
    return t, xt, ut
