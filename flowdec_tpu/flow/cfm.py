"""Conditional flow matching (OT-CFM, Tong et al. 2023) as pure functions.

Capability parity with the torchcfm.ConditionalFlowMatcher usage in the
reference (flowdec/model.py:421-434): given bridge endpoints x0 = Ys (noised
codec features) and x1 = Xs (noised clean features) and per-sample t ~ U(0,1),
produce the location Xt on the (straight, sigma-widened) bridge and the
conditional target velocity Ut.

All randomness is explicit JAX PRNG. The bridge math is linear, so it is
representation-agnostic: it works identically on cpair feature arrays
(B, F, T, 2) and on plain real arrays. Noise generation is explicit:
`crandn_like` (ops/cpair.py) for CN(0,1) feature noise — each re/im component
N(0, 1/2), matching torch.randn_like on complex dtypes, because sigma_y
calibrates against that scale — and `randn_like` for plain N(0,1).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from flowdec_tpu.ops.cpair import crandn_like

__all__ = ["randn_like", "crandn_like", "sample_location_and_conditional_flow", "bridge_statistics"]


def randn_like(key: jax.Array, x: jax.Array) -> jax.Array:
    """Plain standard-normal noise shaped/dtyped like x (real dtypes).

    Drawn in f32 then cast so the realization is bit-identical across
    compute_dtype settings (see ops/cpair.py crandn).
    """
    return jax.random.normal(key, x.shape, dtype=jnp.float32).astype(x.dtype)


def _tpad(t: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast per-sample t (B,) over the trailing dims of x."""
    return t.reshape(t.shape + (1,) * (x.ndim - 1)).astype(x.dtype)


def bridge_statistics(
    x0: jax.Array, x1: jax.Array, t: jax.Array, sigma: float = 0.0
) -> Tuple[jax.Array, jax.Array]:
    """Mean and velocity of the independent-coupling CFM bridge:
    mu_t = (1-t)·x0 + t·x1,  u_t = x1 - x0 (constant in t for sigma const)."""
    tb = _tpad(t, x0)
    mu_t = (1.0 - tb) * x0 + tb * x1
    u_t = x1 - x0
    return mu_t, u_t


def sample_location_and_conditional_flow(
    key: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    t: jax.Array,
    sigma: float = 0.0,
    noise_fn: Callable[[jax.Array, jax.Array], jax.Array] = crandn_like,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample (t, Xt, Ut) for the CFM loss.

    Xt = mu_t + sigma·eps; FlowDec's shipped configs use sigma=0
    (flow_model_final.yaml), in which case no randomness beyond the
    caller-provided t is consumed. noise_fn defaults to CN(0,1) cpair noise.
    """
    xt, ut = bridge_statistics(x0, x1, t)
    if sigma > 0:
        xt = xt + sigma * noise_fn(key, xt)
    return t, xt, ut
