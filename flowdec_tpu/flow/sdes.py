"""Forward SDEs (OUVE / OUVP / BBED) and their reverse-time forms, as pure
closed-form JAX functions.

Capability parity with /root/reference/flowdec/sdes.py: the same three
registered SDE families with identical drift/diffusion/mean/std closed forms,
plus the reverse-SDE/probability-flow-ODE construction (sdes.py:78-125).
Differences by design:
  * stateless frozen dataclasses + explicit PRNG instead of mutable classes
    and torch global RNG;
  * BBED's exponential integral Ei is evaluated on-device with a
    series/continued-fraction hybrid instead of a CPU scipy round-trip that
    hardcoded `.cuda()` (reference quirk, sdes.py:312-315).

t arguments are per-sample vectors (B,); feature tensors are cpair arrays
(B, F, T, 2) — see ops/cpair.py. std broadcasting appends singleton axes
(covering the trailing pair axis too).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.flow.cfm import randn_like
from flowdec_tpu.ops.cpair import crandn_like
from flowdec_tpu.utils.registry import Registry

# Noise generators: `randn_like` = N(0,1) per component (plain real fields);
# `crandn_like` = CN(0,1) cpair noise (spectral features). Callers pick —
# models pass crandn_like so noise scale matches the reference's complex
# torch.randn_like.

__all__ = [
    "SDERegistry",
    "OUVESDE",
    "OUVPSDE",
    "BBEDSDE",
    "ReverseSDE",
    "expi_negative",
]

SDERegistry = Registry("SDE")

_EULER_GAMMA = 0.5772156649015328606


def _e1_series(z: jax.Array, terms: int = 24) -> jax.Array:
    """E1(z) for 0 < z <= 1 via the alternating power series (A&S 5.1.11)."""
    zs = jnp.where(z > 0, z, 1.0)  # guard: branch is masked out by caller
    acc = jnp.zeros_like(zs)
    term = jnp.ones_like(zs)
    for n in range(1, terms + 1):
        term = term * (-zs) / n  # (-z)^n / n!
        acc = acc - term / n  # Σ (-1)^{n+1} z^n/(n·n!)
    return -_EULER_GAMMA - jnp.log(zs) + acc


def _e1_contfrac(z: jax.Array, depth: int = 40) -> jax.Array:
    """E1(z) for z >= 1 via the continued fraction (A&S 5.1.22), bottom-up."""
    zs = jnp.where(z >= 1, z, 1.0)
    t = jnp.zeros_like(zs)
    for n in range(depth, 0, -1):
        t = n / (1.0 + n / (zs + t))
    return jnp.exp(-zs) / (zs + t)


def expi_negative(x: jax.Array) -> jax.Array:
    """Ei(x) for x <= 0, via Ei(x) = -E1(-x); Ei(0) = -inf."""
    z = -x
    small = _e1_series(jnp.clip(z, 1e-30, 1.0))
    large = _e1_contfrac(jnp.maximum(z, 1.0))
    e1 = jnp.where(z <= 1.0, small, large)
    return -e1


def _bstd(std: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast per-sample std (B,) over the trailing dims of x."""
    return std.reshape(std.shape + (1,) * (x.ndim - 1)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class BaseSDE:
    """Shared API: drift/diffusion, marginal mean/std, prior sampling,
    Euler-Maruyama discretization (reference sdes.py:27-76)."""

    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    # subclasses implement: sde(x, t, y) -> (drift, diffusion); mean; std

    def marginal_prob(self, x0, t, y):
        return self.mean(x0, t, y), self.std(t)

    def prior_sampling(self, key: jax.Array, y: jax.Array, noise_fn=randn_like) -> jax.Array:
        t_T = jnp.full((y.shape[0],), self.T, dtype=y.dtype)
        std = self.std(t_T)
        return y + noise_fn(key, y) * _bstd(std, y)

    def discretize(self, x, t, y) -> Tuple[jax.Array, jax.Array]:
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t, y)
        return drift * dt, diffusion * np.sqrt(dt)


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE(BaseSDE):
    """Ornstein-Uhlenbeck Variance-Exploding SDE (reference sdes.py:132-206):

        dx = theta (y - x) dt + sigma_min (sigma_max/sigma_min)^t
             sqrt(2 log(sigma_max/sigma_min)) dw
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.82

    @property
    def logsig(self) -> float:
        return float(np.log(self.sigma_max / self.sigma_min))

    def sde(self, x, t, y):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * np.sqrt(2 * self.logsig)
        return drift, diffusion

    def mean(self, x0, t, y):
        decay = _bstd(jnp.exp(-self.theta * t), x0)
        return decay * x0 + (1.0 - decay) * y

    def std(self, t):
        s, th, lg = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (s**2 * jnp.exp(-2 * th * t) * (jnp.exp(2 * (th + lg) * t) - 1) * lg)
            / (th + lg)
        )


@SDERegistry.register("ouvp")
@dataclasses.dataclass(frozen=True)
class OUVPSDE(BaseSDE):
    """OU Variance-Preserving SDE (reference sdes.py:209-271; declared unstable
    there and unused by shipped configs, kept for capability parity):

        dx = -1/2 beta(t) stiffness (y-x) dt + sqrt(beta(t)) dw
    """

    beta_min: float = 0.01
    beta_max: float = 1.0
    stiffness: float = 1.0

    def _beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t, y):
        drift = 0.5 * self.stiffness * _bstd(self._beta(t), y) * (y - x)
        diffusion = jnp.sqrt(self._beta(t))
        return drift, diffusion

    def mean(self, x0, t, y):
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        fac = _bstd(jnp.exp(-0.25 * s * t * (t * (b1 - b0) + 2 * b0)), x0)
        return y + fac * (x0 - y)

    def std(self, t):
        # NOTE deliberate fix vs the reference: sdes.py:259-261 returns the
        # *variance* (1-exp(-s∫β))/s without the square root. Solving the
        # variance ODE dP/dt = -sβ(t)P + β(t) gives P(t) = (1-exp(-s∫β))/s,
        # so the standard deviation is sqrt(P). (The reference flags this SDE
        # as unstable and unused — the missing sqrt is the likely culprit.)
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        return jnp.sqrt((1.0 - jnp.exp(-0.5 * s * t * (t * (b1 - b0) + 2 * b0))) / s)


@SDERegistry.register("bbed")
@dataclasses.dataclass(frozen=True)
class BBEDSDE(BaseSDE):
    """Brownian Bridge with Exponential Diffusion coefficient (Lay et al. 2024;
    reference sdes.py:274-325):

        dx = (y - x)/(1-t) dt + c k^t dw,   T = 0.999
    """

    c: float = 0.1
    k: float = 10.0

    @property
    def T(self) -> float:
        return 0.999

    @property
    def logk(self) -> float:
        return float(np.log(self.k))

    def sde(self, x, t, y):
        drift = (y - x) / _bstd(1.0 - t, x)
        diffusion = self.c * self.k**t
        return drift, diffusion

    def mean(self, x0, t, y):
        tb = _bstd(t, x0)
        return (1.0 - tb) * x0 + tb * y

    def std(self, t):
        logk = self.logk
        t1 = 1.0 - t
        # constant Ei(-2 log k) term evaluated eagerly at trace time
        ei_logk = float(expi_negative(jnp.asarray(-2.0 * logk)))
        ei = expi_negative(2.0 * (t - 1.0) * logk) - ei_logk
        var = (self.k ** (2 * t) - t1) + (2 * self.k * self.k * logk) * t1 * ei
        return jnp.sqrt(t1 * (self.c**2) * var)


ScoreFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]  # (x, y, t) -> score


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE / probability-flow ODE of a forward SDE
    (reference sdes.py:78-125), with the score supplied as a closure."""

    fwd: BaseSDE
    score_fn: ScoreFn
    probability_flow: bool = False

    @property
    def N(self) -> int:
        return self.fwd.N

    @property
    def T(self) -> float:
        return self.fwd.T

    def sde(self, x, t, y):
        parts = self.rsde_parts(x, t, y)
        return parts["total_drift"], parts["diffusion"]

    def rsde_parts(self, x, t, y):
        sde_drift, sde_diffusion = self.fwd.sde(x, t, y)
        score = self.score_fn(x, y, t)
        factor = 0.5 if self.probability_flow else 1.0
        score_drift = -_bstd(sde_diffusion**2, x) * score * factor
        diffusion = (
            jnp.zeros_like(sde_diffusion) if self.probability_flow else sde_diffusion
        )
        return {
            "total_drift": sde_drift + score_drift,
            "diffusion": diffusion,
            "sde_drift": sde_drift,
            "sde_diffusion": sde_diffusion,
            "score_drift": score_drift,
            "score": score,
        }

    def discretize(self, x, t, y):
        f, g = self.fwd.discretize(x, t, y)
        factor = 0.5 if self.probability_flow else 1.0
        rev_f = f - _bstd(g**2, x) * self.score_fn(x, y, t) * factor
        rev_g = jnp.zeros_like(g) if self.probability_flow else g
        return rev_f, rev_g
