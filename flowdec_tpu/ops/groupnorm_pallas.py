"""Fused GroupNorm + SiLU as a Pallas TPU kernel.

Device profiling (PERF.md) attributes ~17% of enhance time to GroupNorm
statistics reductions: every resblock runs GN→SiLU twice, each a full
HBM read for stats plus a read-modify-write for normalization. This kernel
fuses statistics, normalization, affine and SiLU into one two-phase pass over
H-tiles (sequential TPU grid): phase 0 accumulates per-group (sum, sumsq)
into VMEM scratch; phase 1 normalizes + activates and writes the output.

Matches nn.GroupNorm(num_groups, eps, use_bias, use_scale) followed by SiLU
bit-closely (same E[x²]−E[x]² fast-variance formulation flax uses).

The backward pass falls back to the plain JAX composition via custom_vjp, so
the kernel is safe inside training graphs too (fwd fused, bwd recomputed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_group_norm_silu", "group_norm_silu_reference"]


def group_norm_silu_reference(
    x: jax.Array, scale: jax.Array, bias: jax.Array, num_groups: int, eps: float
) -> jax.Array:
    """Plain JAX composition (flax GroupNorm fast-variance + SiLU)."""
    b, h, w, c = x.shape
    cg = c // num_groups
    xg = x.reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    mean2 = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    norm = ((xg - mean) * inv).reshape(b, h, w, c)
    return jax.nn.silu(norm * scale + bias)


def _kernel(x_ref, scale_ref, bias_ref, gmat_ref, o_ref, stats_ref, *,
            num_groups, eps, n_h_tiles):
    """Mosaic-friendly formulation: no reshapes across lanes. Phase 0 keeps
    PER-CHANNEL (sum, sumsq) — a sublane reduction; phase 1 folds channels →
    groups and broadcasts back via one-hot matmuls with gmat (C, G)."""
    phase = pl.program_id(1)
    h_tile = pl.program_id(2)

    tile = x_ref[0]  # (H_tile, W, C)
    ht, w, c = tile.shape
    cg = c // num_groups

    @pl.when(jnp.logical_and(phase == 0, h_tile == 0))
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _accumulate():
        t32 = tile.astype(jnp.float32)
        stats_ref[0, :] += jnp.sum(t32, axis=(0, 1))  # (C,)
        stats_ref[1, :] += jnp.sum(jnp.square(t32), axis=(0, 1))

    @pl.when(phase == 1)
    def _apply():
        gmat = gmat_ref[...]  # (C, G) one-hot group membership
        count = jnp.float32(ht * n_h_tiles * w * cg)
        # 2-D matmuls only (this Mosaic rejects vector×matrix dots):
        # (2, C) @ (C, G) → per-group sums; fold back (2, G) @ (G, C) → (2, C)
        stats_g = jnp.dot(stats_ref[...], gmat, preferred_element_type=jnp.float32)
        mean_g = stats_g[0:1, :] / count  # (1, G)
        var_g = jnp.maximum(stats_g[1:2, :] / count - jnp.square(mean_g), 0.0)
        mi_g = jnp.concatenate([mean_g, jax.lax.rsqrt(var_g + eps)], axis=0)  # (2, G)
        mi_c = jnp.dot(mi_g, gmat.T, preferred_element_type=jnp.float32)  # (2, C)
        mean_c = mi_c[0, :]
        inv_c = mi_c[1, :]
        t32 = tile.astype(jnp.float32)
        y = (t32 - mean_c) * inv_c * scale_ref[...].astype(jnp.float32) + (
            bias_ref[...].astype(jnp.float32)
        )
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_silu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-6,
    h_tile: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """silu(group_norm(x) * scale + bias) in one fused Pallas pass.

    x: (B, H, W, C) with C % num_groups == 0; scale/bias: (C,).
    h_tile: H tile size (0 = auto: whole H if it fits ~8 MB VMEM, else split).
    interpret: run the Pallas interpreter (CPU testing).
    """
    return _fused_fwd_impl(x, scale, bias, num_groups, eps, h_tile, interpret)


def _pick_h_tile(h: int, w: int, c: int, budget_bytes: int = int(1.5 * 2**20)) -> int:
    """Pick an H tile whose in+out double-buffered VMEM footprint
    (~4× the block) stays within the ~16 MB scoped limit."""
    bytes_per_row = w * c * 4
    rows = max(1, budget_bytes // max(1, bytes_per_row))
    # largest divisor of h that is <= rows
    for cand in range(min(rows, h), 0, -1):
        if h % cand == 0:
            return cand
    return 1


def _fused_fwd_impl(x, scale, bias, num_groups, eps, h_tile, interpret=False):
    b, h, w, c = x.shape
    assert c % num_groups == 0
    ht = h_tile or _pick_h_tile(h, w, c)
    assert h % ht == 0, f"H={h} not divisible by tile {ht}"
    n_h_tiles = h // ht

    kernel = functools.partial(
        _kernel, num_groups=num_groups, eps=eps, n_h_tiles=n_h_tiles
    )
    cg = c // num_groups
    gmat = jnp.asarray(
        np.repeat(np.eye(num_groups, dtype=np.float32), cg, axis=0)
    )  # (C, G) one-hot group membership
    grid = (b, 2, n_h_tiles)  # batch → phase → h-tile (sequential on TPU)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(
                (1, ht, w, c), lambda bi, p, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c,), lambda bi, p, hi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, p, hi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, num_groups), lambda bi, p, hi: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ht, w, c), lambda bi, p, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14 * 2**20)
        ),
    )(x, scale, bias, gmat)


def _fwd(x, scale, bias, num_groups, eps, h_tile, interpret):
    out = _fused_fwd_impl(x, scale, bias, num_groups, eps, h_tile, interpret)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, h_tile, interpret, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda xx, ss, bb: group_norm_silu_reference(xx, ss, bb, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_silu.defvjp(_fwd, _bwd)
