"""Fused GroupNorm → SiLU → 3×3 conv as one two-phase Pallas kernel.

The r1 lesson (PERF.md): a standalone Pallas conv wins in isolation but
loses end-to-end because every pallas_call is a fusion barrier — the GN/act
neighbors XLA used to fuse into the conv become extra HBM passes. This
kernel makes the barrier pay for itself by folding the whole resblock
prologue into the conv:

    y = conv3x3(silu(group_norm(x) * scale + bias))            (SAME, stride 1)

in 3 HBM passes (stats read, normalize+conv read, output write) instead of
the ~5 XLA uses (stats read, normalize read+write, conv blocked-copy
read+write).

Phases over a sequential TPU grid (B, 2, H/tile_h):
  phase 0: accumulate per-CHANNEL (sum, sumsq) over exact rows — pad columns
           are zeros in HBM so they don't perturb sums; count uses true H·W.
  phase 1: DMA the halo'd tile, normalize + SiLU the whole tile in VMEM,
           MASK pad rows/columns back to zero (SAME conv pads the
           normalized-activated tensor with zeros, so normalization garbage
           at pad positions must be cleared), then per output row: nine
           (Wp8 × C_in) @ (C_in × C_out) MXU matmuls with the dx shift
           applied to the f32 VALUE.

All in-kernel refs are rank ≤ 2 and MXU operands are aligned full rows —
the two hard constraints of this runtime (see ops/conv3x3_pallas.py).

Replaces the reference pattern GroupNorm→act→conv3x3 inside
ResnetBlockBigGANpp (/root/reference/flowdec/backbones/ncsnpp_utils/
layerspp.py:222-284). Backward falls back to the JAX composition (custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_silu_conv3x3", "gn_silu_conv3x3_reference"]


def gn_silu_conv3x3_reference(x, gn_scale, gn_bias, w, b, num_groups, eps=1e-6):
    """Plain composition: flax-style fast-variance GN + SiLU + SAME conv."""
    bsz, h, width, c = x.shape
    cg = c // num_groups
    xg = x.reshape(bsz, h * width, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    norm = ((xg - mean.astype(x.dtype)) * inv.astype(x.dtype)).reshape(bsz, h, width, c)
    y = norm * gn_scale.astype(x.dtype) + gn_bias.astype(x.dtype)
    y = y * jax.nn.sigmoid(y)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _kernel(x_hbm, sb_ref, gmat_ref, w_ref, o_ref,
            x_vmem, yn_ref, acc_ref, stats_ref, sem,
            *, tile_h, width, wp8, cin, num_groups, eps, h, n_tiles):
    i = pl.program_id(0)
    phase = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(phase == 0, j == 0))
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _stats():
        # exact rows (skip the global top pad row): zeros in pad cols are
        # harmless for sums
        cp = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds((j * tile_h + 1) * wp8, tile_h * wp8), :],
            x_vmem.at[pl.ds(0, tile_h * wp8), :],
            sem,
        )
        cp.start()
        cp.wait()
        t32 = x_vmem[0 : tile_h * wp8, :].astype(jnp.float32)
        stats_ref[0, :] += jnp.sum(t32, axis=0)
        stats_ref[1, :] += jnp.sum(jnp.square(t32), axis=0)

    @pl.when(phase == 1)
    def _apply():
        rows = (tile_h + 2) * wp8
        cp = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * tile_h * wp8, rows), :], x_vmem, sem
        )
        cp.start()
        cp.wait()

        gmat = gmat_ref[...]  # (C, G) one-hot membership
        cg = cin // num_groups
        count = jnp.float32(h * width * cg)
        stats_g = jnp.dot(stats_ref[...], gmat, preferred_element_type=jnp.float32)
        mean_g = stats_g[0:1, :] / count
        var_g = jnp.maximum(stats_g[1:2, :] / count - jnp.square(mean_g), 0.0)
        mi_g = jnp.concatenate([mean_g, jax.lax.rsqrt(var_g + eps)], axis=0)
        mi_c = jnp.dot(mi_g, gmat.T, preferred_element_type=jnp.float32)  # (2, C)

        t32 = x_vmem[...].astype(jnp.float32)
        y = (t32 - mi_c[0:1, :]) * mi_c[1:2, :] * sb_ref[0:1, :] + sb_ref[1:2, :]
        y = y * jax.nn.sigmoid(y)

        # zero the pad positions: SAME conv pads the ACTIVATED tensor with 0
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        grow = j * tile_h + pos // wp8 - 1  # global content row index
        col = pos % wp8
        valid = (
            (grow >= 0) & (grow < h) & (col >= 1) & (col <= width)
        ).astype(jnp.float32)
        yn_ref[...] = (y * valid).astype(yn_ref.dtype)

        for r in range(tile_h):
            acc_ref[...] = jnp.zeros_like(acc_ref)
            for dy in range(3):
                row = yn_ref[(r + dy) * wp8 : (r + dy) * wp8 + wp8, :]
                for dx in range(3):
                    tap = dy * 3 + dx
                    p = jax.lax.dot_general(
                        row,
                        w_ref[tap * cin : (tap + 1) * cin, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[...] += jax.lax.slice(p, (dx, 0), (dx + width, p.shape[1]))
            o_ref[r * width : (r + 1) * width, :] = acc_ref[...].astype(o_ref.dtype)


def _pick_tile_h(h, width, wp8, cin, cout, bytes_per):
    budget = 5 * 1024 * 1024
    best = 1
    for t in range(1, h + 1):
        if h % t:
            continue
        need = (
            (t + 2) * wp8 * cin * bytes_per * 2  # x tile + normalized tile
            + 2 * t * width * cout * bytes_per
            + width * cout * 4
        )
        if need <= budget:
            best = t
    return best


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "h", "width", "interpret")
)
def _run(x_flat, sb, gmat, w_flat, *, num_groups, eps, h, width, interpret=False):
    b, hp_wp8, cin = x_flat.shape
    wp8 = hp_wp8 // (h + 2)
    cout = w_flat.shape[-1]
    tile_h = _pick_tile_h(h, width, wp8, cin, cout, x_flat.dtype.itemsize)
    n_tiles = h // tile_h
    grid = (b, 2, n_tiles)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tile_h=tile_h, width=width, wp8=wp8, cin=cin,
            num_groups=num_groups, eps=eps, h=h, n_tiles=n_tiles,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2, cin), lambda i, p, j: (0, 0)),
            pl.BlockSpec((cin, num_groups), lambda i, p, j: (0, 0)),
            pl.BlockSpec((9 * cin, cout), lambda i, p, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile_h * width, cout),
            lambda i, p, j, _nt=n_tiles: (i * _nt + j, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h * width, cout), x_flat.dtype),
        scratch_shapes=[
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM((width, cout), jnp.float32),
            pltpu.VMEM((2, cin), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_flat, sb, gmat, w_flat)
    return out.reshape(b, h, width, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3x3(x, gn_scale, gn_bias, w, b, num_groups, eps=1e-6,
                    interpret=False):
    """conv3x3(silu(group_norm(x)·scale+bias)) fused. x (B,H,W,C); w
    (3,3,C,Cout); b (Cout,) or None-like zeros."""
    return _fwd_impl(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret)


def _fwd_impl(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret):
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    wp8 = ((width + 2 + 7) // 8) * 8
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, wp8 - width - 1), (0, 0)))
    x_flat = x_pad.reshape(bsz, (h + 2) * wp8, cin)
    sb = jnp.stack([gn_scale, gn_bias]).astype(jnp.float32)  # (2, C)
    cg = cin // num_groups
    gmat = jnp.asarray(np.repeat(np.eye(num_groups, dtype=np.float32), cg, axis=0))
    w_flat = w.astype(x.dtype).reshape(9 * cin, cout)
    out = _run(
        x_flat, sb, gmat, w_flat,
        num_groups=num_groups, eps=eps, h=h, width=width, interpret=interpret,
    )
    return out + b.astype(out.dtype)


def _fwd(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret):
    out = _fwd_impl(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret)
    return out, (x, gn_scale, gn_bias, w, b)


def _bwd(num_groups, eps, interpret, res, g):
    x, gn_scale, gn_bias, w, b = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, ww, bc: gn_silu_conv3x3_reference(
            xx, ss, bb, ww, bc, num_groups, eps
        ),
        x, gn_scale, gn_bias, w, b,
    )
    return vjp(g)


gn_silu_conv3x3.defvjp(_fwd, _bwd)
