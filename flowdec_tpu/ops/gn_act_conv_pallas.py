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

__all__ = [
    "gn_silu_conv3x3",
    "gn_silu_conv3x3_v2",
    "gn_silu_conv3x3_v3",
    "gn_silu_conv3x3_reference",
]


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
    (3,3,C,Cout); b (Cout,) REQUIRED (pass zeros for no bias — unlike
    v2/v3, v1 does not accept None)."""
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


# ---------------------------------------------------------------------------
# v2: single-phase kernel with XLA-side statistics and double-buffered DMA.
#
# v1 measured 4.2x RT end-to-end vs 8.96x unfused (PERF.md): its VMEM layout
# forced tile_h=2 → 768 grid steps per big conv, each a serial
# start();wait() DMA with no overlap, plus a second full stats pass inside
# the same sequential grid. v2 fixes both:
#   * GN statistics are one cheap XLA reduce over x (bandwidth-bound read
#     that XLA can schedule/fuse freely); the kernel receives per-(batch,
#     channel) affine rows A=inv*gamma, B=beta-mean*inv*gamma.
#   * one grid pass; normalize+SiLU happens in-place in the DMA'd tile, so
#     no second tile buffer; freed VMEM buys tile_h 6-8 (3-4x fewer steps).
#   * two DMA slots: step idx starts slot[(idx+1)%2]'s copy before waiting
#     on slot[idx%2] — compute and HBM traffic overlap.
#   * the conv bias rides in acc init (one XLA output pass removed).
# ---------------------------------------------------------------------------


def _compute_tile(x_vmem, ab_ref, w_ref, bt_ref, o_ref, acc_ref,
                  *, j, tile_h, width, wp8, cin, h):
    rows = (tile_h + 2) * wp8
    t32 = x_vmem[...].astype(jnp.float32)
    y = t32 * ab_ref[0:1, :] + ab_ref[1:2, :]
    y = y * jax.nn.sigmoid(y)
    # zero pad positions: SAME conv pads the ACTIVATED tensor with zeros
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    grow = j * tile_h + pos // wp8 - 1
    col = pos % wp8
    valid = ((grow >= 0) & (grow < h) & (col >= 1) & (col <= width)).astype(
        jnp.float32
    )
    x_vmem[...] = (y * valid).astype(x_vmem.dtype)

    for r in range(tile_h):
        acc_ref[...] = jnp.broadcast_to(bt_ref[0:1, :], acc_ref.shape)
        for dy in range(3):
            row = x_vmem[(r + dy) * wp8 : (r + dy) * wp8 + wp8, :]
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


def _kernel_v2(x_hbm, ab_ref, w_ref, bt_ref, o_ref,
               xa_ref, xb_ref, acc_ref, sem,
               *, tile_h, width, wp8, cin, h, n_tiles, n_batch):
    i = pl.program_id(0)
    j = pl.program_id(1)
    idx = i * n_tiles + j
    total = n_batch * n_tiles

    def dma(slot_ref, slot, idx2):
        i2 = idx2 // n_tiles
        j2 = idx2 % n_tiles
        return pltpu.make_async_copy(
            x_hbm.at[i2, pl.ds(j2 * tile_h * wp8, (tile_h + 2) * wp8), :],
            slot_ref,
            sem.at[slot],
        )

    # warm-up: first step starts its own copy
    @pl.when(idx == 0)
    def _():
        dma(xa_ref, 0, 0).start()

    # prefetch the next tile into the other slot
    @pl.when(jnp.logical_and(idx + 1 < total, (idx + 1) % 2 == 0))
    def _():
        dma(xa_ref, 0, idx + 1).start()

    @pl.when(jnp.logical_and(idx + 1 < total, (idx + 1) % 2 == 1))
    def _():
        dma(xb_ref, 1, idx + 1).start()

    kw = dict(tile_h=tile_h, width=width, wp8=wp8, cin=cin, h=h)

    @pl.when(idx % 2 == 0)
    def _():
        dma(xa_ref, 0, idx).wait()
        _compute_tile(xa_ref, ab_ref, w_ref, bt_ref, o_ref, acc_ref, j=j, **kw)

    @pl.when(idx % 2 == 1)
    def _():
        dma(xb_ref, 1, idx).wait()
        _compute_tile(xb_ref, ab_ref, w_ref, bt_ref, o_ref, acc_ref, j=j, **kw)


def _pick_tile_h_v2(h, width, wp8, cin, cout, bytes_per):
    budget = 12 * 1024 * 1024
    best = 1
    for t in range(1, h + 1):
        if h % t:
            continue
        need = (
            2 * (t + 2) * wp8 * cin * bytes_per   # two DMA slots
            + 2 * t * width * cout * bytes_per    # pipelined output blocks
            + width * cout * 4                    # f32 accumulator
            + 2 * 9 * cin * cout * bytes_per      # weight blocks
        )
        if need <= budget:
            best = t
    return best


@functools.partial(
    jax.jit, static_argnames=("h", "width", "interpret")
)
def _run_v2(x_flat, ab, bt, w_flat, *, h, width, interpret=False):
    b, hp_wp8, cin = x_flat.shape
    wp8 = hp_wp8 // (h + 2)
    cout = w_flat.shape[-1]
    tile_h = _pick_tile_h_v2(h, width, wp8, cin, cout, x_flat.dtype.itemsize)
    n_tiles = h // tile_h
    grid = (b, n_tiles)
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, tile_h=tile_h, width=width, wp8=wp8, cin=cin,
            h=h, n_tiles=n_tiles, n_batch=b,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, cin), lambda i, j: (i, 0)),
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((8, cout), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile_h * width, cout),
            lambda i, j, _nt=n_tiles: (i * _nt + j, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h * width, cout), x_flat.dtype),
        scratch_shapes=[
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM((width, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=15 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_flat, ab, w_flat, bt)
    return out.reshape(b, h, width, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3x3_v2(x, gn_scale, gn_bias, w, b, num_groups, eps=1e-6,
                       interpret=False):
    """conv3x3(silu(group_norm(x)·scale+bias)) + b — single-phase fused
    kernel with XLA-side stats. Same contract as gn_silu_conv3x3."""
    return _fwd_impl_v2(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret)


def _fwd_impl_v2(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret):
    if x.dtype == jnp.bfloat16:
        # materialize the producer in bf16 (see nn.layers.GroupNorm barrier)
        x = jax.lax.optimization_barrier(x)
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    cg = cin // num_groups

    # GN statistics: one XLA reduce in f32 (matches the reference
    # composition's fast-variance formulation exactly)
    xg = x.reshape(bsz, h * width, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)            # (B, G)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                                  # (B, G)
    inv_c = jnp.repeat(inv, cg, axis=1)                             # (B, C)
    mean_c = jnp.repeat(mean, cg, axis=1)
    a_row = inv_c * gn_scale.astype(jnp.float32)[None, :]
    b_row = gn_bias.astype(jnp.float32)[None, :] - mean_c * a_row
    # 8 rows per batch (A, B, 6 zero pad) so the per-batch block is a legal
    # (8, C) sublane tile for bsz > 1
    ab = jnp.concatenate(
        [a_row[:, None, :], b_row[:, None, :],
         jnp.zeros((bsz, 6, cin), jnp.float32)], axis=1
    ).reshape(8 * bsz, cin)

    bt_row = jnp.broadcast_to(
        jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32),
        (bsz, cout),
    )
    bt = jnp.concatenate(
        [bt_row[:, None, :], jnp.zeros((bsz, 7, cout), jnp.float32)], axis=1
    ).reshape(8 * bsz, cout)

    wp8 = ((width + 2 + 7) // 8) * 8
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, wp8 - width - 1), (0, 0)))
    x_flat = x_pad.reshape(bsz, (h + 2) * wp8, cin)
    w_flat = w.astype(x.dtype).reshape(9 * cin, cout)
    return _run_v2(x_flat, ab, bt, w_flat, h=h, width=width,
                   interpret=interpret)


def _fwd_v2(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret):
    out = _fwd_impl_v2(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret)
    return out, (x, gn_scale, gn_bias, w, b)


def _bwd_v2(num_groups, eps, interpret, res, g):
    x, gn_scale, gn_bias, w, b = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, ww, bc: gn_silu_conv3x3_reference(
            xx, ss, bb, ww, bc, num_groups, eps
        ),
        x, gn_scale, gn_bias, w, b,
    )
    return vjp(g)


gn_silu_conv3x3_v2.defvjp(_fwd_v2, _bwd_v2)


# ---------------------------------------------------------------------------
# v3: per-dy wide-N matmuls.
#
# Honest microbenchmarks (scripts/bench_kernels.py harness; see the result-
# cache note there) show the MXU runs (M,256)@(256,256) conv-tap matmuls at
# ~33-65 TFLOPS but widens to ~100+ TFLOPS when N grows to 768. v3 therefore
# computes, per vertical tap dy, ONE matmul against the (cin, 3*cout)
# concatenation of that dy's three dx weight blocks:
#
#     p_dy = x_rows[dy .. dy+t) @ [w(dy,0) | w(dy,1) | w(dy,2)]
#
# and accumulates the three dx-shifted (width, cout) column blocks of p_dy
# into the f32 accumulator. 3 matmuls per tile instead of 9*t, with exact M
# (no halo-row FLOP waste), same slice-add count.
# ---------------------------------------------------------------------------


def _compute_tile_v3(x_vmem, ab_ref, w_ref, bt_ref, o_ref, p_ref, acc_ref,
                     *, j, tile_h, width, wp8, cin, cout, h):
    rows = (tile_h + 2) * wp8
    t32 = x_vmem[...].astype(jnp.float32)
    y = t32 * ab_ref[0:1, :] + ab_ref[1:2, :]
    y = y * jax.nn.sigmoid(y)
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    grow = j * tile_h + pos // wp8 - 1
    col = pos % wp8
    valid = ((grow >= 0) & (grow < h) & (col >= 1) & (col <= width)).astype(
        jnp.float32
    )
    x_vmem[...] = (y * valid).astype(x_vmem.dtype)

    acc_ref[...] = jnp.broadcast_to(bt_ref[0:1, :], acc_ref.shape)
    for dy in range(3):
        # input row blocks [dy, dy+tile_h) line up with output rows [0, tile_h)
        p_ref[...] = jax.lax.dot_general(
            x_vmem[dy * wp8 : (dy + tile_h) * wp8, :],
            w_ref[dy * cin : (dy + 1) * cin, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for r in range(tile_h):
            for dx in range(3):
                acc_ref[r * width : (r + 1) * width, :] += jax.lax.slice(
                    p_ref[...],
                    (r * wp8 + dx, dx * cout),
                    (r * wp8 + dx + width, (dx + 1) * cout),
                )
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_v3(x_hbm, ab_ref, w_ref, bt_ref, o_ref,
               xa_ref, xb_ref, p_ref, acc_ref, sem,
               *, tile_h, width, wp8, cin, cout, h, n_tiles, n_batch):
    i = pl.program_id(0)
    j = pl.program_id(1)
    idx = i * n_tiles + j
    total = n_batch * n_tiles

    def dma(slot_ref, slot, idx2):
        i2 = idx2 // n_tiles
        j2 = idx2 % n_tiles
        return pltpu.make_async_copy(
            x_hbm.at[i2, pl.ds(j2 * tile_h * wp8, (tile_h + 2) * wp8), :],
            slot_ref,
            sem.at[slot],
        )

    @pl.when(idx == 0)
    def _():
        dma(xa_ref, 0, 0).start()

    @pl.when(jnp.logical_and(idx + 1 < total, (idx + 1) % 2 == 0))
    def _():
        dma(xa_ref, 0, idx + 1).start()

    @pl.when(jnp.logical_and(idx + 1 < total, (idx + 1) % 2 == 1))
    def _():
        dma(xb_ref, 1, idx + 1).start()

    kw = dict(tile_h=tile_h, width=width, wp8=wp8, cin=cin, cout=cout, h=h)

    @pl.when(idx % 2 == 0)
    def _():
        dma(xa_ref, 0, idx).wait()
        _compute_tile_v3(xa_ref, ab_ref, w_ref, bt_ref, o_ref, p_ref, acc_ref,
                         j=j, **kw)

    @pl.when(idx % 2 == 1)
    def _():
        dma(xb_ref, 1, idx).wait()
        _compute_tile_v3(xb_ref, ab_ref, w_ref, bt_ref, o_ref, p_ref, acc_ref,
                         j=j, **kw)


def _pick_tile_h_v3(h, width, wp8, cin, cout, bytes_per):
    budget = 13 * 1024 * 1024
    best = 1
    for t in range(1, h + 1):
        if h % t:
            continue
        need = (
            2 * (t + 2) * wp8 * cin * bytes_per   # two DMA slots
            + t * wp8 * 3 * cout * 4              # f32 per-dy product
            + t * width * cout * 4                # f32 accumulator
            + 2 * t * width * cout * bytes_per    # pipelined output blocks
            + 2 * 3 * cin * 3 * cout * bytes_per  # weight blocks
        )
        if need <= budget:
            best = t
    return best


@functools.partial(jax.jit, static_argnames=("h", "width", "interpret"))
def _run_v3(x_flat, ab, bt, w_flat, *, h, width, interpret=False):
    b, hp_wp8, cin = x_flat.shape
    wp8 = hp_wp8 // (h + 2)
    cout = w_flat.shape[-1] // 3
    tile_h = _pick_tile_h_v3(h, width, wp8, cin, cout, x_flat.dtype.itemsize)
    n_tiles = h // tile_h
    grid = (b, n_tiles)
    out = pl.pallas_call(
        functools.partial(
            _kernel_v3, tile_h=tile_h, width=width, wp8=wp8, cin=cin,
            cout=cout, h=h, n_tiles=n_tiles, n_batch=b,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, cin), lambda i, j: (i, 0)),
            pl.BlockSpec((3 * cin, 3 * cout), lambda i, j: (0, 0)),
            pl.BlockSpec((8, cout), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile_h * width, cout),
            lambda i, j, _nt=n_tiles: (i * _nt + j, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h * width, cout), x_flat.dtype),
        scratch_shapes=[
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM((tile_h * wp8, 3 * cout), jnp.float32),
            pltpu.VMEM((tile_h * width, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=15 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_flat, ab, w_flat, bt)
    return out.reshape(b, h, width, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3x3_v3(x, gn_scale, gn_bias, w, b, num_groups, eps=1e-6,
                       interpret=False):
    """conv3x3(silu(group_norm(x)·scale+bias)) + b — v3 wide-N kernel.
    Same contract as gn_silu_conv3x3."""
    return _fwd_impl_v3(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret)


def _fwd_impl_v3(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret):
    if x.dtype == jnp.bfloat16:
        # materialize the producer in bf16 (see nn.layers.GroupNorm barrier)
        x = jax.lax.optimization_barrier(x)
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    cg = cin // num_groups

    xg = x.reshape(bsz, h * width, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, cg, axis=1)
    mean_c = jnp.repeat(mean, cg, axis=1)
    a_row = inv_c * gn_scale.astype(jnp.float32)[None, :]
    b_row = gn_bias.astype(jnp.float32)[None, :] - mean_c * a_row
    ab = jnp.concatenate(
        [a_row[:, None, :], b_row[:, None, :],
         jnp.zeros((bsz, 6, cin), jnp.float32)], axis=1
    ).reshape(8 * bsz, cin)

    bt_row = jnp.broadcast_to(
        jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32),
        (bsz, cout),
    )
    bt = jnp.concatenate(
        [bt_row[:, None, :], jnp.zeros((bsz, 7, cout), jnp.float32)], axis=1
    ).reshape(8 * bsz, cout)

    wp8 = ((width + 2 + 7) // 8) * 8
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, wp8 - width - 1), (0, 0)))
    x_flat = x_pad.reshape(bsz, (h + 2) * wp8, cin)
    # (3, 3, cin, cout) -> (3*cin, 3*cout): row block dy, column block dx
    w_wide = jnp.transpose(w.astype(x.dtype), (0, 2, 1, 3)).reshape(
        3 * cin, 3 * cout
    )
    return _run_v3(x_flat, ab, bt, w_wide, h=h, width=width,
                   interpret=interpret)


def _fwd_v3(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret):
    out = _fwd_impl_v3(x, gn_scale, gn_bias, w, b, num_groups, eps, interpret)
    return out, (x, gn_scale, gn_bias, w, b)


def _bwd_v3(num_groups, eps, interpret, res, g):
    x, gn_scale, gn_bias, w, b = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, ww, bc: gn_silu_conv3x3_reference(
            xx, ss, bb, ww, bc, num_groups, eps
        ),
        x, gn_scale, gn_bias, w, b,
    )
    return vjp(g)


gn_silu_conv3x3_v3.defvjp(_fwd_v3, _bwd_v3)
