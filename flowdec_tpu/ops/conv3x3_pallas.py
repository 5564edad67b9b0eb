"""Pallas 3×3 SAME conv (NHWC, stride 1) as nine shifted row-matmuls.

Motivation (PERF.md, r1 profile): XLA:TPU's conv lowering materializes a
space-blocked, halo-padded COPY of every conv input at the U-Net's largest
levels (~19% of device time in pure `copy` ops). This kernel streams the
input through VMEM in H-tiles with a 1-row halo and feeds the MXU directly:
for each output row and tap row dy, one (Wp × C_in) @ (C_in × C_out) matmul
per dx on the full aligned row, with the dx shift applied to the VALUE —
one HBM read of x, one write of y, no blocked relayout pass.

Runtime constraints discovered by bisection on this TPU runtime (each
crashes the remote compile helper):
  * partial indexing (even scalar, even offset-0 slices) of rank≥3 VMEM
    refs — so ALL in-kernel refs here are 2-D: x is flattened to
    (B, Hp·Wp8, C) host-side (Wp8 a multiple of 8 keeps the reshape
    layout-preserving), weights to (9·C_in, C_out), output to (B·H·W, C_out);
  * unaligned sublane slices as MXU operands — so matmuls run on full rows
    and the dx shift slices the f32 result value (a VPU move);
  * overlapping Blocked windows don't exist (no Unblocked indexing mode) —
    so x lives in ANY/HBM and each grid step DMAs its halo'd row range.

Equivalent reference op: the 3×3 convs inside every NCSN++ resblock
(/root/reference/flowdec/backbones/ncsnpp_utils/layerspp.py:222-284 uses
ddpm_conv3x3, layers.py:128). Gated off by default; enable per-model once it
measures faster than XLA's conv on the target shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_pallas", "conv3x3_reference"]


def conv3x3_reference(x: jax.Array, w: jax.Array, b=None) -> jax.Array:
    """lax reference: NHWC 3×3 SAME stride-1 cross-correlation."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _kernel(x_hbm, w_ref, o_ref, x_vmem, acc_ref, sem,
            *, tile_h: int, width: int, wp8: int, cin: int):
    """Grid (B, H/tile_h). x_hbm (B, Hp·Wp8, Cin) in ANY; DMA rows
    [j·tile_h, j·tile_h + tile_h+2)·Wp8 into 2-D VMEM scratch."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * tile_h * wp8, (tile_h + 2) * wp8), :],
        x_vmem,
        sem,
    )
    copy.start()
    copy.wait()

    for r in range(tile_h):
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for dy in range(3):
            row = x_vmem[(r + dy) * wp8 : (r + dy) * wp8 + wp8, :]  # (Wp8, Cin)
            for dx in range(3):
                tap = dy * 3 + dx
                p = jax.lax.dot_general(
                    row,
                    w_ref[tap * cin : (tap + 1) * cin, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # dx shift on the VALUE (VPU move; ref slices must stay aligned)
                acc_ref[...] += jax.lax.slice(p, (dx, 0), (dx + width, p.shape[1]))
        o_ref[r * width : (r + 1) * width, :] = acc_ref[...].astype(o_ref.dtype)


def _pick_tile_h(h: int, width: int, wp8: int, cin: int, cout: int, bytes_per: int) -> int:
    """Largest divisor tile whose x tile + double-buffered y block + f32
    accumulator fit ~5 MB (total VMEM ≈ 16 MB)."""
    budget = 5 * 1024 * 1024
    best = 1
    for t in range(1, h + 1):
        if h % t:
            continue
        need = (
            (t + 2) * wp8 * cin * bytes_per
            + 2 * t * width * cout * bytes_per
            + width * cout * 4
        )
        if need <= budget:
            best = t
    return best


@functools.partial(jax.jit, static_argnames=("h", "width", "interpret"))
def _run(x_flat, w_flat, *, h, width, interpret=False):
    b, hp_wp8, cin = x_flat.shape
    wp8 = hp_wp8 // (h + 2)
    cout = w_flat.shape[-1]
    tile_h = _pick_tile_h(h, width, wp8, cin, cout, x_flat.dtype.itemsize)
    grid = (b, h // tile_h)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=width, wp8=wp8, cin=cin),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile_h * width, cout), lambda i, j, _hc=h // tile_h: (i * _hc + j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b * h * width, cout), x_flat.dtype),
        scratch_shapes=[
            pltpu.VMEM(((tile_h + 2) * wp8, cin), x_flat.dtype),
            pltpu.VMEM((width, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_flat, w_flat)
    return out.reshape(b, h, width, cout)


def conv3x3_pallas(x: jax.Array, w: jax.Array, b=None, *, interpret: bool = False):
    """NHWC 3×3 SAME stride-1 conv. x (B,H,W,Cin), w (3,3,Cin,Cout)."""
    w = jnp.asarray(w)
    assert w.shape[0] == 3 and w.shape[1] == 3, "3x3 kernels only"
    bsz, h, width, cin = x.shape
    # pad W so the padded row length is a multiple of 8: the host-side
    # (Hp, Wp8, C) → (Hp·Wp8, C) flatten is then layout-preserving (sublane
    # tiles don't straddle rows) and in-kernel row offsets stay aligned
    wp8 = ((width + 2 + 7) // 8) * 8
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, wp8 - width - 1), (0, 0)))
    x_flat = x_pad.reshape(bsz, (h + 2) * wp8, cin)
    w_flat = w.astype(x.dtype).reshape(9 * cin, w.shape[-1])
    out = _run(x_flat, w_flat, h=h, width=width, interpret=interpret)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper + global implementation switch
# ---------------------------------------------------------------------------

import os as _os

_conv_impl = _os.environ.get("FLOWDEC_CONV", "auto")


def set_conv_impl(name: str) -> None:
    """Global 3×3-conv implementation: "auto" (pallas on TPU for eligible
    shapes), "pallas", or "xla"."""
    assert name in ("auto", "pallas", "xla"), name
    global _conv_impl
    _conv_impl = name


def _eligible(x, w) -> bool:
    """Shape eligibility for the Pallas kernel (MXU-sized channels)."""
    return (
        x.ndim == 4
        and w.shape[:2] == (3, 3)
        and x.shape[-1] % 128 == 0
        and w.shape[-1] % 128 == 0
        and x.shape[1] >= 8
        and x.shape[2] >= 8
    )


@jax.custom_vjp
def _conv3x3_pallas_diff(x, w, b):
    return conv3x3_pallas(x, w, b)


def _conv_fwd(x, w, b):
    return conv3x3_pallas(x, w, b), (x, w, b)


def _conv_bwd(res, g):
    x, w, b = res
    _, vjp = jax.vjp(conv3x3_reference, x, w, b)
    return vjp(g)


_conv3x3_pallas_diff.defvjp(_conv_fwd, _conv_bwd)


def conv3x3(x: jax.Array, w: jax.Array, b=None) -> jax.Array:
    """3×3 SAME stride-1 conv dispatching to the Pallas kernel when enabled
    and eligible (differentiable: backward falls back to XLA's conv vjp)."""
    impl = _conv_impl
    if impl == "auto":
        # Measured (r1): the kernel wins in ISOLATION at the level-0 shape
        # (7.36 ms vs 9.99 ms) but LOSES end-to-end in the full U-Net
        # (4.7x vs 9.0x RT): each pallas_call is a fusion barrier, so the
        # bias/act/GN neighbors XLA used to fuse into the convs become
        # extra HBM passes, and the host-side pad+flatten adds a copy per
        # conv. auto therefore stays on XLA; set_conv_impl("pallas") or
        # FLOWDEC_CONV=pallas opts in for experiments.
        impl = "xla"
    if impl == "pallas" and _eligible(x, w):
        bias = b if b is not None else jnp.zeros((w.shape[-1],), x.dtype)
        return _conv3x3_pallas_diff(x, w, bias)
    return conv3x3_reference(x, w, b)
