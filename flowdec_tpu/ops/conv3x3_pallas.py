"""Pallas 3×3 SAME conv (NHWC, stride 1) as nine shifted matmuls.

Motivation (PERF.md, r1 profile): XLA:TPU's conv lowering materializes a
space-blocked, halo-padded COPY of every conv input at the U-Net's largest
levels (~19% of device time in pure `copy` ops). This kernel streams the
input through VMEM in H-tiles with a 1-row halo and feeds the MXU directly:
for each tap (dy, dx), a ((tile_h·W) × C_in) @ (C_in × C_out) matmul on a
statically shifted window — one HBM read of x, one write of y, no blocked
relayout pass.

Overlapping H-windows (tile_h+2 at stride tile_h) can't be expressed with
Blocked BlockSpecs, so x stays in HBM (memory_space=ANY) and each grid step
DMAs its halo'd tile into VMEM scratch explicitly (the guide's halo
pattern).

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


def _kernel(x_hbm, w_ref, o_ref, x_vmem, acc_ref, sem, *, tile_h: int, width: int):
    """Grid (B, H/tile_h). x_hbm: full padded array in ANY/HBM; per step DMA
    rows [j·tile_h, j·tile_h + tile_h+2) into VMEM, then 9 shifted matmuls."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    cin = x_vmem.shape[-1]
    cout = o_ref.shape[-1]

    copy = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * tile_h, tile_h + 2), :, :],
        x_vmem,
        sem,
    )
    copy.start()
    copy.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            xs = x_vmem[dy : dy + tile_h, dx : dx + width, :]
            xs2 = xs.reshape(tile_h * width, cin)
            acc_ref[...] += jax.lax.dot_general(
                xs2,
                w_ref[dy, dx, :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0, :, :, :] = acc_ref[...].reshape(tile_h, width, cout).astype(o_ref.dtype)


def _pick_tile_h(h: int, width: int, cin: int, cout: int, bytes_per: int) -> int:
    """Largest divisor tile whose x tile + y block + f32 accumulator fit a
    ~5 MB budget (double buffering on the Blocked out/in specs doubles their
    footprint; total VMEM ≈ 16 MB)."""
    budget = 5 * 1024 * 1024
    best = 1
    for t in range(1, h + 1):
        if h % t:
            continue
        need = (
            (t + 2) * (width + 2) * cin * bytes_per
            + 2 * t * width * cout * bytes_per
            + t * width * cout * 4
        )
        if need <= budget:
            best = t
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x_pad, w, *, interpret=False):
    b, hp, wp, cin = x_pad.shape  # hp = H+2, wp = W+2 (SAME halo pre-padded)
    h, width = hp - 2, wp - 2
    cout = w.shape[-1]
    tile_h = _pick_tile_h(h, width, cin, cout, x_pad.dtype.itemsize)
    grid = (b, h // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, width, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, cin), x_pad.dtype),
            pltpu.VMEM((tile_h * width, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pad, w)


def conv3x3_pallas(x: jax.Array, w: jax.Array, b=None, *, interpret: bool = False):
    """NHWC 3×3 SAME stride-1 conv. x (B,H,W,Cin), w (3,3,Cin,Cout)."""
    w = jnp.asarray(w)
    assert w.shape[0] == 3 and w.shape[1] == 3, "3x3 kernels only"
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = _run(x_pad, w.astype(x.dtype), interpret=interpret)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
