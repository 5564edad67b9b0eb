"""GroupNorm statistics as an opaque Pallas pass — the f32-temp breaker.

Problem (PERF.md): whenever GroupNorm's f32 stats reductions consume a
convolution's output, XLA (with this runtime's pinned
--xla_allow_excess_precision=true) keeps the producer conv's output in f32 —
extra layout copies and 2× HBM for the largest activations, and the batch-16
enhance graphs OOM on 7.5 GB f32[B,768,T,256] temps. An optimization_barrier
does NOT break the excess-precision chain (measured, reverted).

Fix: compute the per-channel (Σ, Σ²) sums inside a Pallas kernel and route x
itself through the call as an ALIASED passthrough output. A pallas_call is a
custom call — opaque to the excess-precision pass — so the producer's output
materializes in bf16 once, and every downstream consumer (the normalize)
uses the passthrough, never the pre-boundary f32 value. The aliasing makes
the passthrough free: no copy, same buffer. The normalize/affine stays in
XLA as a per-channel x·A+B (+ activation), which XLA fuses into the consumer
conv for ~free (measured: GN+SiLU+conv3x3 == raw conv3x3 + 0.26 ms isolated
at the level-0 shape when the input is a bf16 leaf —
scripts/bench_kernels.py).

The kernel accumulates row-block partial sums into a (16, C) output per
batch element (rows 0:8 = Σ partials, 8:16 = Σ² partials, in groups of 8
rows for sublane-aligned stores); the tiny (B,16,C)→(B,G) fold happens in
XLA. Differentiable via custom_vjp (∂Σ/∂x = 1, ∂Σ²/∂x = 2x).

Replaces the reference's nn.GroupNorm statistics path
(/root/reference/flowdec/backbones/ncsnpp.py hardcodes nn.GroupNorm; see
SURVEY §2.3). TPU-only; callers fall back to plain jnp reductions on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_stats_passthrough", "stats_op"]


def _kernel(x_ref, pass_ref, o_ref, *, tile):
    # pass_ref is aliased to the input buffer and never written: the
    # passthrough output IS the input, with zero copies.
    del pass_ref
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...].astype(jnp.float32)              # (tile, C)
    x8 = x.reshape(tile // 8, 8, x.shape[-1])       # sublane-preserving split
    o_ref[0:8, :] += jnp.sum(x8, axis=0)
    o_ref[8:16, :] += jnp.sum(x8 * x8, axis=0)


def _pick_tile(rows: int, c: int, itemsize: int) -> int:
    # the input block is double-buffered by the pipeline: keep 2·tile·C·item
    # within a conservative VMEM budget (observed hard limit ~16 MB)
    budget = 10 * 1024 * 1024
    t = min(4096, rows, budget // (2 * c * itemsize))
    t -= t % 8
    while t > 8 and rows % t:
        t -= 8
    return max(t, 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x3, interpret=False):
    b, rows, c = x3.shape
    x2 = x3.reshape(b * rows, c)
    tile = _pick_tile(rows, c, x2.dtype.itemsize)
    n_tiles = rows // tile
    x_pass, partials = pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i, j, _nt=n_tiles: (i * _nt + j, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((16, c), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * rows, c), x2.dtype),
            jax.ShapeDtypeStruct((b * 16, c), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x2)
    return x_pass.reshape(b, rows, c), partials.reshape(b, 16, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def stats_op(x3: jax.Array, interpret: bool = False):
    """(B, N, C) → (x_passthrough, sums (B, C), sumsqs (B, C)).

    Sums in f32, one bf16-native Pallas read pass. N must be a multiple
    of 8. Use x_passthrough for all downstream math (see module docstring).
    """
    x_pass, p = _run(x3, interpret)
    return x_pass, jnp.sum(p[:, 0:8, :], axis=1), jnp.sum(p[:, 8:16, :], axis=1)


def _stats_fwd(x3, interpret):
    out = stats_op(x3, interpret)
    return out, x3


def _stats_bwd(interpret, x3, g):
    g_pass, g_sum, g_sq = g
    gx = (
        g_pass.astype(jnp.float32)
        + g_sum[:, None, :]
        + 2.0 * x3.astype(jnp.float32) * g_sq[:, None, :]
    ).astype(x3.dtype)
    return (gx,)


stats_op.defvjp(_stats_fwd, _stats_bwd)


def group_stats_passthrough(
    x: jax.Array, num_groups: int, eps: float, *, interpret: bool = False
):
    """x (B, ..., C) → (x_passthrough, mean (B, G), inv_std (B, G))."""
    b, c = x.shape[0], x.shape[-1]
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    x3 = x.reshape(b, n, c)
    x_pass, s1, s2 = stats_op(x3, interpret)
    cg = c // num_groups
    denom = float(n * cg)
    gs1 = jnp.sum(s1.reshape(b, num_groups, cg), axis=-1)
    gs2 = jnp.sum(s2.reshape(b, num_groups, cg), axis=-1)
    mean = gs1 / denom
    var = jnp.maximum(gs2 / denom - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return x_pass.reshape(x.shape), mean, inv
