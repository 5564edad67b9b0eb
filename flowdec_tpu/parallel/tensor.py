"""Tensor (channel) parallelism for the NCSN++ U-Net over the 'model' axis.

A capability the reference lacks entirely (SURVEY.md §2.8: DDP only). The
25-75M FlowDec backbone fits in one chip's HBM, but channel sharding lets
(a) much larger U-Net variants train/serve without pipeline surgery and
(b) a dp×tp 2-D mesh trade batch scaling against per-chip memory.

Design: XLA GSPMD, not hand-written collectives. Every convolution kernel
(HWIO) and its bias shard on the OUTPUT-channel axis over 'model';
activations then flow channel-sharded, and XLA's sharding propagation
inserts the all-gathers/psums where an op genuinely needs full channels
(GroupNorm group reduces, channel concats at skip joins, the 4→nf input and
final →2 output convs, which stay small and replicated). On TPU these
collectives ride ICI inside `jit` — the scaling-book recipe: pick a mesh,
annotate shardings, let the compiler place the collectives.

Param-name driven: any leaf whose last axis is a multiple of the model-axis
size and ≥ min_channels shards on that last axis (conv HWIO O, Dense O,
per-channel GroupNorm scale/bias all have channels last in flax); everything
else replicates. This covers the whole NCSN++ tree without per-layer rules
and keeps checkpoint layout unchanged (shardings are a placement, not a
format).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowdec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["tp_param_shardings", "make_tp_enhance", "make_sp_tp_enhance"]


def tp_param_shardings(
    params: Any,
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    min_channels: int = 8,
):
    """Per-leaf NamedShardings: last (channel) axis over `axis` when evenly
    divisible and wide enough; replicated otherwise."""
    n = mesh.shape[axis]

    def leaf(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if not shape or shape[-1] < max(min_channels, n) or shape[-1] % n:
            return NamedSharding(mesh, P())
        if len(shape) >= 2 and shape[-2] < min_channels:
            # tiny-fan-in kernels (the 4→nf INPUT conv) gain nothing from
            # output sharding, and under the composed sp×tp layout the
            # spatially-partitioned conv asks for a kernel resharding that the
            # partitioner can only satisfy by full rematerialization
            # (MULTICHIP_r03 tail warning); replicated, its slice is free
            return NamedSharding(mesh, P())
        spec = [None] * (len(shape) - 1) + [axis]
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, params)


def make_tp_enhance(
    model,
    mesh: Mesh,
    *,
    enhance_kwargs: Optional[dict] = None,
):
    """jitted enhance with channel-sharded params and batch over 'data'.

    Returns fn(params, key, y) -> x_hat. `params` may be unsharded host
    arrays; they are placed according to tp_param_shardings the first time a
    given params tree is seen. The placed tree is cached (keyed by the
    identity of the incoming tree), so serving loops that call with the same
    params pay the host-side sharding walk + device_put only once.

    Cache contract: callers must treat params trees as IMMUTABLE — update by
    replacing the tree (the functional jax idiom, e.g. optax/tree_map
    outputs), never by mutating leaves of the same dict in place. The cache
    keys on the tree object's identity (and pins it, so the id cannot be
    reused), so an in-place mutation would silently serve the stale placed
    arrays from the previous version.
    """
    kwargs = dict(enhance_kwargs or {})

    def _enhance(params, key, y):
        return model.enhance(params, key, y, **kwargs)

    fn = jax.jit(_enhance, out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
    return _placed_params_call(fn, model, mesh, y_spec=P(DATA_AXIS))


def make_sp_tp_enhance(
    model,
    mesh: Mesh,
    *,
    enhance_kwargs: Optional[dict] = None,
):
    """Composed sequence×tensor parallel enhance on a 2-D (data, model) mesh:
    the STFT TIME axis of one long input shards over 'data' (conv halo
    exchanges at shard boundaries, as in make_sequence_parallel_enhance)
    while every wide conv kernel shards on OUTPUT CHANNELS over 'model'
    (channel collectives, as in make_tp_enhance). This is the combined-axis
    serving layout for inputs too long for one chip's activation memory AND
    backbones too wide for one chip's weight+temp budget — both axes ride ICI
    inside one jitted program.

    Same placed-params cache and immutability contract as make_tp_enhance.
    """
    kwargs = dict(enhance_kwargs or {})
    feat_spec = NamedSharding(mesh, P(None, None, DATA_AXIS, None))  # (B,F,T,2)

    def _enhance(params, key, y):
        # Known-benign GSPMD warning on this path: the partitioner reports
        # "involuntary full rematerialization" for the INPUT conv kernel
        # (shape (3,3,4,nf)) because its two uses inside the sampler loop
        # demand conflicting layouts (channel-sharded from the conv output
        # vs spatial-partition layout). Entry-level with_sharding_constraint
        # pinning cannot remove it (the conflict is between internal uses —
        # verified r4), and the cost is bounded by the kernel size itself:
        # 3·3·4·nf f32 = 18 KB at nf=128, regathered once per sampler step
        # over ICI — noise next to the MB-scale activation collectives.
        window = model.stft_window(params)
        Y, _, info = model.preprocess(y, window=window)
        Y = jax.lax.with_sharding_constraint(Y, feat_spec)
        out = model.enhance_features(params, key, Y, **kwargs)
        out = jax.lax.with_sharding_constraint(out, feat_spec)
        return model.postprocess(out, info, window=window)

    fn = jax.jit(_enhance)
    return _placed_params_call(fn, model, mesh, y_spec=P())


def _placed_params_call(fn, model, mesh: Mesh, *, y_spec: P):
    """Wrap a jitted enhance-like fn(params, key, y) with the one-slot
    placed-params cache: channel-shard params per tp_param_shardings on first
    sight of a given tree, then reuse the placement."""
    placed_cache: dict = {}

    def call(params, key, y):
        # re-place every input on THIS mesh (inputs may arrive committed to a
        # different mesh, e.g. the DP mesh used for training)
        cached = placed_cache.get(id(params))
        if cached is None:
            shardings = tp_param_shardings(params, mesh)
            placed = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x) if not isinstance(
                    x, jax.Array) else x, s),
                params, shardings,
            )
            placed_cache.clear()  # hold at most one placed tree alive
            placed_cache[id(params)] = (params, placed)
        else:
            placed = cached[1]
        key = jax.device_put(key, NamedSharding(mesh, P()))
        y = jax.device_put(y, NamedSharding(mesh, y_spec))
        return fn(placed, key, y)

    return call
