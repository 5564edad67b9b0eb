"""Sequence-parallel (time-sharded) inference over a device mesh.

A capability beyond the reference (SURVEY.md §2.8: the reference has NO
tensor/sequence parallelism — it even skips files over 30 s,
/root/reference/enhance.py:115). On TPU, the natural way to enhance ONE long
file with many chips is to shard the STFT *time axis* across the mesh and let
XLA's SPMD partitioner insert the halo exchanges the U-Net's 3×3 convs and
FIR resamplers need at shard boundaries — no manual collectives, and the
NFE-step ODE scan stays one fused program.

Usage:
    mesh = make_mesh(n_data=8)           # axis name 'data' reused as seq axis
    fn = make_sequence_parallel_enhance(model, mesh, n_steps=3, solver="midpoint")
    x_hat = fn(params, key, y)           # y: (L,) or (B, L), any length
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowdec_tpu.parallel.mesh import DATA_AXIS

__all__ = ["make_sequence_parallel_enhance"]


def make_sequence_parallel_enhance(
    model,
    mesh: Mesh,
    *,
    axis: str = DATA_AXIS,
    enhance_kwargs: Optional[Dict[str, Any]] = None,
):
    """Returns a jitted (params, key, y) → x̂ that runs the ODE postfilter
    with features sharded along the STFT time axis over `axis`.

    Params and the sigma curves are replicated (25–75 M fits every chip);
    only activations shard — the right trade-off for a conv U-Net where
    activation memory, not weights, dominates. Works for any waveform length;
    XLA pads internally when the padded frame count doesn't divide the mesh.
    """
    kwargs = dict(enhance_kwargs or {})
    feat_spec = NamedSharding(mesh, P(None, None, axis, None))  # (B, F, T, 2)

    @jax.jit
    def fn(params, key, y):
        Y, _, info = model.preprocess(y, window=model.stft_window(params))
        Y = jax.lax.with_sharding_constraint(Y, feat_spec)
        out = model.enhance_features(params, key, Y, **kwargs)
        out = jax.lax.with_sharding_constraint(out, feat_spec)
        return model.postprocess(out, info, window=model.stft_window(params))

    return fn
