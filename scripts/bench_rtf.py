"""RTF variant benchmark — measure one enhance/pipeline configuration.

Companion to the headline `bench.py`: same measurement methodology
(steady-state, best-of-rounds, block_until_ready), but every perf knob is a
CLI flag so optimization experiments are reproducible one-liners:

    python scripts/bench_rtf.py --seconds 5 --batch 1 --dtype bfloat16 \
    python scripts/bench_rtf.py --pipeline --batch 8   # codec+postfilter

Prints one JSON line per run (same schema as bench.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root headline bench: reuses cache + builders)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_model_variant(args):
    from flowdec_tpu.models import AmplitudeCompressedComplexSTFT, FlowModel
    from flowdec_tpu.models import sigma_models
    from flowdec_tpu.nn import FLOWDEC_FINAL_NO_ATTN, NCSNpp

    cfg = dataclasses.replace(
        FLOWDEC_FINAL_NO_ATTN,
        # getattr: callers like profile_rtf reuse this with a smaller argparse
        transpose_image=getattr(args, "transpose", False),
    )
    return FlowModel(
        backbone=NCSNpp(cfg),
        feature_extractor=AmplitudeCompressedComplexSTFT(
            n_fft=1534, sampling_rate=48000, alpha=0.3, beta=0.33, n_hops=4
        ),
        sampling_rate=48000,
        sigma_y=jnp.asarray(
            sigma_models.from_file("flowdec_autoparams_75m.npy", kernel_bandwidth=3)
        ),
        compute_dtype=None if args.dtype == "float32" else args.dtype,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--n-steps", type=int, default=3)
    p.add_argument("--solver", default="midpoint")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--transpose", action="store_true",
                   help="(time, freq) image orientation (NCSNppConfig.transpose_image)")
    p.add_argument("--pipeline", action="store_true",
                   help="full codec-decode + postfilter pipeline")
    p.add_argument("--compile-only", action="store_true",
                   help="trace+compile+run once, skip timing (sanity/warm cache)")
    args = p.parse_args()

    model = build_model_variant(args)
    params = model.init_params(jax.random.PRNGKey(0), frames=256)

    t0 = time.perf_counter()
    if args.compile_only:
        sr = model.sampling_rate
        y = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (args.batch, int(args.seconds * sr))) * 0.1, jnp.float32)
        out = jax.jit(
            lambda p, y, k: model.enhance(p, k, y, n_steps=args.n_steps,
                                          solver=args.solver)
        )(params, y, jax.random.PRNGKey(1))
        out.block_until_ready()
        print(json.dumps({"metric": "compile_ok", "value": 1, "unit": "bool",
                          "compile_s": round(time.perf_counter() - t0, 1),
                          "out_std": float(jnp.std(out))}))
        return

    fn = bench.measure_pipeline_rtf if args.pipeline else bench.measure_rtf
    rtf = fn(model, params, seconds=args.seconds, batch=args.batch,
             n_steps=args.n_steps, solver=args.solver, iters=args.iters,
             rounds=args.rounds)
    tag = "pipeline" if args.pipeline else "enhance"
    knobs = []
    if args.transpose:
        knobs.append("tf")
    name = "_".join(
        [f"flowdec75m_{tag}_rtf", args.dtype, f"b{args.batch}",
         f"{args.seconds:g}s", f"n{args.n_steps}{args.solver}"] + knobs)
    print(json.dumps({"metric": name, "value": round(rtf, 2),
                      "unit": "x_realtime", "vs_baseline": round(rtf / 50.0, 3),
                      "wall_s": round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
