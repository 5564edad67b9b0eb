"""Device-time profile of one enhance configuration.

Runs a warmed-up enhance under jax.profiler, then parses the perfetto trace
JSON and prints per-op-bucket device time — the tool behind PERF.md's
profile tables.

    python scripts/profile_rtf.py --seconds 5 --batch 1 --fused-gn-conv
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402  (enables the persistent compilation cache)
from scripts.bench_rtf import build_model_variant  # noqa: E402


def bucket(name: str) -> str:
    n = name.lower()
    for key in ("custom-call", "fusion", "copy", "convolution", "reduce",
                "transpose", "pad", "slice", "dot", "bitcast", "convert",
                "dynamic-update-slice", "select", "scatter", "iota", "rng"):
        if key in n:
            return key
    return "other"


def parse_trace(logdir: str):
    files = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    assert files, f"no trace files under {logdir}"
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # device tracks: pid names containing "TPU" and not "Host"
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"]["name"]
    device_pids = {p for p, n in pid_names.items()
                   if "tpu" in n.lower() or "device" in n.lower()}
    by_bucket = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        # leaf events only: xla ops have args with hlo metadata; keep all X
        # events on device tracks but skip obvious aggregates
        if name.startswith(("Steps", "XLA Modules", "program")):
            continue
        by_bucket[bucket(name)] += dur
        by_op[name] += dur
        total += dur
    return total, by_bucket, by_op


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--n-steps", type=int, default=3)
    p.add_argument("--solver", default="midpoint")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--fused-gn", action="store_true")
    p.add_argument("--fused-gn-conv", action="store_true")
    p.add_argument("--calls", type=int, default=3)
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()

    model = build_model_variant(args)
    params = model.init_params(jax.random.PRNGKey(0), frames=256)
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, int(args.seconds * model.sampling_rate))) * 0.1,
        jnp.float32)

    fn = jax.jit(lambda p, y, k: model.enhance(
        p, k, y, n_steps=args.n_steps, solver=args.solver))
    key = jax.random.PRNGKey(1)
    fn(params, y, key).block_until_ready()

    logdir = tempfile.mkdtemp(prefix="flowdec_prof_")
    jax.profiler.start_trace(logdir)
    for i in range(args.calls):
        out = fn(params, y, jax.random.fold_in(key, i))
    out.block_until_ready()
    jax.profiler.stop_trace()

    total, by_bucket, by_op = parse_trace(logdir)
    per_call = total / args.calls
    print(f"\ndevice time: {per_call:.1f} ms/call ({args.calls} calls)")
    print("\n== buckets ==")
    for k, v in sorted(by_bucket.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v / args.calls:8.1f} ms  {100 * v / total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v / args.calls:8.2f} ms  {k[:110]}")
    print(f"\ntrace dir: {logdir}")


if __name__ == "__main__":
    main()
