#!/usr/bin/env python
"""Bisect the remote-compile-helper HTTP-500 crash (PERF.md: bf16 training
graphs and f32 batch>=4 training graphs fail to compile on this runtime,
while f32 batch-2 training and bf16 inference compile fine).

Each case AOT-lowers and compiles ONE graph in a fresh subprocess (a failed
remote compile can poison the PJRT client, and one real TPU process runs at
a time), recording:

  * ok / error type / first line of the error,
  * the StableHLO text size of the lowered module (local, produced before
    the helper is contacted) — if failures track module size, the helper has
    a request/size limit; if they track batch x length x dtype, it's compile
    -time memory inside the helper,
  * lower and compile wall times.

Run after the chip is free:  python scripts/diag_compile500.py --out DIAG.json
Single case (child mode):    python scripts/diag_compile500.py --case f32_b4_step
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48000

# name -> (dtype, batch, seconds, mode, remat, ch_mult)
# mode: fwd = jitted enhance-style forward; grad = value_and_grad of the CFM
# loss; step = full train step (grad + Adam + EMA), the production graph.
CASES = {
    # the known-good / known-bad anchors from PERF.md
    "f32_b2_step":        ("float32", 2, 2.0, "step", True,  None),
    "f32_b4_step":        ("float32", 4, 2.0, "step", True,  None),
    # batch bisect
    "f32_b3_step":        ("float32", 3, 2.0, "step", True,  None),
    # graph-feature bisect at the failing point
    "f32_b4_grad":        ("float32", 4, 2.0, "grad", True,  None),
    "f32_b4_step_noremat": ("float32", 4, 2.0, "step", False, None),
    "f32_b4_step_halfdepth": ("float32", 4, 2.0, "step", True, (4, 4)),
    # same activation volume as b4/2s but batch 2: memory-vs-batch theory
    "f32_b2_4s_step":     ("float32", 2, 4.0, "step", True,  None),
    # dtype bisect
    "bf16_b2_step":       ("bfloat16", 2, 2.0, "step", True, None),
    "bf16_b2_grad":       ("bfloat16", 2, 2.0, "grad", True, None),
    "bf16_b4_fwd":        ("bfloat16", 4, 2.0, "fwd",  True, None),
    "bf16_b2_step_halfdepth": ("bfloat16", 2, 2.0, "step", True, (4, 4)),
    # follow-ups after the first grid (activation-volume theory): if the
    # helper's limit is bytes-of-activations, halving the dtype should buy
    # ~2x batch for training graphs
    "bf16_b4_step":       ("bfloat16", 4, 2.0, "step", True, None),
    "bf16_b8_step":       ("bfloat16", 8, 2.0, "step", True, None),
    "f32_b2_3s_step":     ("float32", 2, 3.0, "step", True,  None),
}


def run_case(name: str) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from flowdec_tpu.models import AmplitudeCompressedComplexSTFT, FlowModel
    from flowdec_tpu.nn import FLOWDEC_FINAL_NO_ATTN, NCSNpp
    from flowdec_tpu.train.state import create_train_state
    from flowdec_tpu.train.steps import make_train_step

    dtype, batch, seconds, mode, remat, ch_mult = CASES[name]
    cfg = dataclasses.replace(FLOWDEC_FINAL_NO_ATTN, remat=remat)
    if ch_mult is not None:
        cfg = dataclasses.replace(cfg, ch_mult=ch_mult)
    model = FlowModel(
        backbone=NCSNpp(cfg),
        feature_extractor=AmplitudeCompressedComplexSTFT(
            n_fft=1534, sampling_rate=SR, alpha=0.3, beta=0.33, n_hops=4
        ),
        sampling_rate=SR,
        sigma_y=jnp.asarray(0.66),
        compute_dtype=None if dtype == "float32" else dtype,
    )
    params = model.init_params(jax.random.PRNGKey(0), frames=256)
    length = int(seconds * SR)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, length)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.standard_normal((batch, length)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(1)

    if mode == "fwd":
        fn = jax.jit(lambda p, k, yy: model.enhance(p, k, yy, n_steps=1, solver="euler"))
        args = (params, key, y)
    elif mode == "grad":
        fn = jax.jit(
            jax.value_and_grad(lambda p, k, b: model.loss(p, k, b)[0]),
        )
        args = (params, key, (x, y))
    elif mode == "step":
        opt = optax.adam(1e-4)
        state = create_train_state(model, jax.random.PRNGKey(0), opt, frames=256)
        fn = make_train_step(model, opt, donate=False)
        args = (state, (x, y), key)
    else:
        raise ValueError(mode)

    out = {"case": name, "dtype": dtype, "batch": batch, "seconds": seconds,
           "mode": mode, "remat": remat,
           "ch_mult": list(ch_mult) if ch_mult else None}
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    out["lower_s"] = round(time.perf_counter() - t0, 1)
    out["hlo_bytes"] = len(lowered.as_text())
    t0 = time.perf_counter()
    try:
        lowered.compile()
        out["ok"] = True
    except Exception as e:  # noqa: BLE001 — record any failure mode
        out["ok"] = False
        out["error_type"] = type(e).__name__
        msg = str(e).strip().splitlines()
        out["error"] = (msg[0][:300] if msg else "")
    out["compile_s"] = round(time.perf_counter() - t0, 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", help="run one case in-process (child mode)")
    ap.add_argument("--cases", nargs="*", help="subset of cases to sweep")
    ap.add_argument("--out", default="DIAG_COMPILE500.json")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-case subprocess timeout (first compiles on this"
                         " link take 15-25 min)")
    args = ap.parse_args(argv)

    if args.case:
        print(json.dumps(run_case(args.case)))
        return

    results = []
    names = args.cases or list(CASES)
    for name in names:
        print(f"=== {name}", flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", name],
                capture_output=True, text=True, timeout=args.timeout,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if proc.returncode == 0 and line.startswith("{"):
                res = json.loads(line)
            else:
                res = {"case": name, "ok": False, "error_type": "subprocess",
                       "error": (proc.stderr.strip().splitlines() or ["?"])[-1][:300],
                       "returncode": proc.returncode}
        except subprocess.TimeoutExpired:
            res = {"case": name, "ok": False, "error_type": "timeout",
                   "error": f"> {args.timeout}s"}
        res["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(res)
        print(json.dumps(res), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
