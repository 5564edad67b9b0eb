#!/usr/bin/env python
"""A/B-evaluate checkpoints × operating points on a paired test split.

Used for the distillation quality A/B (teacher N=3 midpoint vs distilled
student N=1/2 euler — the quality side of the few-NFE RTF operating point,
PERF.md) and for any checkpoint-vs-checkpoint comparison on SI-SXR /
LogSpecMSE. One variant per --variant flag:

    python scripts/ab_eval.py --pairs /root/corpus/test_pairs.txt --delim , \
        --variant teacher_N3:/ckpts/teacher:3:midpoint \
        --variant student_N1:/ckpts/student:1:euler \
        --out ab_results.json

Each variant enhances every coded file (shape-bucketed, fixed noise seed per
file index so variants see identical noise draws) and reports, vs the clean
reference and next to the coded-input baseline:

  * mean SI-SDR / SI-SIR / SI-SAR / LogSpecMSE / ESTOI (native),
  * bootstrap 95% CIs of each mean (`ci95`),
  * per-file PAIRED deltas vs the coded input with their own bootstrap CIs
    (`delta_vs_coded`) — the statistic that actually decides operating
    points (paired deltas cancel per-file difficulty variance),
  * wall-clock split into first-call (compile-contaminated) and steady
    per-file time, so the JSON is honest as a perf record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNOWN_SOLVERS = ("euler", "midpoint", "heun2", "heun2_euler_last", "rk4")


def parse_variant(spec: str):
    """label:ckpt:N:solver with an optional trailing :sigma_fac.

    The solver token is validated against the registry names so a numeric
    label or colon-bearing path can never silently mis-split into a
    wrong-variant eval (it errors instead).
    """
    parts = spec.rsplit(":", 4)
    sigma_fac = 1.0
    if len(parts) == 5:
        try:
            sigma_fac = float(parts[-1])
            label, ckpt, n, solver = parts[:4]
        except ValueError:
            label, ckpt, n, solver = spec.rsplit(":", 3)
    else:
        label, ckpt, n, solver = parts
    if solver not in KNOWN_SOLVERS:
        raise SystemExit(
            f"--variant {spec!r}: solver {solver!r} not in {KNOWN_SOLVERS} "
            "(ambiguous spec? format is label:ckpt:N:solver[:sigma_fac])")
    return label, ckpt, int(n), solver, sigma_fac


def bootstrap_ci(values: np.ndarray, n_boot: int = 10000, seed: int = 0):
    """Percentile-bootstrap 95% CI of the nan-mean over files."""
    vals = np.asarray(values, dtype=np.float64)
    rng = np.random.default_rng(seed)
    n = len(vals)
    idx = rng.integers(0, n, size=(n_boot, n))
    with np.errstate(invalid="ignore"):
        means = np.nanmean(vals[idx], axis=1)
    lo, hi = np.nanpercentile(means, [2.5, 97.5])
    return [float(lo), float(hi)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pairs", required=True, help="clean,coded filelist")
    p.add_argument("--delim", default=",")
    p.add_argument("--variant", action="append", required=True,
                   help="label:ckpt_dir:N:solver[:sigma_fac] (repeatable; "
                        "sigma_fac scales the initial noise, default 1.0)")
    p.add_argument("--limit", type=int, default=0, help="cap #files (0=all)")
    p.add_argument("--sr", type=int, default=48000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-boot", type=int, default=10000,
                   help="bootstrap resamples for the 95% CIs")
    p.add_argument("--out", default=None, help="JSON output path")
    p.add_argument("--per-file", action="store_true",
                   help="include per-file metric rows in the JSON")
    p.add_argument("--save-audio", default=None,
                   help="optional dir to dump enhanced wavs per variant")
    args = p.parse_args(argv)

    variants = [parse_variant(s) for s in args.variant]

    import jax

    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.eval.metrics import ESTOI, LogSpecMSE, SISXR, get_metrics_row
    from flowdec_tpu.train.checkpoints import load_model
    from flowdec_tpu.train.trainer import enhance_bucketed

    with open(args.pairs) as f:
        pairs = [ln.split(args.delim) for ln in f.read().splitlines() if ln]
    if args.limit:
        pairs = pairs[: args.limit]

    metrics = [SISXR(args.sr), LogSpecMSE(args.sr), ESTOI(args.sr)]

    def rows_for(label, wav_fn, walls=None):
        rows = []
        for i, (cp, yp) in enumerate(pairs):
            x, _ = read_wav(cp.strip())
            y, _ = read_wav(yp.strip())
            x, y = x.ravel(), y.ravel()[: x.size]
            t0 = time.time()
            xh = wav_fn(i, y)[: x.size]
            if walls is not None:
                walls.append(time.time() - t0)
            if args.save_audio and wav_fn is not _identity:
                d = os.path.join(args.save_audio, label)
                os.makedirs(d, exist_ok=True)
                write_wav(os.path.join(d, os.path.basename(cp.strip())),
                          xh, args.sr)
            rows.append(get_metrics_row(
                metrics, os.path.basename(cp.strip()), xh, x, y))
        return rows

    def _identity(i, y):
        return y

    def summarize(rows, baseline_rows=None):
        keys = [k for k in rows[0] if k != "name"]
        out = {k: float(np.nanmean([r[k] for r in rows])) for k in keys}
        out["ci95"] = {k: bootstrap_ci(
            np.array([r[k] for r in rows]), args.n_boot) for k in keys}
        if baseline_rows is not None:
            # paired per-file deltas vs the coded input: same file, same
            # noise draw — cancels per-file difficulty variance
            deltas = {}
            for k in keys:
                d = np.array([r[k] - b[k]
                              for r, b in zip(rows, baseline_rows)])
                deltas[k] = {"mean": float(np.nanmean(d)),
                             "ci95": bootstrap_ci(d, args.n_boot)}
            out["delta_vs_coded"] = deltas
        return out

    coded_rows = rows_for("coded", _identity)
    results = {"n_files": len(pairs), "n_boot": args.n_boot,
               "coded_input": summarize(coded_rows)}
    if args.per_file:
        results["coded_input"]["per_file"] = coded_rows
    print(f"coded input baseline: n={len(pairs)} "
          f"{ {k: v for k, v in results['coded_input'].items() if not isinstance(v, dict)} }")

    for label, ckpt, n, solver, sigma_fac in variants:
        model, params, _cfg = load_model(ckpt, ema=True)
        t0 = time.time()

        def wav_fn(i, y, _m=model, _p=params, _n=n, _s=solver, _sf=sigma_fac):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
            return np.asarray(enhance_bucketed(
                _m, _p, key, y, n_steps=_n, solver=_s, sigma_fac=_sf))

        walls = []
        rows = rows_for(label, wav_fn, walls=walls)
        results[label] = summarize(rows, baseline_rows=coded_rows)
        # wall split: the first call of each compiled shape pays compile;
        # report total, the max single-file time (≈ compile if cold), and
        # the median per-file steady time so the JSON is honest as perf data
        results[label]["wall_s"] = round(time.time() - t0, 1)
        results[label]["wall_s_max_file"] = round(max(walls), 1)
        results[label]["wall_s_median_file"] = round(
            float(np.median(walls)), 3)
        if args.per_file:
            results[label]["per_file"] = rows
        show = {k: v for k, v in results[label].items()
                if not isinstance(v, (dict, list))}
        print(f"{label}: {show}")
        d = results[label]["delta_vs_coded"]
        print(f"  Δvs coded: " + "  ".join(
            f"{k} {v['mean']:+.3f} [{v['ci95'][0]:+.3f},{v['ci95'][1]:+.3f}]"
            for k, v in d.items()))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
