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
file index so variants see identical noise draws) and reports mean SI-SDR /
SI-SIR / SI-SAR / LogSpecMSE / ESTOI (native) vs the clean reference, next
to the coded-input baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    p.add_argument("--out", default=None, help="JSON output path")
    p.add_argument("--save-audio", default=None,
                   help="optional dir to dump enhanced wavs per variant")
    args = p.parse_args(argv)

    import jax

    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.eval.metrics import LogSpecMSE, SISXR, get_metrics_row
    from flowdec_tpu.train.checkpoints import load_model
    from flowdec_tpu.train.trainer import enhance_bucketed

    with open(args.pairs) as f:
        pairs = [ln.split(args.delim) for ln in f.read().splitlines() if ln]
    if args.limit:
        pairs = pairs[: args.limit]

    from flowdec_tpu.eval.metrics import ESTOI

    metrics = [SISXR(args.sr), LogSpecMSE(args.sr), ESTOI(args.sr)]

    def rows_for(label, wav_fn):
        rows = []
        for i, (cp, yp) in enumerate(pairs):
            x, _ = read_wav(cp.strip())
            y, _ = read_wav(yp.strip())
            x, y = x.ravel(), y.ravel()[: x.size]
            xh = wav_fn(i, y)[: x.size]
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

    def summarize(rows):
        keys = [k for k in rows[0] if k != "name"]
        return {k: float(np.nanmean([r[k] for r in rows])) for k in keys}

    results = {"n_files": len(pairs),
               "coded_input": summarize(rows_for("coded", _identity))}
    print(f"coded input baseline: {results['coded_input']}")

    for spec in args.variant:
        # label:ckpt:N:solver with an optional trailing :sigma_fac — a
        # conservative operating point (sigma_fac<1 starts the bridge closer
        # to the coded input) without retraining anything
        parts = spec.rsplit(":", 4)
        if len(parts) == 5:
            try:
                sigma_fac = float(parts[-1])
                label, ckpt, n, solver = parts[:4]
            except ValueError:
                sigma_fac, (label, ckpt, n, solver) = 1.0, spec.rsplit(":", 3)
        else:
            sigma_fac, (label, ckpt, n, solver) = 1.0, parts
        model, params, _cfg = load_model(ckpt, ema=True)
        t0 = time.time()

        def wav_fn(i, y, _m=model, _p=params, _n=int(n), _s=solver,
                   _sf=sigma_fac):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
            return np.asarray(enhance_bucketed(
                _m, _p, key, y, n_steps=_n, solver=_s, sigma_fac=_sf))

        rows = rows_for(label, wav_fn)
        results[label] = summarize(rows)
        results[label]["wall_s"] = round(time.time() - t0, 1)
        print(f"{label}: {results[label]}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
