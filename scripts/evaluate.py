#!/usr/bin/env python
"""Offline metric evaluation over enhanced files.

The reference's offline analysis path (SURVEY.md §2.6: get_metrics_df[_parallel]
over triples of (clean, coded, enhanced) audio). Reads the triples list that
enhance.py writes (clean,noisy,enhanced per line), computes the requested
metrics (optionally in a multiprocessing pool), and writes a CSV + prints
per-metric means.

Usage:
    python scripts/evaluate.py --triples out/triples.txt --sr 48000 \
        --metrics sisxr logspec_mse snrseg fwsnrseg [--poolsize 16] --out metrics.csv
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRIC_FACTORIES = {
    "sisxr": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["SISXR"]).SISXR(sr),
    "logspec_mse": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["LogSpecMSE"]).LogSpecMSE(sr),
    "snrseg": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["SNRseg"]).SNRseg(sr),
    "fwsnrseg": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["FWSNRseg"]).FWSNRseg(sr),
    "pesq": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["PESQ"]).PESQ(sr),
    "estoi": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["ESTOI"]).ESTOI(sr),
    "dnsmos": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["DNSMOS"]).DNSMOS(sr),
    "sigmos": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["SIGMOS"]).SIGMOS(sr),
    "visqol": lambda sr: __import__("flowdec_tpu.eval.metrics", fromlist=["ViSQOL"]).ViSQOL(sr),
}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--triples", required=True,
                        help="file with clean,noisy,enhanced per line (enhance.py output)")
    parser.add_argument("--sr", type=int, default=48000)
    parser.add_argument("--metrics", nargs="+", default=["sisxr", "logspec_mse"],
                        choices=sorted(METRIC_FACTORIES))
    parser.add_argument("--poolsize", type=int, default=0,
                        help=">0: evaluate files in a spawn pool of this size")
    parser.add_argument("--out", default=None, help="CSV output path")
    args = parser.parse_args(argv)

    from flowdec_tpu.eval.metrics import get_metrics_df, get_metrics_df_parallel
    from flowdec_tpu.utils.audio import load_audio

    rows = [line.strip().split(",") for line in open(args.triples) if line.strip()]
    x_list, y_list, xhat_list, names = [], [], [], []
    for clean, noisy, enhanced in rows:
        x = load_audio(clean, args.sr)[0] if clean else None
        y = load_audio(noisy, args.sr)[0]
        x_hat = load_audio(enhanced, args.sr)[0]
        if x is None:
            x = y  # no reference available: intrusive metrics vs noisy
        n = min(len(x), len(y), len(x_hat))
        x_list.append(x[:n])
        y_list.append(y[:n])
        xhat_list.append(x_hat[:n])
        names.append(os.path.basename(noisy))

    if args.poolsize > 0:
        factories = [
            (lambda name=name: METRIC_FACTORIES[name](args.sr))
            for name in args.metrics
        ]
        df = get_metrics_df_parallel(
            xhat_list, x_list, y_list, factories, names=names, poolsize=args.poolsize
        )
    else:
        metrics = [METRIC_FACTORIES[name](args.sr) for name in args.metrics]
        df = get_metrics_df(xhat_list, x_list, y_list, metrics, names=names)

    numeric = df.select_dtypes(include=[np.number])
    print(df.to_string(index=False))
    print("\nmeans:")
    for col in numeric.columns:
        print(f"  {col}: {np.nanmean(numeric[col]):.4f}")
    if args.out:
        df.to_csv(args.out, index=False)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
