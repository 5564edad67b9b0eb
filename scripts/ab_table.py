#!/usr/bin/env python
"""Render an ab_eval JSON as a markdown table with paired-delta CIs.

    python scripts/ab_table.py AB_r05.json
"""

from __future__ import annotations

import argparse
import json


def fmt_ci(d):
    return f"{d['mean']:+.2f} [{d['ci95'][0]:+.2f},{d['ci95'][1]:+.2f}]"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("json")
    args = p.parse_args(argv)

    r = json.load(open(args.json))
    base = r["coded_input"]
    print(f"n = {r['n_files']} files, bootstrap {r.get('n_boot', '?')} "
          f"resamples. Coded-input baseline: SI-SDR {base['sisdr']:+.2f}, "
          f"LogSpecMSE {base['logspec_mse']:.1f}, ESTOI {base['estoi']:.3f}.")
    print()
    print("| variant | SI-SDR | Δ [CI95] | LogSpecMSE | Δ [CI95] | ESTOI | Δ [CI95] | steady s/file |")
    print("|---|---|---|---|---|---|---|---|")
    for k, v in r.items():
        if not isinstance(v, dict) or "delta_vs_coded" not in v:
            continue
        d = v["delta_vs_coded"]
        dom = (d["sisdr"]["mean"] > 0 and d["logspec_mse"]["mean"] < 0
               and d["estoi"]["mean"] > 0)
        mark = " **(dominates)**" if dom else ""
        print(f"| {k}{mark} | {v['sisdr']:+.2f} | {fmt_ci(d['sisdr'])} "
              f"| {v['logspec_mse']:.1f} | {fmt_ci(d['logspec_mse'])} "
              f"| {v['estoi']:.3f} | {fmt_ci(d['estoi'])} "
              f"| {v.get('wall_s_median_file', '')} |")


if __name__ == "__main__":
    main()
