#!/usr/bin/env python
"""Render a training run's validation trajectory as a markdown table.

Reads the JsonlLogger metrics file a campaign writes and prints the
step / valid_loss / per-variant SI-SDR + LogSpecMSE table CAMPAIGN.md
records (the reference logs the same quantities to W&B; here the artifact
is greppable JSONL).

    python scripts/trajectory_table.py /root/campaign4/runs/ndac25b/metrics.jsonl
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("metrics", help="metrics.jsonl path")
    p.add_argument("--every", type=int, default=1,
                   help="print every k-th validation row")
    args = p.parse_args(argv)

    rows = []
    variants = []
    for line in open(args.metrics):
        r = json.loads(line)
        if "valid_loss" not in r:
            continue
        rows.append(r)
        for k in r:
            if k.startswith("sisdr_") and k[6:] not in variants:
                variants.append(k[6:])
    if not rows:
        print("no validation rows")
        return

    cols = ["step", "valid_loss"]
    hdr = ["step", "valid_loss"]
    for v in variants:
        cols += [f"sisdr_{v}", f"logspec_mse_{v}"]
        hdr += [f"SI-SDR {v}", f"LogSpecMSE {v}"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows[:: args.every]:
        cells = []
        for c in cols:
            val = r.get(c)
            if val is None:
                cells.append("")
            elif c == "step":
                cells.append(str(int(val)))
            elif "loss" in c:
                cells.append(f"{val:.4f}")
            elif "logspec" in c:
                cells.append(f"{val:.1f}")
            else:
                cells.append(f"{val:+.2f}")
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
