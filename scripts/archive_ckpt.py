#!/usr/bin/env python
"""Archive a trained checkpoint's inference params as one compact .npz.

Why this exists: training artifacts live on scratch disk, and VM restarts
delete scratch (it happened mid-round-4, destroying the +2.12 dB codec peak
— CAMPAIGN.md r4 §7). Orbax checkpoint dirs are too heavy to commit (the
codec's is ~1.2 GB: params + EMA + Adam state); the *inference* artifact is
just the raw param tree, which fits in one float16 npz that can be
committed to the repo and restored without rebuilding optimizer state.

    python scripts/archive_ckpt.py archive --ckpt /path/ndac_r4/best \
        --kind codec --out artifacts/ndac_best.npz
    python scripts/archive_ckpt.py restore --npz artifacts/ndac_best.npz

`restore` prints the config and param count as a load check; consumers use
`flowdec_tpu.codec.training.load_codec_archive(path)` to get
(codec, params, cfg) — code_corpus.py and demo.py accept .npz checkpoints
through it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowdec_tpu.utils.archive import (  # noqa: E402
    flatten_tree,
    load_archive,
    save_archive,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pa = sub.add_parser("archive")
    pa.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    pa.add_argument("--kind", choices=("codec", "model"), required=True)
    pa.add_argument("--out", required=True, help="output .npz path")
    pa.add_argument("--dtype", default="float16",
                    help="storage dtype for float params ('' keeps original)")
    pa.add_argument("--ema", action="store_true",
                    help="archive EMA params (default raw for codecs: EMA is "
                         "destructive for snake/VQ decoders; models default "
                         "to EMA — the serving tree)")
    pa.add_argument("--meta", default="{}", help="JSON metadata to embed")
    pr = sub.add_parser("restore")
    pr.add_argument("--npz", required=True)
    args = p.parse_args(argv)

    if args.cmd == "archive":
        if args.kind == "codec":
            from flowdec_tpu.codec.training import load_codec

            _codec, params, cfg = load_codec(args.ckpt, ema=args.ema)
            config = {"kind": "codec", "codec": cfg.__dict__}
        else:
            from flowdec_tpu.train.checkpoints import load_config_json, load_model

            _model, params, _cfg = load_model(args.ckpt, ema=True)
            config = {"kind": "model", "model": load_config_json(args.ckpt)}
        size = save_archive(args.out, params, config, dtype=args.dtype or "",
                            meta=json.loads(args.meta))
        print(f"archived {args.ckpt} -> {args.out} "
              f"({size / 1e6:.1f} MB, dtype={args.dtype or 'original'})")
    else:
        params, config, meta = load_archive(args.npz)
        n = sum(int(np.prod(v.shape)) for v in flatten_tree(params).values())
        print(f"kind={config.get('kind')} params={n:,} meta={meta}")


if __name__ == "__main__":
    main()
