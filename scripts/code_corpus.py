#!/usr/bin/env python
"""Re-code a paired corpus's CODED side through a trained NDAC.

The reference's coded `y` side IS NDAC output (demo.ipynb cell 4: encode →
codes → from_codes → decode on released weights; data_module.py pairs clean x
with that y). This script regenerates a make_corpus.py-layout corpus so its
coded side is *actual NDAC-coded audio* from a checkpoint trained by
scripts/train_codec.py — making the postfilter campaign's degradation the
product codec itself, not a hand-made stand-in.

Layout written (clean paths reference the SOURCE corpus — no duplication):

    <out>/<split>/coded/*.wav
    <out>/{split}_pairs.txt           clean(src),coded(out) lines

With --report it also prints autoencode quality (SI-SDR / LogSpecMSE) of the
coded side vs clean on the test split at the chosen nq.

Usage:
    python scripts/code_corpus.py --corpus /root/corpus --out /root/corpus_ndac \
        --codec-ckpt /root/codec_ckpts/ndac --nq 10 --batch 8 --report
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_pairs(path: str, delim: str = ","):
    with open(path) as fh:
        return [line.strip().split(delim) for line in fh if line.strip()]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", required=True, help="source corpus dir (make_corpus.py layout)")
    p.add_argument("--out", required=True)
    p.add_argument("--codec-ckpt", required=True)
    p.add_argument("--nq", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--splits", default="train,valid,test")
    # raw params by default: weight-EMA is destructive for the snake/VQ codec
    # (measured r4: EMA LogSpecMSE 666 vs raw 159 at the same step) — EMA
    # averaging of live codebooks + snake frequencies decodes near-silence
    p.add_argument("--ema", action=argparse.BooleanOptionalAction, default=False)
    p.add_argument("--report", action="store_true",
                   help="print SI-SDR/LogSpecMSE of coded vs clean per split")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flowdec_tpu.codec import NDAC, load_codec
    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.utils.logging import log

    if args.codec_ckpt.endswith(".npz"):
        # repo-archived codec (scripts/archive_ckpt.py): raw params + config
        from flowdec_tpu.codec.training import load_codec_archive

        codec, params, cfg = load_codec_archive(args.codec_ckpt)
    else:
        codec, params, cfg = load_codec(args.codec_ckpt, ema=args.ema)
    hop = cfg.hop_length
    log.info(f"NDAC loaded: nq={args.nq} ⇒ {cfg.kbps(args.nq):.2f} kbps, hop {hop}")
    if args.report:
        from flowdec_tpu.eval.metrics import LogSpecMSE, SISXR

        m_sisdr = SISXR(cfg.sampling_rate)
        m_lsm = LogSpecMSE(cfg.sampling_rate)

    @jax.jit
    def code(params, x):
        # the product path: encode → integer codes → from_codes → decode
        _zq, codes, *_ = codec.apply(params, x, args.nq, method=NDAC.encode)
        z_q = codec.apply(params, codes, args.nq, method=NDAC.from_codes)
        return codec.apply(params, z_q, method=NDAC.decode)

    # bucket batch lengths to hop-aligned multiples of ~0.68 s so a
    # heterogeneous corpus compiles only a handful of shapes instead of
    # padding everything to the global max
    bucket = hop * max(1, -(-32768 // hop))

    for split in args.splits.split(","):
        pairs = read_pairs(os.path.join(args.corpus, f"{split}_pairs.txt"))
        ydir = os.path.join(args.out, split, "coded")
        os.makedirs(ydir, exist_ok=True)

        # coded filenames: path relative to the corpus root (separators
        # flattened) so two clean files sharing a basename can't overwrite
        # each other; any residual collision gets an index prefix
        names, taken = [], set()
        for idx, (clean_path, _) in enumerate(pairs):
            rel = os.path.relpath(os.path.abspath(clean_path), os.path.abspath(args.corpus))
            name = (
                os.path.basename(clean_path)
                if rel.startswith("..")
                else rel.replace(os.sep, "__")
            )
            if name in taken:
                name = f"{idx:05d}__{name}"
            taken.add(name)
            names.append(name)

        # sort by on-disk size (∝ length for wav) so each batch pads to a
        # near-uniform bucketed length; files are read lazily per batch
        order = sorted(range(len(pairs)), key=lambda i: os.path.getsize(pairs[i][0]))
        out_lines = [None] * len(pairs)
        metrics, shapes = [], set()
        B = args.batch
        for i0 in range(0, len(order), B):
            idxs = order[i0 : i0 + B]
            chunk, lens = [], []
            for idx in idxs:
                wav, sr = read_wav(pairs[idx][0])
                assert sr == cfg.sampling_rate, (
                    f"{pairs[idx][0]}: sr {sr} != codec {cfg.sampling_rate}"
                )
                x = np.mean(wav, axis=0) if wav.ndim > 1 else wav
                chunk.append(x.astype(np.float32))
                lens.append(x.shape[-1])
            L = max(lens)
            L += (-L) % bucket
            shapes.add(L)
            xb = np.zeros((B, L), np.float32)
            for j, x in enumerate(chunk):
                xb[j, : x.shape[-1]] = x
            yb = np.asarray(code(params, jnp.asarray(xb)))
            for j, (idx, x) in enumerate(zip(idxs, chunk)):
                y = yb[j, : lens[j]]
                coded_path = os.path.join(ydir, names[idx])
                write_wav(coded_path, y, cfg.sampling_rate)
                out_lines[idx] = f"{pairs[idx][0]},{coded_path}"
                if args.report:
                    metrics.append((m_sisdr(y, x, y)[0], m_lsm(y, x)))
        log.info(f"{split}: {len(shapes)} compiled batch shape(s)")

        with open(os.path.join(args.out, f"{split}_pairs.txt"), "w") as fh:
            fh.write("\n".join(out_lines) + "\n")
        msg = f"{split}: {len(out_lines)} pairs coded at nq={args.nq}"
        if args.report and metrics:
            sisdr = float(np.mean([m[0] for m in metrics]))
            lsm = float(np.mean([m[1] for m in metrics]))
            msg += f"  autoencode SI-SDR {sisdr:.2f} dB, LogSpecMSE {lsm:.1f}"
        log.info(msg)


if __name__ == "__main__":
    main()
