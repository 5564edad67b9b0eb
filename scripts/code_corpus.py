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
    p.add_argument("--ema", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--report", action="store_true",
                   help="print SI-SDR/LogSpecMSE of coded vs clean per split")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flowdec_tpu.codec import NDAC, load_codec
    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.utils.logging import log

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

    for split in args.splits.split(","):
        pairs = read_pairs(os.path.join(args.corpus, f"{split}_pairs.txt"))
        ydir = os.path.join(args.out, split, "coded")
        os.makedirs(ydir, exist_ok=True)

        # one static shape for the whole corpus: pad every file to the max
        # hop-aligned length; one compile, full batches (last batch zero-padded)
        lens, cleans, srs = [], [], set()
        for clean_path, _ in pairs:
            wav, sr = read_wav(clean_path)
            srs.add(sr)
            x = np.mean(wav, axis=0) if wav.ndim > 1 else wav
            cleans.append(x.astype(np.float32))
            lens.append(x.shape[-1])
        assert srs == {cfg.sampling_rate}, f"corpus sr {srs} != codec {cfg.sampling_rate}"
        L = max(lens)
        L += (-L) % hop

        out_lines, metrics = [], []
        B = args.batch
        for i0 in range(0, len(pairs), B):
            chunk = cleans[i0 : i0 + B]
            xb = np.zeros((B, L), np.float32)
            for j, x in enumerate(chunk):
                xb[j, : x.shape[-1]] = x
            yb = np.asarray(code(params, jnp.asarray(xb)))
            for j, x in enumerate(chunk):
                idx = i0 + j
                y = yb[j, : lens[idx]]
                name = os.path.basename(pairs[idx][0])
                coded_path = os.path.join(ydir, name)
                write_wav(coded_path, y, cfg.sampling_rate)
                out_lines.append(f"{pairs[idx][0]},{coded_path}")
                if args.report:
                    metrics.append((m_sisdr(y, x, y)[0], m_lsm(y, x)))

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
