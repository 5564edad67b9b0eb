#!/usr/bin/env python
"""Batch inference CLI.

Usage (parity with /root/reference/enhance.py):

    python enhance.py --ckpt <checkpoint_dir> --files f1.wav f2.wav \
        --outdir out/ --N 3 --solver midpoint [--rtf]

Capabilities matching the reference CLI (enhance.py:20-168): filelist /
directory / pair-list inputs, N/solver selection (plus predictor/corrector/
snr for score models), EMA weight selection, --i-min/--i-max job sharding,
input resampling to the model rate, triples-list output, per-file RTF CSV.

Improvements over the reference: files longer than the chunk length are
processed by chunked overlap-add streaming instead of being skipped
(the reference skips files > 30 s, enhance.py:115), and `--ckpt` loading is a
single first-class path (the reference's custom loader is commented out and
its default path silently ignores ema=True — SURVEY.md §7 quirks).
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import List, Optional, Tuple

import numpy as np


def read_list(path: str) -> Tuple[List[str], Optional[List[str]]]:
    """Read a file list; lines may be 'noisy' or 'noisy<sep>clean' (',' or ' ---> ')."""
    with open(path) as f:
        lines = [line.strip() for line in f if line.strip()]
    seps = [s for s in (" ---> ", ",") if any(s in line for line in lines)]
    if not seps:
        return lines, None
    sep = seps[0]
    if not all(sep in line for line in lines):
        raise ValueError(f"Filelist {path} mixes single and paired lines")
    pairs = [line.split(sep) for line in lines]
    return [p[0].strip() for p in pairs], [p[1].strip() for p in pairs]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True, help="checkpoint directory")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--files", nargs="+", help="wav files to enhance")
    src.add_argument("--dir", help="directory of wav files")
    src.add_argument("--file-list", help="filelist (one path per line, optionally paired)")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--N", type=int, default=3,
                        help="solver steps; use 3 with --solver midpoint (NFE=6) "
                             "to match the main model from the paper")
    parser.add_argument("--solver", default="midpoint")
    parser.add_argument("--sigma-fac", type=float, default=1.0)
    # score-model options
    parser.add_argument("--sampler-type", default="pc", choices=["pc", "ode"])
    parser.add_argument("--predictor", default="reverse_diffusion")
    parser.add_argument("--corrector", default="ald")
    parser.add_argument("--snr", type=float, default=0.5)
    parser.add_argument("--ema", action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--i-min", type=int, default=None, help="shard: first index")
    parser.add_argument("--i-max", type=int, default=None, help="shard: last index (excl.)")
    parser.add_argument("--rtf", action="store_true", help="write per-file RTF CSV")
    parser.add_argument("--chunk-seconds", type=float, default=30.0,
                        help="chunked streaming above this length (0 = single-shot)")
    parser.add_argument("--overlap-seconds", type=float, default=1.0)
    parser.add_argument("--compute-dtype", default=None,
                        help="backbone compute dtype for inference (e.g. "
                        "bfloat16; default: checkpoint config / f32)")
    parser.add_argument("--cast-preprocess", action="store_true",
                        help="run the feature chain (STFT/compress/normalize "
                        "and inverse) in --compute-dtype too — the serving "
                        "configuration bench.py measures; noise draws stay "
                        "dtype-invariant (ops/cpair.py crandn)")
    args = parser.parse_args(argv)

    import jax

    from flowdec_tpu.data.dataset import resample_np
    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.models import FlowModel, RegressionModel, ScoreModel
    from flowdec_tpu.serving import StreamingEnhancer
    from flowdec_tpu.train.checkpoints import load_model
    from flowdec_tpu.utils.logging import log

    if args.files:
        noisy_files, clean_files = args.files, None
    elif args.dir:
        noisy_files = sorted(
            os.path.join(args.dir, f) for f in os.listdir(args.dir) if f.endswith(".wav")
        )
        clean_files = None
    else:
        noisy_files, clean_files = read_list(args.file_list)

    sl = slice(args.i_min, args.i_max)
    noisy_files = noisy_files[sl]
    clean_files = clean_files[sl] if clean_files else None

    if os.path.isfile(args.ckpt) and args.ckpt.endswith(".ckpt"):
        # a reference PyTorch Lightning checkpoint (e.g. the released
        # step=800000.ckpt): import it in place — the reference's own
        # enhance.py --ema silently ignored the flag (model.py:352-385
        # commented out); here it selects _pl_ema_state_dict for real
        from flowdec_tpu.convert import load_torch_checkpoint

        model, params, _cfg = load_torch_checkpoint(args.ckpt, ema=args.ema)
    else:
        model, params, _cfg = load_model(args.ckpt, ema=args.ema)
    if args.compute_dtype:
        model = model.replace(compute_dtype=args.compute_dtype)
    if args.cast_preprocess:
        model = model.replace(cast_preprocess=True)
    sr = model.sampling_rate

    if isinstance(model, ScoreModel):
        enhance_kwargs = dict(
            sampler_type=args.sampler_type, predictor=args.predictor,
            corrector=args.corrector, n_steps=args.N, snr=args.snr,
        )
    elif isinstance(model, FlowModel):
        enhance_kwargs = dict(n_steps=args.N, solver=args.solver, sigma_fac=args.sigma_fac)
    else:
        enhance_kwargs = {}

    enhancer = StreamingEnhancer(
        model, params,
        chunk_seconds=args.chunk_seconds or None,
        overlap_seconds=args.overlap_seconds,
        enhance_kwargs=enhance_kwargs,
    )

    os.makedirs(args.outdir, exist_ok=True)
    triples_path = os.path.join(args.outdir, "triples.txt")
    rtf_rows = []
    key = jax.random.PRNGKey(args.seed)

    with open(triples_path, "w") as triples:
        for i, path in enumerate(noisy_files):
            wav, in_sr = read_wav(path)
            if wav.shape[0] > 1:
                wav = np.mean(wav, axis=0, keepdims=True)
            if in_sr != sr:
                wav = resample_np(wav, in_sr, sr)
            y = wav[0]
            file_seconds = len(y) / sr

            start = time.perf_counter()
            x_hat = enhancer(jax.random.fold_in(key, i), y)
            x_hat = np.asarray(x_hat)
            runtime = time.perf_counter() - start

            out_path = os.path.join(args.outdir, os.path.basename(path))
            write_wav(out_path, x_hat, sr)
            clean = clean_files[i] if clean_files else ""
            triples.write(f"{clean},{path},{out_path}\n")
            if args.rtf:
                rtf_rows.append(
                    dict(path=path, runtime=runtime, filetime=file_seconds,
                         rtf=file_seconds / runtime)
                )
            log.info(f"[{i + 1}/{len(noisy_files)}] {path} -> {out_path} "
                     f"({file_seconds / runtime:.1f}x realtime)")

    if args.rtf and rtf_rows:
        rtf_path = os.path.join(args.outdir, "rtfs.csv")
        with open(rtf_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["path", "runtime", "filetime", "rtf"])
            writer.writeheader()
            writer.writerows(rtf_rows)
        log.info(f"Wrote RTFs to {rtf_path}")


if __name__ == "__main__":
    main()
