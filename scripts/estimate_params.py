#!/usr/bin/env python
"""Offline estimation of the feature scale β and noise scale σ_y.

Capability parity with /root/reference/scripts/estimate_flowdec_params.py:
sample N (clean, coded) pairs, extract α-compressed complex STFT features
(β=1 during estimation), then
    β   = 1 / quantile_0.997(|X|)                    (:158-159)
    σ_y = quantile_0.997(RMSE(Y−X)) / 3   globally   (:173-191)
          or per frequency band → .npy              (:163-171)

Deliberate deviations (pinned by tests/test_reference_parity.py):
  * per-band σ_y uses the TRUE per-band RMSE (time-norm / sqrt(n_frames));
    the reference divides by sqrt(n_freq_bins) (`diff.shape[-2]**0.5`,
    :166) — a constant-factor quirk, σ_y being a calibration constant.
  * β takes the quantile of per-file quantiles (bounded memory) instead of
    one pooled quantile over all bins (equal in distribution).

Usage:
    python scripts/estimate_params.py --pairs-file pairs.txt \
        --alpha 0.3 --nfft 1534 --hop 384 [--per-band out.npy] [--n 2500]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default to CPU: each pair is two tiny 2-second STFTs — host-scale work.
# On the remote-TPU tunnel the per-call round-trip latency dominates and a
# 400-pair estimation that takes <1 min on CPU ran >40 min (round-4 chain
# log). Respect an explicit JAX_PLATFORMS if the caller set one.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

N_SAMPLES = 2500
SECONDS = 2
SEED = 302


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pairs-file", required=True)
    parser.add_argument("--delim", default=" ---> ")
    parser.add_argument("--alpha", type=float, required=True)
    parser.add_argument("--nfft", type=int, required=True)
    parser.add_argument("--hop", type=int, required=True)
    parser.add_argument("--sr", type=int, default=48000)
    parser.add_argument("--n", type=int, default=N_SAMPLES)
    parser.add_argument("--seconds", type=float, default=SECONDS)
    parser.add_argument("--seed", type=int, default=SEED)
    parser.add_argument("--quantile", type=float, default=0.997)
    parser.add_argument("--per-band", default=None, help="write per-band sigma_y .npy here")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from flowdec_tpu.data.dataset import _load_mono
    from flowdec_tpu.ops.cpair import cabs
    from flowdec_tpu.ops.stft import hann_window, stft_pair
    from flowdec_tpu.ops.compression import compress_pair

    with open(args.pairs_file) as f:
        pairs = [line.split(args.delim) for line in f.read().splitlines() if line]
    rng = np.random.default_rng(args.seed)
    idx = rng.choice(len(pairs), size=min(args.n, len(pairs)), replace=False)

    window = hann_window(args.nfft)
    tgt = int(args.seconds * args.sr)

    all_absx, band_rmses, global_rmses = [], [], []
    for j, i in enumerate(idx):
        clean_path, coded_path = pairs[i][0].strip(), pairs[i][1].strip()
        x = _load_mono(clean_path, args.sr)[0]
        y = _load_mono(coded_path, args.sr)[0]
        y = y[: len(x)]
        # random crop/pad to the target duration
        if len(x) > tgt:
            start = int(rng.integers(0, len(x) - tgt))
            x, y = x[start : start + tgt], y[start : start + tgt]
        else:
            pad = tgt - len(x)
            x, y = np.pad(x, (0, pad)), np.pad(y, (0, pad))
        normfac = np.abs(y).max() + 1e-5
        x, y = x / normfac, y / normfac

        X = compress_pair(
            stft_pair(jnp.asarray(x), window, hop_length=args.hop), args.alpha, 1.0
        )
        Y = compress_pair(
            stft_pair(jnp.asarray(y), window, hop_length=args.hop), args.alpha, 1.0
        )
        absx = np.asarray(cabs(X))  # (F, T)
        err2 = np.asarray(cabs(Y - X)) ** 2
        all_absx.append(np.quantile(absx, args.quantile))
        band_rmses.append(np.sqrt(err2.mean(axis=-1)))  # per-band RMSE
        global_rmses.append(np.sqrt(err2.mean()))
        if (j + 1) % 100 == 0:
            print(f"{j + 1}/{len(idx)} pairs processed", file=sys.stderr)

    # β from the quantile of per-file quantiles of |X| (approximates the
    # pooled quantile without holding all features in memory)
    beta = 1.0 / float(np.quantile(all_absx, args.quantile))
    sigma_y_global = float(np.quantile(global_rmses, args.quantile)) / 3.0
    print(f"beta = {beta:.6f}")
    print(f"sigma_y (global) = {sigma_y_global:.6f}")

    if args.per_band:
        band = np.quantile(np.stack(band_rmses), args.quantile, axis=0) / 3.0
        np.save(args.per_band, band.astype(np.float64))
        print(f"sigma_y (per-band, shape {band.shape}) -> {args.per_band}")


if __name__ == "__main__":
    main()
