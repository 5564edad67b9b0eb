#!/usr/bin/env python
"""End-to-end codec pipeline demo (the demo.ipynb equivalent).

Replicates the reference's "product" path (SURVEY.md §3.3 / demo.ipynb cell 4):

    load wav → resample to codec rate → NDAC encode (n_quantizers controls
    bitrate) → codes → from_codes → NDAC decode (the coded baseline y)
    → FlowDec postfilter enhance(y, N=3, midpoint) → clip guard → save

With trained checkpoints pass --codec-ckpt/--flowdec-ckpt; without them the
demo runs the full pipeline on randomly-initialized weights (architecture
smoke-run, useful for shape/latency inspection).

Usage:
    python scripts/demo.py --input in.wav --outdir demo_out [--nq 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="input wav")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--nq", type=int, default=10,
                        help="codec quantizers (10 ⇒ 7.5 kbps @48 kHz)")
    parser.add_argument("--N", type=int, default=3)
    parser.add_argument("--solver", default="midpoint")
    parser.add_argument("--flowdec-ckpt", default=None)
    parser.add_argument("--codec-ckpt", default=None, help="orbax dir with NDAC params")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flowdec_tpu.codec import NDAC, NDACConfig
    from flowdec_tpu.data.dataset import resample_np
    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.models import sigma_models, AmplitudeCompressedComplexSTFT, FlowModel
    from flowdec_tpu.nn import FLOWDEC_FINAL_NO_ATTN, NCSNpp
    from flowdec_tpu.serving import StreamingEnhancer
    from flowdec_tpu.utils.logging import log

    sr = 48000
    os.makedirs(args.outdir, exist_ok=True)

    # --- load + resample ---
    wav, in_sr = read_wav(args.input)
    if wav.shape[0] > 1:
        wav = np.mean(wav, axis=0, keepdims=True)
    if in_sr != sr:
        wav = resample_np(wav, in_sr, sr)
    x = jnp.asarray(wav, jnp.float32)  # (1, T)

    # --- codec ---
    if args.codec_ckpt and args.codec_ckpt.endswith(".npz"):
        from flowdec_tpu.codec.training import load_codec_archive

        codec, codec_params, codec_cfg = load_codec_archive(args.codec_ckpt)
    elif args.codec_ckpt:
        from flowdec_tpu.codec import load_codec

        # raw weights: weight-EMA is destructive for the snake/VQ codec
        # (measured r4: EMA decodes near-silence, LogSpecMSE 666 vs raw 159)
        # — same default as code_corpus.py
        codec, codec_params, codec_cfg = load_codec(args.codec_ckpt, ema=False)
    else:
        codec_cfg = NDACConfig()
        codec = NDAC(codec_cfg)
        log.warning("No --codec-ckpt: NDAC runs with random weights (smoke run)")
        codec_params = codec.init(jax.random.PRNGKey(0), x[:, : codec_cfg.hop_length * 8])

    t0 = time.perf_counter()
    z_q, codes, latents, _, _ = codec.apply(codec_params, x, args.nq, method=codec.encode)
    z_q2 = codec.apply(codec_params, codes, args.nq, method=codec.from_codes)
    y_coded = codec.apply(codec_params, z_q2, method=codec.decode)[..., : x.shape[-1]]
    t1 = time.perf_counter()
    log.info(
        f"NDAC: nq={args.nq} ⇒ {codec_cfg.kbps(args.nq):.2f} kbps, "
        f"codes shape {codes.shape}, codec round trip {t1 - t0:.2f}s"
    )

    # --- postfilter ---
    if args.flowdec_ckpt:
        from flowdec_tpu.train.checkpoints import load_model

        model, params, _ = load_model(args.flowdec_ckpt, ema=True)
    else:
        log.warning("No --flowdec-ckpt: FlowDec runs with random weights (smoke run)")
        model = FlowModel(
            backbone=NCSNpp(FLOWDEC_FINAL_NO_ATTN),
            feature_extractor=AmplitudeCompressedComplexSTFT(
                n_fft=1534, sampling_rate=sr, alpha=0.3, beta=0.33, n_hops=4
            ),
            sampling_rate=sr,
            sigma_y=jnp.asarray(
                sigma_models.from_file("flowdec_autoparams_75m.npy", kernel_bandwidth=3)
            ),
            compute_dtype="bfloat16",
        )
        params = model.init_params(jax.random.PRNGKey(1), frames=256)

    enhancer = StreamingEnhancer(
        model, params, enhance_kwargs=dict(n_steps=args.N, solver=args.solver)
    )
    t0 = time.perf_counter()
    x_hat = enhancer(jax.random.PRNGKey(2), np.asarray(y_coded)[0])
    t1 = time.perf_counter()
    seconds = x.shape[-1] / sr
    log.info(f"FlowDec: N={args.N} {args.solver} ⇒ {seconds / (t1 - t0):.1f}x realtime (incl. compile)")

    # clip guard (demo.ipynb cell 4)
    peak = float(np.max(np.abs(x_hat)))
    if peak > 1.0:
        x_hat = x_hat / peak

    write_wav(os.path.join(args.outdir, "input.wav"), np.asarray(x)[0], sr)
    write_wav(os.path.join(args.outdir, "coded_ndac.wav"), np.asarray(y_coded)[0], sr)
    write_wav(os.path.join(args.outdir, "enhanced_flowdec.wav"), x_hat, sr)
    log.info(f"Wrote input/coded/enhanced wavs to {args.outdir}")


if __name__ == "__main__":
    main()
