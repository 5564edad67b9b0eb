#!/usr/bin/env python
"""NDAC codec training CLI (non-adversarial).

The reference consumes NDAC pretrained (external package); this CLI makes the
codec trainable end to end in this framework: multi-scale mel + STFT +
waveform reconstruction with RVQ commitment/codebook terms and per-sample
quantizer dropout, DP over all local devices, Orbax checkpoints.

Usage:
    python scripts/train_codec.py --audio-dir /data/wavs --steps 100000 \
        --batch-size 16 --crop-seconds 0.38 --ckpt-dir ckpts/ndac
(or --pairs-file pairs.txt to train on the clean side of a paired list)
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
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--audio-dir", help="directory of wav files")
    src.add_argument("--pairs-file", help="clean,coded list; trains on the clean side")
    parser.add_argument("--ckpt-dir", required=True)
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--crop-seconds", type=float, default=0.38,
                        help="training crop (DAC uses ~0.38 s)")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr2", type=float, default=None,
                        help="second-stage lr; with --lr-switch builds the "
                        "measured peak-then-cold-refine schedule (CAMPAIGN.md "
                        "r4: 1e-4 peaks alignment by ~6k steps, then RVQ "
                        "codebook churn decays it; 3e-5 recovers) in one run")
    parser.add_argument("--lr-switch", type=int, default=None,
                        help="step at which lr switches to --lr2")
    parser.add_argument("--grad-clip", type=float, default=1.0,
                        help="global grad-norm clip (the RVQ terms explode "
                             "unclipped at init); pass 0 to disable")
    parser.add_argument("--sr", type=int, default=48000)
    # codec geometry (defaults = NDAC 48 kHz full-band; smaller values train
    # compact codecs and make CPU smoke-drives of this CLI tractable)
    parser.add_argument("--encoder-dim", type=int, default=None)
    parser.add_argument("--decoder-dim", type=int, default=None)
    parser.add_argument("--latent-dim", type=int, default=None)
    parser.add_argument("--n-codebooks", type=int, default=None)
    parser.add_argument("--encoder-rates", default=None,
                        help="comma list, e.g. 2,4,8,10 (product = hop)")
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--ckpt-every", type=int, default=5000)
    parser.add_argument("--seed", type=int, default=0)
    # loss mix (CodecLossWeights defaults; --w-complex-stft is the phase-aware
    # term — magnitude-only training left the r3 codec at SI-SDR −40 dB)
    parser.add_argument("--w-mel", type=float, default=15.0)
    parser.add_argument("--w-stft", type=float, default=1.0)
    parser.add_argument("--w-waveform", type=float, default=1.0)
    parser.add_argument("--w-complex-stft", type=float, default=1.0)
    parser.add_argument("--w-snr", type=float, default=0.0)
    parser.add_argument("--w-commitment", type=float, default=0.25)
    parser.add_argument("--w-codebook", type=float, default=1.0)
    parser.add_argument("--nq-min", type=int, default=1,
                        help="quantizer-dropout lower bound (raise for an "
                        "alignment-focused stage: nq 1-3 samples can never "
                        "waveform-align and dilute the phase gradient)")
    # periodic held-out autoencode eval (reports the SI-SDR/LogSpecMSE
    # trajectory the r3 campaign was missing)
    parser.add_argument("--valid-pairs", help="pairs file; clean side is "
                        "autoencoded at --eval-nq every --eval-every steps")
    parser.add_argument("--eval-every", type=int, default=1000)
    parser.add_argument("--eval-nq", type=int, default=10)
    parser.add_argument("--eval-files", type=int, default=6)
    parser.add_argument("--eval-seconds", type=float, default=1.92)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from flowdec_tpu.codec import (
        CodecLossWeights,
        NDAC,
        NDACConfig,
        codec_optimizer,
        create_codec_train_state,
        make_codec_train_step,
    )
    from flowdec_tpu.data.dataset import PairedAudioFiles, BatchLoader
    from flowdec_tpu.parallel import make_mesh, shard_batch
    from flowdec_tpu.train.checkpoints import CheckpointManager
    from flowdec_tpu.utils.logging import log

    geo = {
        k: getattr(args, k)
        for k in ("encoder_dim", "decoder_dim", "latent_dim", "n_codebooks")
        if getattr(args, k) is not None
    }
    if args.encoder_rates:
        geo["encoder_rates"] = tuple(int(r) for r in args.encoder_rates.split(","))
    cfg = NDACConfig(sampling_rate=args.sr, **geo)
    crop = int(args.crop_seconds * args.sr)
    crop += (-crop) % cfg.hop_length  # hop-aligned crops (no padding in-loop)
    crop_seconds = crop / args.sr

    if args.pairs_file:
        dataset = PairedAudioFiles(
            args.pairs_file, args.sr, crop_seconds, random_crop=True,
            mode="paired_filelist",
        )
    else:
        dataset = PairedAudioFiles(
            args.audio_dir, args.sr, crop_seconds, random_crop=True,
            noisy_path=args.audio_dir, mode="folderglob",
        )
    loader = BatchLoader(
        dataset, args.batch_size, shuffle=True, seed=args.seed,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
    )

    codec = NDAC(cfg)
    optimizer = codec_optimizer(
        args.lr, grad_clip=args.grad_clip or None,
        lr2=args.lr2, switch_step=args.lr_switch,
    )
    state = create_codec_train_state(
        codec, jax.random.PRNGKey(args.seed), optimizer, length=crop
    )
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    weights = CodecLossWeights(
        mel=args.w_mel, stft=args.w_stft, waveform=args.w_waveform,
        complex_stft=args.w_complex_stft, snr=args.w_snr,
        commitment=args.w_commitment,
        codebook=args.w_codebook,
    )
    step_fn = make_codec_train_step(
        codec, optimizer, weights=weights, nq_min=args.nq_min, mesh=mesh
    )
    ckpt = CheckpointManager(
        args.ckpt_dir, last_every_n_steps=args.ckpt_every,
        snapshot_every_n_steps=10 * args.ckpt_every,
        # optimizer settings recorded so load_codec can rebuild the exact
        # opt_state tree structure (grad_clip=0 saves a bare-adamw state
        # that a default clip-wrapped template would fail to restore)
        config={
            "codec": cfg.__dict__,
            "optimizer": {"lr": args.lr, "grad_clip": args.grad_clip or None,
                          "lr2": args.lr2, "switch_step": args.lr_switch},
            "loss_weights": weights.as_dict(),
        },
    )
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)

    # held-out autoencode eval: fixed-shape batch of the first --eval-files
    # clean validation files, full product path result ≙ forward() at eval_nq,
    # SI-SDR + LogSpecMSE on host (the r3 campaign had no quality trajectory)
    eval_x = None
    if args.valid_pairs:
        from flowdec_tpu.data.wavio import read_wav
        from flowdec_tpu.eval.metrics import LogSpecMSE, SISXR

        m_sisdr, m_lsm = SISXR(args.sr), LogSpecMSE(args.sr)
        eval_len = int(args.eval_seconds * args.sr)
        eval_len += (-eval_len) % cfg.hop_length
        rows = []
        with open(args.valid_pairs) as fh:
            for line in fh:
                if not line.strip():
                    continue
                wav, sr = read_wav(line.split(",")[0].strip())
                assert sr == args.sr
                x = np.mean(wav, axis=0) if wav.ndim > 1 else wav
                if x.shape[-1] < eval_len:
                    x = np.pad(x, (0, eval_len - x.shape[-1]))
                rows.append(x[:eval_len].astype(np.float32))
                if len(rows) >= args.eval_files:
                    break
        eval_x = jnp.asarray(np.stack(rows))

        @jax.jit
        def autoencode(params, x):
            return codec.apply(params, x, args.eval_nq)["audio"]

        os.makedirs(args.ckpt_dir, exist_ok=True)
        eval_log = open(os.path.join(args.ckpt_dir, "codec_eval.jsonl"), "a")

        # best-raw-SI-SDR keeper: the v3 campaign's 4-6k-step peak
        # checkpoints were rotated out of last/ before anyone could archive
        # them (CAMPAIGN.md r4 §2); this pins the best eval point in its own
        # single-slot manager, loadable via load_codec(ckpt_dir + "/best").
        best_mgr = CheckpointManager(
            os.path.join(args.ckpt_dir, "best"), last_every_n_steps=0,
            snapshot_every_n_steps=0,
            config={
                "codec": cfg.__dict__,
                "optimizer": {"lr": args.lr, "grad_clip": args.grad_clip or None,
                              "lr2": args.lr2, "switch_step": args.lr_switch},
                "loss_weights": weights.as_dict(),
            },
        )
        # seed the keeper from eval history: the run auto-resumes from last/
        # (and the chains retry on timeout), so a fresh -1e9 would let the
        # first post-resume eval overwrite best/ with a post-peak checkpoint
        # — the exact rotation-loss scenario the keeper exists to prevent.
        # codec_eval.jsonl is opened in append mode, so history survives.
        best_seed = -1e9
        hist_path = os.path.join(args.ckpt_dir, "codec_eval.jsonl")
        if os.path.exists(hist_path):
            import json as _json
            with open(hist_path) as fh:
                for line in fh:
                    try:
                        best_seed = max(
                            best_seed, _json.loads(line).get("si_sdr_raw", -1e9))
                    except ValueError:
                        continue
            if best_seed > -1e9:
                log.info(f"best-keeper seeded from history: {best_seed:.2f} dB")
        best_sisdr = [best_seed]

        last_eval = [-1]

        def run_eval(step):
            if step == last_eval[0]:
                return
            last_eval[0] = step
            # evaluate BOTH trees: weight-EMA is destructive for this
            # nonlinear decoder (snake activations + live VQ codebooks — the
            # averaged weights decode near-silence; measured r4: EMA
            # LogSpecMSE 666 vs raw 159 at the same step), so raw params are
            # the product codec; EMA is kept for trajectory smoothing only
            clean = np.asarray(eval_x)
            row = {"step": step}
            for tag, params in (("ema", state.ema_params), ("raw", state.params)):
                recon = np.asarray(autoencode(params, eval_x))
                sisdr = float(np.mean(
                    [m_sisdr(r, c, r)[0] for r, c in zip(recon, clean)]))
                lsm = float(np.mean([m_lsm(r, c) for r, c in zip(recon, clean)]))
                row[f"si_sdr_{tag}"] = sisdr
                row[f"logspec_mse_{tag}"] = lsm
                log.info(f"eval step {step} (nq={args.eval_nq}, {tag}): "
                         f"SI-SDR {sisdr:.2f} dB, LogSpecMSE {lsm:.1f}")
            import json
            eval_log.write(json.dumps(row) + "\n")
            eval_log.flush()
            if row["si_sdr_raw"] > best_sisdr[0]:
                best_sisdr[0] = row["si_sdr_raw"]
                best_mgr.maybe_save(state, force=True)
                log.info(f"new best raw SI-SDR {row['si_sdr_raw']:.2f} dB "
                         f"at step {step} → {args.ckpt_dir}/best")

    key = jax.random.PRNGKey(args.seed + 1)
    step = int(state.step)
    t_last = time.perf_counter()
    epoch = 0
    while step < args.steps:
        for x, _y, _names in loader.epoch(epoch):
            if step >= args.steps:
                break
            x = x[:, :crop]
            if x.shape[-1] < crop:
                x = np.pad(x, ((0, 0), (0, crop - x.shape[-1])))
            batch = jnp.asarray(x)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, step))
            step += 1
            if step % args.log_every == 0:
                now = time.perf_counter()
                sps = args.log_every / (now - t_last)
                t_last = now
                log.info(
                    f"step {step}: total={float(metrics['loss/total']):.3f} "
                    f"mel={float(metrics['loss/mel']):.3f} "
                    f"stft={float(metrics['loss/stft']):.3f} "
                    f"cstft={float(metrics['loss/complex_stft']):.3f} "
                    f"wav={float(metrics['loss/waveform']):.3f} "
                    f"({sps:.2f} steps/s)"
                )
            if eval_x is not None and step % args.eval_every == 0:
                run_eval(step)
            ckpt.maybe_save(state)
        epoch += 1
    if eval_x is not None:
        run_eval(step)
    ckpt.maybe_save(state, force=True)
    ckpt.wait()
    if args.valid_pairs:
        best_mgr.wait()  # finalize any in-flight async save of best/
    log.info(f"done at step {step}; checkpoints in {args.ckpt_dir}")


if __name__ == "__main__":
    main()
