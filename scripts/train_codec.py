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
    parser.add_argument("--grad-clip", type=float, default=1.0,
                        help="global grad-norm clip (the RVQ terms explode "
                             "unclipped at init); pass 0 to disable")
    parser.add_argument("--sr", type=int, default=48000)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--ckpt-every", type=int, default=5000)
    parser.add_argument("--seed", type=int, default=0)
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

    cfg = NDACConfig(sampling_rate=args.sr)
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
    optimizer = codec_optimizer(args.lr, grad_clip=args.grad_clip or None)
    state = create_codec_train_state(
        codec, jax.random.PRNGKey(args.seed), optimizer, length=crop
    )
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    step_fn = make_codec_train_step(
        codec, optimizer, weights=CodecLossWeights(), mesh=mesh
    )
    ckpt = CheckpointManager(
        args.ckpt_dir, last_every_n_steps=args.ckpt_every,
        snapshot_every_n_steps=10 * args.ckpt_every,
        config={"codec": cfg.__dict__},
    )
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)

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
                    f"({sps:.2f} steps/s)"
                )
            ckpt.maybe_save(state)
        epoch += 1
    ckpt.maybe_save(state, force=True)
    ckpt.wait()
    log.info(f"done at step {step}; checkpoints in {args.ckpt_dir}")


if __name__ == "__main__":
    main()
