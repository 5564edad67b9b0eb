#!/usr/bin/env python
"""ReFlow distillation CLI: straighten a trained FlowDec for few-NFE serving.

Loads a trained FlowModel checkpoint, freezes its EMA weights as the
teacher, and retrains the student on straight (z0 → teacher-solution)
bridges generated on the fly from CODED audio only (no clean targets
needed). After reflow, `enhance --N 1 --solver euler` approaches the
teacher's N=3 midpoint quality at 1/6 the NFE — the only lever past the
kernel-work RTF ceiling (PERF.md batch-8 analysis).

Usage:
    python scripts/distill.py --ckpt ckpts/flowdec75m --out-ckpt ckpts/flowdec75m_reflow \
        --pairs-file pairs.txt --steps 50000 [--teacher-N 3 --teacher-solver midpoint]
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
    parser.add_argument("--ckpt", required=True, help="teacher checkpoint dir")
    parser.add_argument("--out-ckpt", required=True, help="student checkpoint dir")
    parser.add_argument("--pairs-file", required=True,
                        help="clean,coded filelist; only the coded side is used")
    parser.add_argument("--steps", type=int, default=50000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--crop-seconds", type=float, default=2.0)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--teacher-N", type=int, default=3)
    parser.add_argument("--teacher-solver", default="midpoint")
    parser.add_argument("--sigma-fac", type=float, default=1.0)
    parser.add_argument("--ema-decay", type=float, default=0.999,
                        help="student EMA decay; lower it for short runs or "
                             "the saved EMA stays ~the teacher")
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--ckpt-every", type=int, default=5000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hang-timeout", type=float, default=900.0,
                        help="exit(113) with a stack dump if no step "
                             "completes for this many seconds (0=off); see "
                             "train/watchdog.py")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flowdec_tpu.data.dataset import BatchLoader, PairedAudioFiles
    from flowdec_tpu.flow.distill import make_distill_step
    from flowdec_tpu.parallel import make_mesh, shard_batch
    from flowdec_tpu.train.checkpoints import CheckpointManager, load_model
    from flowdec_tpu.train.state import create_train_state, make_optimizer
    from flowdec_tpu.utils.logging import log

    model, teacher_params, cfg = load_model(args.ckpt, ema=True)
    sr = model.sampling_rate
    log.info(f"Teacher loaded from {args.ckpt} (EMA weights); sr={sr}")

    dataset = PairedAudioFiles(
        args.pairs_file, sr, args.crop_seconds, random_crop=True,
        mode="paired_filelist",
    )
    loader = BatchLoader(
        dataset, args.batch_size, shuffle=True, seed=args.seed,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
    )

    optimizer = make_optimizer(learning_rate=args.lr)
    # student starts from the teacher's weights (standard reflow init).
    # COPY each tree: the jitted step donates the state, and donated buffers
    # must not alias each other (params vs ema) or the teacher args.
    state = create_train_state(model, jax.random.PRNGKey(args.seed), optimizer, frames=64)
    state = state.replace(
        params=jax.tree.map(lambda x: x.copy(), teacher_params),
        ema_params=jax.tree.map(lambda x: x.copy(), teacher_params),
    )

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    step_fn = make_distill_step(
        model, optimizer, teacher_n_steps=args.teacher_N,
        teacher_solver=args.teacher_solver, sigma_fac=args.sigma_fac,
        ema_decay=args.ema_decay, mesh=mesh,
    )

    ckpt = CheckpointManager(
        args.out_ckpt, last_every_n_steps=args.ckpt_every,
        snapshot_every_n_steps=10 * args.ckpt_every, config=cfg,
    )
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info(f"Resumed student at step {int(state.step)}")

    key = jax.random.PRNGKey(args.seed + 1)
    step = int(state.step)
    t_last = time.perf_counter()
    epoch = 0
    from flowdec_tpu.train.watchdog import HangWatchdog

    watchdog = (HangWatchdog(timeout=args.hang_timeout).start()
                if args.hang_timeout > 0 else None)
    while step < args.steps:
        for _x, y, _names in loader.epoch(epoch):
            if step >= args.steps:
                break
            batch = jnp.asarray(y)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(
                state, teacher_params, batch, jax.random.fold_in(key, step)
            )
            step += 1
            if watchdog is not None:  # see trainer.py: beat every step
                watchdog.beat()
            if step % args.log_every == 0:
                now = time.perf_counter()
                sps = args.log_every / (now - t_last)
                t_last = now
                log.info(
                    f"step {step}: distill_loss={float(metrics['distill_loss']):.5f} "
                    f"grad_norm={float(metrics['grad_norm']):.3f} ({sps:.2f} steps/s)"
                )
            ckpt.maybe_save(state)
        epoch += 1
    if watchdog is not None:
        watchdog.stop()

    ckpt.maybe_save(state, force=True)
    ckpt.close()
    log.info(f"Student checkpoint at {args.out_ckpt}; serve with enhance.py --N 1 --solver euler")


if __name__ == "__main__":
    main()
