#!/usr/bin/env python
"""Training CLI.

Usage (parity with the reference's `python train.py --config-name flowdec_75m`):

    python train.py --config-name flowdec_75m \
        datamodule.train_x=... datamodule.valid_x=... [key.path=value ...]

Capability parity with /root/reference/train.py: Hydra-style composed configs
with dotted overrides, run-ID management (resume keeps the run, finetune
forces a new one), rank-0-gated logger, auto-resume from the newest
checkpoint, EMA-aware dual-cadence checkpointing, max-steps training.
SLURM-specific plumbing is replaced by generic preemption-safe resume: rerun
the same command and training continues from the last checkpoint.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", required=True, help="configs/<name>.yaml")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument(
        "overrides", nargs="*", help="dotted config overrides like model.lr=2e-4"
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--resume-from-checkpoint", default=None)
    parser.add_argument(
        "--finetune", action="store_true",
        help="load weights from --resume-from-checkpoint but start a new run",
    )
    parser.add_argument(
        "--optimized-metric", default=None,
        help="run a final validation and print/return this metric "
             "(the reference's Optuna-sweep return value, train.py:117-122)",
    )
    args = parser.parse_args(argv)

    from flowdec_tpu.parallel import initialize_distributed, is_primary_host
    from flowdec_tpu.train.checkpoints import CheckpointManager
    from flowdec_tpu.train.config import instantiate, load_config
    from flowdec_tpu.train.logging import make_logger
    from flowdec_tpu.train.trainer import Trainer
    from flowdec_tpu.utils.logging import get_logger

    initialize_distributed()
    cfg = load_config(args.config_name, args.overrides, config_dir=args.config_dir)

    logger_obj = get_logger()
    logger_obj.setLevel(getattr(logging, str(cfg.get("loglevel", "info")).upper()))

    run_id = args.run_id or cfg.get("run_id") or time.strftime("%Y%m%d-%H%M%S")
    ckpt_dir = os.path.join(cfg["dirs"]["checkpoint_dir"], run_id)

    # objects
    model = instantiate(cfg["model"])
    datamodule = instantiate(cfg["datamodule"])
    opt_factory = instantiate(cfg["optimizer"])  # partial over learning_rate
    optimizer = opt_factory(
        learning_rate=float(cfg["model"].get("lr", 1e-4)),
        grad_clip_norm=cfg.get("trainer_options", {}).get("grad_clip_norm"),
    )

    callbacks_cfg = cfg.get("callbacks", {})
    ckpt = CheckpointManager(
        ckpt_dir,
        last_every_n_steps=callbacks_cfg.get("last_every_n_steps", 1000),
        snapshot_every_n_steps=callbacks_cfg.get("snapshot_every_n_steps", 50000),
        keep_snapshots=callbacks_cfg.get("keep_snapshots"),
        config=cfg,
    )

    run_logger = None
    if is_primary_host():
        logger_factory = instantiate(cfg.get("logger", {}))
        if callable(logger_factory):
            run_logger = logger_factory(
                save_dir=cfg["dirs"]["logger_save_dir"], run_id=run_id
            )
            run_logger.log_config(cfg)

    topts = cfg.get("trainer_options", {})
    crop_frames_len = int(
        cfg["datamodule"].get("target_duration", 2) * cfg["sampling_rate"]
    )
    stft_cfg = model.feature_extractor.complex_stft.stft_config
    from flowdec_tpu.ops.padding import padded_num_frames

    crop_frames = padded_num_frames(stft_cfg.num_frames(crop_frames_len), 64)

    mesh_opt = topts.get("mesh", "auto")  # "auto" = DP over all local devices
    trainer = Trainer(
        model,
        datamodule,
        optimizer,
        mesh=mesh_opt,
        max_steps=int(topts.get("max_steps", 1_000_000)),
        log_every_n_steps=int(topts.get("log_every_n_steps", 10)),
        val_every_n_steps=int(topts.get("val_every_n_steps", 5000)),
        num_sanity_val_steps=int(topts.get("num_sanity_val_steps", 1)),
        ema_decay=float(topts.get("ema_decay", 0.999)),
        eval_variants=cfg["model"].get("eval_variants"),
        eval_metrics=instantiate(cfg["model"].get("eval_metrics", [])),
        num_eval_files=int(cfg["model"].get("num_eval_files", 20)),
        evaluation_seed=cfg["model"].get("evaluation_seed"),
        logger=run_logger,
        checkpoint_manager=ckpt,
        crop_frames=crop_frames,
        aux_losses=instantiate(cfg.get("aux_losses", [])) or None,
        aux_weight=float(cfg.get("aux_loss_weight", 1.0)),
        hang_timeout=float(topts.get("hang_timeout", 900.0)),
    )

    init_params = None
    if args.finetune and args.resume_from_checkpoint:
        # load weights but start a fresh run/optimizer (reference train.py:54-57)
        from flowdec_tpu.train.checkpoints import load_model

        _, init_params, _ = load_model(args.resume_from_checkpoint, ema=False)

    state = trainer.fit(
        resume=not cfg.get("force_new_run", False) and not args.finetune,
        init_params=init_params,
    )

    result = None
    if args.optimized_metric:
        final = trainer.validate(state, step=int(state.step))
        result = final.get(args.optimized_metric)
        print(f"optimized_metric {args.optimized_metric}={result}")

    if run_logger is not None:
        run_logger.finish()
    return result


if __name__ == "__main__":
    main()
