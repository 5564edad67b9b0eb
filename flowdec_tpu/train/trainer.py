"""Training orchestration: the Lightning-Trainer-equivalent loop.

Capability parity with the reference's training stack (SURVEY.md §3.1):
step-driven loop with jitted fused train step (grad + Adam + EMA), periodic
validation (loss on EMA weights + per-variant enhancement evaluation on
uncropped files with metric logging and audio dumps), dual-cadence
checkpointing with preemption-safe auto-resume, sanity validation step, and
a hard stop on an all-NaN batch (reference model.py:462-464).

Fixed vs the reference: eval-variant gating reads `every_n_steps` from the
correct key (the reference reads it from `every_n_epochs` — copy-paste bug,
model.py:236).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.eval.metrics import get_metrics_row
from flowdec_tpu.ops.padding import padded_num_frames
from flowdec_tpu.parallel.mesh import is_primary_host, make_mesh, shard_batch
from flowdec_tpu.train.checkpoints import CheckpointManager
from flowdec_tpu.train.state import TrainState, create_train_state
from flowdec_tpu.train.steps import make_eval_step, make_train_step
from flowdec_tpu.utils.logging import log

__all__ = ["Trainer", "bucket_length", "enhance_bucketed"]


def bucket_length(model, length: int) -> int:
    """Smallest padded waveform length >= `length` that maps to a whole
    64-frame-multiple spectrogram — bounds the number of jit-compiled shapes
    during variable-length evaluation."""
    stft_cfg = model.feature_extractor.complex_stft.stft_config
    hop = stft_cfg.hop
    frames = stft_cfg.num_frames(length)
    frames64 = padded_num_frames(frames, 64)
    # length that produces exactly frames64 frames: 1 + L//hop == frames64
    return (frames64 - 1) * hop


import functools


@functools.lru_cache(maxsize=32)
def _jitted_enhance(kwargs_items):
    """One jitted enhance per static-kwarg combination; jax.jit's own cache
    handles (model config, shapes). Without this, model.enhance dispatches
    op-by-op (the model method itself is not jitted)."""
    kwargs = dict(kwargs_items)

    @jax.jit
    def fn(model, params, key, y):
        return model.enhance(params, key, y, **kwargs)

    return fn


def enhance_bucketed(model, params, key, y: np.ndarray, *,
                     batch_pad_to: int = None, split_max: int = None,
                     **enhance_kwargs):
    """Enhance a variable-length waveform via shape bucketing: zero-pad the
    tail to the bucket length (few distinct compiled shapes), crop the
    output back. Runs through a cached jitted enhance.

    Small-batch trough guard (measured, PERF.md batch-scaling curve):
    aggregate RTF on TPU is NON-monotonic in batch — batches 2-7 fall BELOW
    single-stream throughput (5.7x vs 9.0x at NFE 6) because XLA/Mosaic
    picks a bad strategy for intermediate shapes and only flips to the good
    one at 8, so intermediate batches are never submitted as-is. From the
    measured curve (batch-1 chunk 0.558 s, batch-8 call 2.80 s), k
    SEQUENTIAL batch-1 calls beat one zero-row-padded batch-8 call for
    k <= 5 (0.558·k < 2.80) on both throughput and last-stream latency, so:
    batches 2..split_max run as sequential single-stream calls (per-row
    fold_in keys), batches split_max+1..7 are zero-row-padded to 8 (silent
    rows cropped away). Override batch_pad_to=0 to disable both (e.g. on
    CPU, where the trough doesn't exist — that is the non-TPU default)."""
    y = np.asarray(y, np.float32)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    length = y.shape[-1]
    target = bucket_length(model, length)
    y_pad = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, max(0, target - length))])
    if batch_pad_to is None:
        batch_pad_to = 8 if jax.default_backend() == "tpu" else 0
    if split_max is None:
        split_max = 5 if batch_pad_to else 0
    batch = y_pad.shape[0]
    fn = _jitted_enhance(tuple(sorted(enhance_kwargs.items())))
    if 1 < batch <= split_max and batch < batch_pad_to:
        rows = [
            fn(model, params, jax.random.fold_in(key, i), jnp.asarray(y_pad[i:i + 1]))
            for i in range(batch)
        ]
        x_hat = np.concatenate([np.asarray(r) for r in rows], axis=0)
        x_hat = x_hat[..., :length]
        return x_hat[0] if squeeze else x_hat
    pad_rows = batch_pad_to - batch if 1 < batch < batch_pad_to else 0
    if pad_rows:
        y_pad = np.pad(y_pad, [(0, pad_rows)] + [(0, 0)] * (y_pad.ndim - 1))
    x_hat = fn(model, params, key, jnp.asarray(y_pad))
    x_hat = np.asarray(x_hat)[:batch, ..., :length]
    return x_hat[0] if squeeze else x_hat


class Trainer:
    def __init__(
        self,
        model,
        datamodule,
        optimizer,
        *,
        max_steps: int = 1_000_000,
        log_every_n_steps: int = 10,
        val_every_n_steps: int = 5000,
        num_sanity_val_steps: int = 1,
        ema_decay: float = 0.999,
        eval_variants: Optional[List[Dict[str, Any]]] = None,
        eval_metrics: Optional[List] = None,
        num_eval_files: int = 20,
        evaluation_seed: Optional[int] = 0,
        logger=None,
        checkpoint_manager: Optional[CheckpointManager] = None,
        mesh: Optional[object] = "auto",
        seed: int = 0,
        crop_frames: int = 256,
        aux_losses: Optional[List] = None,
        aux_weight: float = 1.0,
        hang_timeout: float = 0.0,
    ):
        self.model = model
        self.datamodule = datamodule
        self.optimizer = optimizer
        self.max_steps = max_steps
        self.log_every = log_every_n_steps
        self.val_every = val_every_n_steps
        self.num_sanity_val_steps = num_sanity_val_steps
        self.eval_variants = eval_variants or [
            {"name": None, "enhance_kwargs": {}, "every_n_epochs": 1}
        ]
        for variant in self.eval_variants:
            assert not ("every_n_epochs" in variant and "every_n_steps" in variant), (
                "For eval_variants, pass either every_n_epochs or every_n_steps, "
                "but not both!"
            )
        self.eval_metrics = eval_metrics or []
        self.num_eval_files = num_eval_files
        self.evaluation_seed = evaluation_seed
        self.logger = logger
        self.ckpt = checkpoint_manager
        self.seed = seed
        self.crop_frames = crop_frames
        self.current_epoch = 0
        # hang_timeout > 0 arms a HangWatchdog over the train loop: stack
        # dump + exit(113) when a device call wedges (see train/watchdog.py
        # for the observed failure mode this answers). 0 = disabled.
        self.hang_timeout = float(hang_timeout)

        if mesh == "auto":
            mesh = make_mesh()
        self.mesh = mesh  # None = single-device (no explicit sharding)
        # aux_losses switches to the finetuning objective (CFM + waveform-
        # domain losses on one-step reconstructions, speech-gated)
        self.aux_losses = list(aux_losses or [])
        if self.aux_losses:
            from flowdec_tpu.train.steps import make_finetune_step

            self.train_step = make_finetune_step(
                model, optimizer, self.aux_losses, aux_weight=aux_weight,
                ema_decay=ema_decay, mesh=mesh,
            )
        else:
            self.train_step = make_train_step(
                model, optimizer, ema_decay=ema_decay, mesh=mesh
            )
        self.eval_step = make_eval_step(model, ema=True, mesh=mesh)

    # --- helpers ---

    def _place(self, batch):
        return shard_batch(batch, self.mesh) if self.mesh is not None else batch

    def _materialize_metrics(self):
        """eval_metrics config entries may be factories (partials) — build."""
        out = []
        for m in self.eval_metrics:
            if isinstance(m, dict):  # {metric: factory, namefilter: str}
                metric = m["metric"]
                out.append((metric() if callable(metric) else metric, m.get("namefilter")))
            else:
                out.append(m() if callable(metric := m) else m)
        return out

    def _log(self, metrics: Dict[str, Any], step: int) -> None:
        if self.logger is not None and is_primary_host():
            self.logger.log_metrics(metrics, step)

    # --- validation ---

    def validate(self, state: TrainState, step: int, max_batches: int = 10) -> Dict[str, float]:
        key = jax.random.PRNGKey(self.seed + 1)
        losses = []
        loader = self.datamodule.valid_loader(
            shard_index=jax.process_index(), num_shards=jax.process_count()
        )
        for bi, (x, y, _names) in enumerate(loader.epoch(0)):
            if bi >= max_batches:
                break
            batch = self._place((jnp.asarray(x), jnp.asarray(y)))
            m = self.eval_step(state, batch, jax.random.fold_in(key, bi))
            losses.append(float(m["valid_loss"]))
        result = {"valid_loss": float(np.mean(losses))} if losses else {}

        # Per-variant enhancement evaluation on uncropped files
        if self.num_eval_files and self.eval_metrics:
            eval_audios = self.datamodule.get_evaluation_samples(
                "valid", self.num_eval_files, seed=self.evaluation_seed
            )
            metrics = self._materialize_metrics()
            for variant in self.eval_variants:
                name = variant.get("name")
                every_n_epochs = variant.get("every_n_epochs", 1)
                every_n_steps = variant.get("every_n_steps", 0)
                if every_n_steps > 0:
                    if step % every_n_steps != 0:
                        continue
                elif every_n_epochs > 0 and self.current_epoch % every_n_epochs != 0:
                    continue

                suffix = f"_{name}" if name else ""
                log.info(f"Running eval variant {name}...")
                rows, audios = [], []
                params = state.eval_params(ema=True)
                for i, (x, y, basename) in enumerate(eval_audios):
                    x_hat = enhance_bucketed(
                        self.model, params,
                        jax.random.fold_in(jax.random.PRNGKey(self.seed + 2), i),
                        y, **variant.get("enhance_kwargs", {}),
                    )
                    if np.asarray(x).squeeze().shape == np.asarray(y).squeeze().shape:
                        rows.append(get_metrics_row(metrics, basename, x_hat, x, y))
                    audios.append(dict(name=basename, x_hat=x_hat, x=x, y=y))

                for metric_key in {k for row in rows for k in row} - {"name"}:
                    vals = np.asarray(
                        [row.get(metric_key, np.nan) for row in rows], dtype=np.float64
                    )
                    if np.any(np.isnan(vals)):
                        log.warning(
                            f"NaN during eval in metric {metric_key} for "
                            f"{int(np.sum(np.isnan(vals)))} of {len(vals)} values!"
                        )
                    result[f"{metric_key}{suffix}"] = float(np.nanmean(vals))
                if self.logger is not None and is_primary_host():
                    self.logger.log_audios(
                        f"audios{suffix}", audios, self.model.sampling_rate, step
                    )
        return result

    # --- main loop ---

    def fit(self, resume: bool = True, init_params=None) -> TrainState:
        """Run training to max_steps.

        resume: restore the newest checkpoint if one exists (preemption-safe).
        init_params: warm-start weights (finetune mode — fresh optimizer/EMA,
            reference train.py:54-57); ignored when resuming.
        """
        state = create_train_state(
            self.model, jax.random.PRNGKey(self.seed), self.optimizer,
            frames=self.crop_frames,
        )
        resumed = False
        if resume and self.ckpt is not None and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            resumed = True
        if init_params is not None and not resumed:
            state = state.replace(
                params=init_params,
                ema_params=jax.tree.map(jnp.copy, init_params),
            )

        key = jax.random.PRNGKey(self.seed + 100)
        step = int(state.step)

        # Architecture/size visibility at startup (reference train.py:79
        # prints torchinfo.summary); one log line per top-level module.
        from flowdec_tpu.utils.summary import model_summary

        log.info(model_summary(state.params, title=type(self.model).__name__))

        # Sanity validation (num_sanity_val_steps: 1, global_defaults.yaml:34)
        if self.num_sanity_val_steps > 0 and step == 0:
            log.info("Running sanity validation step...")
            self.datamodule.setup("fit")
            sanity = self.validate(state, step=0, max_batches=self.num_sanity_val_steps)
            log.info(f"Sanity validation: {sanity}")
        else:
            self.datamodule.setup("fit")

        loader = self.datamodule.train_loader(
            shard_index=jax.process_index(), num_shards=jax.process_count()
        )

        # Preemption safety (the reference's SLURM auto-requeue capability,
        # train.py:155-186, TPU-native): on SIGTERM/SIGINT finish the current
        # step, checkpoint, and exit cleanly; rerunning resumes.
        import signal

        preempted = {"flag": False}

        def _on_signal(signum, frame):
            log.warning(f"Received signal {signum}: checkpointing and stopping...")
            preempted["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not in main thread
                pass

        # Failure detection (watchdog.py): a wedged device call must turn
        # into a nonzero exit the supervisor can requeue, not a silent stall.
        from flowdec_tpu.train.watchdog import HangWatchdog

        watchdog = (
            HangWatchdog(timeout=self.hang_timeout).start()
            if self.hang_timeout > 0 else None
        )

        t_last = time.perf_counter()
        try:
            state = self._fit_loop(
                state, loader, key, step, preempted, watchdog, t_last
            )
        finally:
            # An exception escaping the loop must not leave the armed daemon
            # to os._exit(113) during teardown (masking the real traceback).
            if watchdog is not None:
                watchdog.stop()
        if self.ckpt is not None and is_primary_host():
            self.ckpt.maybe_save(state, force=True)
            self.ckpt.wait()
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        return state

    def _fit_loop(self, state, loader, key, step, preempted, watchdog, t_last):
        from contextlib import nullcontext

        from flowdec_tpu.eval.metrics import get_audiotype_from_basename

        # the FIRST dispatch blocks through the jit compile (10-20 min for a
        # fresh graph on the remote-compile runtime) with no heartbeat — a
        # known-long phase, not a hang; suspend the watchdog around it
        first_dispatch = True
        while step < self.max_steps and not preempted["flag"]:
            for x, y, names in loader.epoch(self.current_epoch):
                if step >= self.max_steps or preempted["flag"]:
                    break
                if self.aux_losses:
                    speech_mask = jnp.asarray(
                        [
                            1.0 if get_audiotype_from_basename(n) == "speech" else 0.0
                            for n in names
                        ],
                        dtype=jnp.float32,
                    )
                    batch = self._place((jnp.asarray(x), jnp.asarray(y), speech_mask))
                else:
                    batch = self._place((jnp.asarray(x), jnp.asarray(y)))
                with (watchdog.suspended()
                      if watchdog is not None and first_dispatch
                      else nullcontext()):
                    state, metrics = self.train_step(
                        state, batch, jax.random.fold_in(key, step)
                    )
                first_dispatch = False
                step += 1
                # Heartbeat every step: async dispatch returning means the
                # queue is draining — on a true hang the NEXT dispatch blocks
                # and beats stop within one step, while beating only at log
                # points would false-fire whenever log_every × step time
                # exceeds the timeout.
                if watchdog is not None:
                    watchdog.beat()

                if step % self.log_every == 0:
                    loss = float(metrics["train_loss"])
                    if np.isnan(loss):
                        raise ValueError(
                            f"Whole batch at step {step} led to NaN loss values! "
                            "Seems like training is broken :("
                        )
                    now = time.perf_counter()
                    sps = self.log_every / (now - t_last)
                    t_last = now
                    self._log(
                        {
                            "train_loss": loss,
                            "grad_norm": float(metrics["grad_norm"]),
                            "n_nan": int(metrics["n_nan"]),
                            "steps_per_sec": sps,
                            "epoch": self.current_epoch,
                        },
                        step,
                    )

                if self.val_every and step % self.val_every == 0:
                    # validation compiles/runs many distinct graphs — exempt
                    # it from the steady-state step timeout
                    with (watchdog.suspended() if watchdog is not None
                          else nullcontext()):
                        val_metrics = self.validate(state, step)
                    log.info(f"step {step}: {val_metrics}")
                    self._log(val_metrics, step)

                if self.ckpt is not None and is_primary_host():
                    # Checkpoint writes are a known-long phase (watchdog.py
                    # docstring); a slow remote write must not trip the
                    # steady-state step timeout mid-write.
                    with (watchdog.suspended() if watchdog is not None
                          else nullcontext()):
                        self.ckpt.maybe_save(state)
            self.current_epoch += 1
        return state
