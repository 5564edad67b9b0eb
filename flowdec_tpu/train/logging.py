"""Metric/experiment loggers.

Capability parity with the reference's logging stack (SURVEY.md §5):
W&B/TensorBoard with rank-0 gating, config upload, and audio tables
(train.py:189-238, model.py:261-304). This framework's default sink is a
JSONL file (machine-parsable, dependency-free) + stdout; TensorBoard and W&B
attach when their packages exist. Audio "tables" are written as WAV files
under the run directory — inspectable without any logging service.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List

import numpy as np

from flowdec_tpu.data.wavio import write_wav
from flowdec_tpu.utils.logging import log

__all__ = ["JsonlLogger", "TensorBoardLogger", "WandbLogger", "make_logger"]


class JsonlLogger:
    """Append-only metrics.jsonl + resolved-config snapshot + audio dumps."""

    def __init__(self, save_dir: str, run_id: str):
        self.run_dir = os.path.join(save_dir, run_id)
        os.makedirs(self.run_dir, exist_ok=True)
        self.metrics_path = os.path.join(self.run_dir, "metrics.jsonl")
        self._fh = open(self.metrics_path, "a")

    def log_config(self, cfg: Dict[str, Any]) -> None:
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def log_audios(
        self, key: str, audios: List[Dict[str, Any]], sample_rate: int, step: int
    ) -> None:
        """Audio table equivalent: <run>/audios/<key>/step<N>/<name>_<col>.wav
        (reference logs (name, x_hat, x, y) rows to W&B, model.py:288-304)."""
        out_dir = os.path.join(self.run_dir, "audios", key, f"step{step}")
        os.makedirs(out_dir, exist_ok=True)
        for row in audios:
            base = os.path.splitext(str(row.get("name", "audio")))[0]
            for col in ("x_hat", "x", "y"):
                if col in row and row[col] is not None:
                    wav = np.asarray(row[col]).squeeze()
                    write_wav(os.path.join(out_dir, f"{base}_{col}.wav"), wav, sample_rate)

    def finish(self) -> None:
        self._fh.close()


class TensorBoardLogger(JsonlLogger):
    """JSONL + TensorBoard event files (requires a TB writer package)."""

    def __init__(self, save_dir: str, run_id: str):
        super().__init__(save_dir, run_id)
        try:
            from torch.utils.tensorboard import SummaryWriter  # gated

            self._tb = SummaryWriter(log_dir=os.path.join(self.run_dir, "tb"))
        except Exception:
            log.warning("TensorBoard writer unavailable; falling back to JSONL only")
            self._tb = None

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        super().log_metrics(metrics, step)
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), int(step))
                except (TypeError, ValueError):
                    pass

    def finish(self) -> None:
        if self._tb is not None:
            self._tb.close()
        super().finish()


class WandbLogger(JsonlLogger):
    """JSONL + Weights & Biases (requires the wandb package + login)."""

    def __init__(
        self,
        save_dir: str,
        run_id: str,
        project: str = "flowdec_tpu",
        log_code: bool = True,
    ):
        super().__init__(save_dir, run_id)
        import wandb  # gated

        self._wandb = wandb
        self._run = wandb.init(project=project, id=run_id, resume="allow", dir=self.run_dir)
        if log_code:
            # snapshot the framework source with the run (capability parity
            # with the reference's wandb code logging, train.py:219-225)
            import flowdec_tpu

            root = os.path.dirname(os.path.abspath(flowdec_tpu.__file__))
            try:
                self._run.log_code(
                    root=root, include_fn=lambda p: p.endswith((".py", ".yaml"))
                )
            except Exception:  # offline mode / old wandb: non-fatal
                pass

    def log_config(self, cfg: Dict[str, Any]) -> None:
        super().log_config(cfg)
        self._run.config.update(cfg, allow_val_change=True)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        super().log_metrics(metrics, step)
        self._wandb.log(metrics, step=int(step))

    def log_audios(self, key, audios, sample_rate, step) -> None:
        super().log_audios(key, audios, sample_rate, step)
        columns = ["name", "x_hat", "x", "y"]
        data = [
            [row["name"]]
            + [
                self._wandb.Audio(np.asarray(row[c]).squeeze(), sample_rate=sample_rate)
                for c in columns[1:]
            ]
            for row in audios
        ]
        self._run.log({key: self._wandb.Table(columns=columns, data=data)}, step=step)

    def finish(self) -> None:
        self._run.finish()
        super().finish()


def make_logger(kind: str, save_dir: str, run_id: str, **kwargs):
    return {"jsonl": JsonlLogger, "tensorboard": TensorBoardLogger, "wandb": WandbLogger}[
        kind
    ](save_dir, run_id, **kwargs)
