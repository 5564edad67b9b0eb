"""Training infrastructure: config, state, steps, trainer, checkpoints (L6/L8)."""

from flowdec_tpu.train.builders import (
    build_backbone,
    build_flow_model,
    build_regression_model,
    build_score_model,
)
from flowdec_tpu.train.checkpoints import CheckpointManager, load_model
from flowdec_tpu.train.config import apply_overrides, instantiate, load_config
from flowdec_tpu.train.logging import JsonlLogger, TensorBoardLogger, WandbLogger, make_logger
from flowdec_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    masked_optimizer,
    trainable_mask,
)
from flowdec_tpu.train.steps import build_train_step, make_eval_step, make_train_step
from flowdec_tpu.train.trainer import Trainer, bucket_length, enhance_bucketed

__all__ = [
    "build_backbone",
    "build_flow_model",
    "build_regression_model",
    "build_score_model",
    "CheckpointManager",
    "load_model",
    "apply_overrides",
    "instantiate",
    "load_config",
    "JsonlLogger",
    "TensorBoardLogger",
    "WandbLogger",
    "make_logger",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "masked_optimizer",
    "trainable_mask",
    "build_train_step",
    "make_eval_step",
    "make_train_step",
    "Trainer",
    "bucket_length",
    "enhance_bucketed",
]
