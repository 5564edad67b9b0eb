"""NDAC codec (DAC-style residual-VQ audio codec) in JAX."""

from flowdec_tpu.codec.ndac import NDAC, NDACConfig, ResidualVectorQuantizer, snake
from flowdec_tpu.codec.training import (
    CodecLossWeights,
    codec_optimizer,
    create_codec_train_state,
    load_codec,
    make_codec_train_step,
)

__all__ = [
    "NDAC",
    "NDACConfig",
    "ResidualVectorQuantizer",
    "snake",
    "CodecLossWeights",
    "codec_optimizer",
    "create_codec_train_state",
    "load_codec",
    "make_codec_train_step",
]
