"""Flax NN modules: NCSN++ backbone and its layers (L1/L2 of the layer map)."""

from flowdec_tpu.nn.layers import (
    NIN,
    Conv1x1,
    Conv3x3,
    GaussianFourierProjection,
    default_init,
    get_act,
    group_norm,
    positional_time_embedding,
)
from flowdec_tpu.nn.blocks import (
    AttnBlock,
    Combine,
    Downsample,
    ResnetBlockBigGAN,
    ResnetBlockDDPM,
    Upsample,
)
from flowdec_tpu.nn.ncsnpp import (
    FLOWDEC_FINAL_NO_ATTN,
    SGMSE_DEFAULT_YCOND,
    NCSNpp,
    NCSNppConfig,
)

__all__ = [
    "NIN",
    "Conv1x1",
    "Conv3x3",
    "GaussianFourierProjection",
    "default_init",
    "get_act",
    "group_norm",
    "positional_time_embedding",
    "AttnBlock",
    "Combine",
    "Downsample",
    "ResnetBlockBigGAN",
    "ResnetBlockDDPM",
    "Upsample",
    "FLOWDEC_FINAL_NO_ATTN",
    "SGMSE_DEFAULT_YCOND",
    "NCSNpp",
    "NCSNppConfig",
]
