"""Fused bias + (leaky) activation.

Capability parity with the reference's fused_bias_act CUDA op
(/root/reference/flowdec/backbones/ncsnpp_utils/op/fused_act.py and
fused_bias_act_kernel.cu) — which is dead code there (exported but never
referenced by the backbone, SURVEY.md §2.4). On TPU this is a single VPU
fusion XLA performs automatically; provided for StyleGAN2-style discriminator
additions.
"""

from __future__ import annotations

import math
from typing import Optional

import jax

__all__ = ["fused_leaky_relu"]


def fused_leaky_relu(
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jax.Array:
    """leaky_relu(x + bias) * scale — XLA fuses this into one elementwise pass.

    bias broadcasts over the channel (last) axis in NHWC.
    """
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope=negative_slope) * scale
