"""NCSN++ building blocks (Flax/linen, NHWC).

Capability parity with /root/reference/flowdec/backbones/ncsnpp_utils/
layerspp.py: BigGAN/DDPM residual blocks, FIR up/downsampling layers,
input-pyramid Combine, and the NIN self-attention block.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.nn.layers import NIN, Conv1x1, Conv3x3, default_init, group_norm, group_norm_act
from flowdec_tpu.ops.upfirdn import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)

__all__ = [
    "Combine",
    "AttnBlock",
    "Upsample",
    "Downsample",
    "ResnetBlockBigGAN",
    "ResnetBlockDDPM",
]

Act = Callable[[jax.Array], jax.Array]


class Combine(nn.Module):
    """Input-pyramid combiner: 1×1-conv x then sum/concat with y
    (reference layerspp.py:54-69). FlowDec uses method='sum'."""

    features: int
    method: str = "sum"

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        h = Conv1x1(self.features, name="Conv_0")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        elif self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlock(nn.Module):
    """Full (H·W)² softmax self-attention via NIN projections
    (reference layerspp.py:72-101), expressed as two batched matmuls so XLA
    tiles it onto the MXU instead of materializing 5-D einsums."""

    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h_dim, w_dim, c = x.shape
        h = group_norm(c, dtype=x.dtype)(x).astype(x.dtype)
        q = NIN(c, name="NIN_0")(h).reshape(b, h_dim * w_dim, c)
        k = NIN(c, name="NIN_1")(h).reshape(b, h_dim * w_dim, c)
        v = NIN(c, name="NIN_2")(h).reshape(b, h_dim * w_dim, c)

        logits = jnp.einsum("bqc,bkc->bqk", q, k) * (int(c) ** -0.5)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, h_dim, w_dim, c)
        out = NIN(c, init_scale=self.init_scale, name="NIN_3")(out)
        if self.skip_rescale:
            return (x + out) * 0.7071067811865476
        return x + out


class Upsample(nn.Module):
    """2× upsampling, FIR-filtered or nearest, optional fused conv
    (reference layerspp.py:104-136)."""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = True
    fir_kernel: Sequence[float] = (1.0, 3.0, 3.0, 1.0)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.out_ch or x.shape[-1]
        if not self.fir:
            b, h, w, c = x.shape
            hid = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            if self.with_conv:
                hid = Conv3x3(out_ch, name="Conv_0")(hid)
            return hid
        if not self.with_conv:
            return upsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("weight", default_init(), (3, 3, x.shape[-1], out_ch))
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        return upsample_conv_2d(x, w, self.fir_kernel, factor=2) + b


class Downsample(nn.Module):
    """2× downsampling, FIR-filtered or avg-pool, optional fused conv
    (reference layerspp.py:139-173)."""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = True
    fir_kernel: Sequence[float] = (1.0, 3.0, 3.0, 1.0)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.out_ch or x.shape[-1]
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                return nn.Conv(
                    out_ch,
                    (3, 3),
                    strides=(2, 2),
                    padding="VALID",
                    kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    name="Conv_0",
                )(x)
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        if not self.with_conv:
            return downsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("weight", default_init(), (3, 3, x.shape[-1], out_ch))
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        return conv_downsample_2d(x, w, self.fir_kernel, factor=2) + b


class _TembDense(nn.Module):
    """Per-channel bias from the time embedding (Dense with DDPM init, zero bias)."""

    features: int

    @nn.compact
    def __call__(self, temb: jax.Array) -> jax.Array:
        return nn.Dense(
            self.features, kernel_init=default_init(), bias_init=nn.initializers.zeros
        )(temb)


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style residual block with optional fused FIR up/down resampling
    (reference layerspp.py:222-284)."""

    act: Act
    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    fir: bool = True
    fir_kernel: Sequence[float] = (1.0, 3.0, 3.0, 1.0)
    skip_rescale: bool = True
    init_scale: float = 0.0

    def _gn_conv(
        self,
        h: jax.Array,
        ch: int,
        *,
        gn_name: str,
        conv_name: str,
        init_scale: float = 1.0,
    ) -> jax.Array:
        """act(GN(h)) -> conv3x3. NOTE: a Pallas-fused GN+SiLU+conv lived
        here through round 1 and was DELETED after failing its entry gate —
        the in-kernel conv rate measured 76 TFLOP/s at batch 8 vs 143 for
        XLA's conv and 110 for the full XLA GN+SiLU+conv composition
        (PERF.md "megakernel gate"), so the fusion could never pay for its
        opaque-boundary cost. Keep compositions transparent to XLA."""
        hh = group_norm_act(h.shape[-1], self.act, name=gn_name)(h)
        return hh, Conv3x3(ch, init_scale=init_scale, name=conv_name)(hh)

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: jax.Array | None = None, train: bool = False
    ) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch

        if self.up or self.down:
            # resampling sits between act(GN) and the conv — not fusable
            h = group_norm_act(in_ch, self.act, name="GroupNorm_0")(x)
            if self.up:
                resize = (
                    (lambda a: upsample_2d(a, self.fir_kernel, factor=2))
                    if self.fir
                    else naive_upsample_2d
                )
            else:
                resize = (
                    (lambda a: downsample_2d(a, self.fir_kernel, factor=2))
                    if self.fir
                    else naive_downsample_2d
                )
            h, x = resize(h), resize(x)
            h = Conv3x3(out_ch, name="Conv_0")(h)
        else:
            _, h = self._gn_conv(x, out_ch, gn_name="GroupNorm_0", conv_name="Conv_0")

        if temb is not None:
            h = h + _TembDense(out_ch, name="Dense_0")(self.act(temb))[:, None, None, :]
        if self.dropout > 0 and train:
            # dropout sits between act(GN_1) and Conv_1 — not fusable
            hh = group_norm_act(out_ch, self.act, name="GroupNorm_1")(h)
            hh = nn.Dropout(self.dropout, deterministic=False)(hh)
            h = Conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1")(hh)
        else:
            _, h = self._gn_conv(
                h, out_ch, gn_name="GroupNorm_1", conv_name="Conv_1",
                init_scale=self.init_scale,
            )

        if in_ch != out_ch or self.up or self.down:
            x = Conv1x1(out_ch, name="Conv_2")(x)

        if self.skip_rescale:
            return (x + h) * 0.7071067811865476
        return x + h


class ResnetBlockDDPM(nn.Module):
    """DDPM-style residual block (reference layerspp.py:176-219); kept for
    resblock_type='ddpm' capability parity (unused by shipped configs)."""

    act: Act
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: jax.Array | None = None, train: bool = False
    ) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch

        h = self.act(group_norm(in_ch, name="GroupNorm_0", dtype=x.dtype)(x).astype(x.dtype))
        h = Conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembDense(out_ch, name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, name="GroupNorm_1", dtype=h.dtype)(h).astype(h.dtype))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        if self.skip_rescale:
            return (x + h) * 0.7071067811865476
        return x + h
