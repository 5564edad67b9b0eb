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


class _GNParamHolder(nn.Module):
    """Declares GroupNorm-compatible (scale, bias) without computing — used
    by the fused GN+SiLU+conv path so the parameter tree stays identical to
    the unfused nn.GroupNorm module of the same name."""

    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        return scale, bias


class _ConvParamsInner(nn.Module):
    features: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.param(
            "kernel", default_init(self.init_scale), (3, 3, in_ch, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvParamHolder(nn.Module):
    """Declares Conv3x3-compatible params at path <name>/Conv_0/{kernel,bias}
    (matching Conv3x3's nested module) without computing."""

    features: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, in_ch: int):
        return _ConvParamsInner(self.features, self.init_scale, name="Conv_0")(in_ch)


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
    fused_gn: bool = False  # Pallas-fused GroupNorm+SiLU (perf knob)
    fused_gn_conv: bool = False  # Pallas-fused GroupNorm+SiLU+conv3x3 (perf knob)

    def _gn_conv(
        self,
        h: jax.Array,
        ch: int,
        *,
        gn_name: str,
        conv_name: str,
        init_scale: float = 1.0,
        fuse_ok: bool = True,
    ) -> jax.Array:
        """act(GN(h)) → conv3x3, fused into one Pallas kernel when enabled and
        eligible; parameter paths identical to the unfused modules."""
        import os

        from flowdec_tpu.nn.layers import _ACTS

        # test hook: force the fused path in interpret mode on CPU so the
        # wiring (param holders, eligibility plumbing) is covered by pytest
        force = os.environ.get("FLOWDEC_FUSED_GN_CONV_FORCE") == "1"
        # level gate: only fuse at spatial sizes where the kernel beats XLA
        # end-to-end (measure per model via FLOWDEC_FUSED_MIN_H)
        # NOTE: both env vars are captured at TRACE time — after the first
        # jit trace, changing them in-process has no effect (set before the
        # first call, or use a fresh process per A/B point)
        min_h = int(os.environ.get("FLOWDEC_FUSED_MIN_H", "8"))
        in_ch = h.shape[-1]
        use_fused = (
            self.fused_gn_conv
            and fuse_ok
            and self.act is _ACTS["swish"]
            and h.shape[1] >= (8 if force else min_h)
            and h.shape[2] >= 8
            and (
                force
                or (
                    jax.default_backend() == "tpu"
                    and in_ch % 128 == 0
                    and ch % 128 == 0
                )
            )
        )
        if not use_fused:
            hh = group_norm_act(in_ch, self.act, self.fused_gn, name=gn_name)(h)
            return hh, Conv3x3(ch, init_scale=init_scale, name=conv_name)(hh)

        from flowdec_tpu.ops import gn_act_conv_pallas as gac

        impl = {
            "v1": gac.gn_silu_conv3x3,
            "v2": gac.gn_silu_conv3x3_v2,
        }.get(os.environ.get("FLOWDEC_GN_CONV_IMPL", "v3"),
              gac.gn_silu_conv3x3_v3)
        scale, bias = _GNParamHolder(in_ch, name=gn_name)()
        k, cb = _ConvParamHolder(ch, init_scale, name=conv_name)(in_ch)
        out = impl(
            h, scale, bias, k.astype(h.dtype), cb,
            min(in_ch // 4, 32), 1e-6, force,
        )
        return None, out

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: jax.Array | None = None, train: bool = False
    ) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch

        if self.up or self.down:
            # resampling sits between act(GN) and the conv — not fusable
            h = group_norm_act(in_ch, self.act, self.fused_gn, name="GroupNorm_0")(x)
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
            hh = group_norm_act(out_ch, self.act, self.fused_gn, name="GroupNorm_1")(h)
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
