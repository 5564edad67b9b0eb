"""NCSN++ U-Net backbone over complex STFT "images" (Flax/linen, NHWC).

Capability parity with /root/reference/flowdec/backbones/ncsnpp.py (NCSNpp,
:49-411): complex x_t and conditioning y enter as 4 real channels
(x.re, x.im, y.re, y.im), a scalar t enters through a Gaussian-Fourier (or
positional) embedding + 2-layer MLP, and the output's 2 real channels form a
complex field.

Design departures from the reference (deliberate, TPU-first):
  * Complex tensors never exist: inputs/outputs are cpair arrays
    (B, F, T, 2) — see ops/cpair.py. TPUs have no complex ALU, and the
    reference itself flattened complex→channels at the backbone boundary
    anyway; we keep that representation end-to-end.
  * The fragile flat ModuleList walked by a manual m_idx counter
    (ncsnpp.py:254-399) is replaced by a structured down/bottleneck/up graph;
    module names are stable and the wiring is checked by construction.
  * NHWC layout (batch, freq, time, channels) so convs hit XLA's preferred
    TPU layout; H = frequency (image_size=768 bins), W = STFT frames.
  * All control flow is static Python over config — the traced graph contains
    no data-dependent branching, so the whole forward jits into one XLA
    program.

Supported config space (same axes as the reference ctor, ncsnpp.py:52-75):
resblock_type biggan|ddpm, progressive none|output_skip|residual,
progressive_input none|input_skip|residual, embedding fourier|positional,
fir on/off, attention by resolution + bottleneck.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.nn.blocks import (
    AttnBlock,
    Combine,
    Downsample,
    ResnetBlockBigGAN,
    ResnetBlockDDPM,
    Upsample,
)
from flowdec_tpu.nn.layers import (
    Conv1x1,
    Conv3x3,
    GaussianFourierProjection,
    default_init,
    get_act,
    group_norm,
    group_norm_act,
    positional_time_embedding,
)

__all__ = ["NCSNpp", "NCSNppConfig", "FLOWDEC_FINAL_NO_ATTN", "SGMSE_DEFAULT_YCOND"]


@dataclasses.dataclass(frozen=True)
class NCSNppConfig:
    """Static NCSN++ hyperparameters (mirrors the reference ctor defaults,
    ncsnpp.py:52-75)."""

    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (64, 32, 16, 8)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    embedding_type: str = "fourier"
    dropout: float = 0.0
    num_channels: int = 4  # x.real, x.imag, y.real, y.imag
    output_kernel_size: int = 3
    output_bias: bool = False
    bottleneck_attn: bool = True
    # Rematerialize residual blocks in the backward pass (jax.checkpoint):
    # trades ~⅓ more forward FLOPs for O(depth) less activation memory —
    # required to train the 75M model at batch 8 × 2 s crops in one chip's
    # HBM. No effect on inference-only jits.
    remat: bool = False
    # Run the U-Net over (time, freq) instead of (freq, time) images: two
    # cheap 4-channel transposes at entry/exit put the 768-bin frequency
    # axis in the second-minor (sublane) position, where it space-blocks
    # 8×96 with zero padding (T=640 pads to 648). Layout experiment for the
    # Mosaic conv-relayout copies measured at 19% of device time (PERF.md).
    # Weight layouts are identical (3×3 kernels, symmetric resampling), but
    # trained weights are orientation-specific — flip kernel H/W when
    # importing checkpoints trained in the other orientation.
    transpose_image: bool = False

    def __post_init__(self):
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        assert self.embedding_type in ("fourier", "positional")
        assert self.resblock_type in ("biggan", "ddpm")


# The two shipped backbone configurations.
# config/model/backbone/ncsnpp_final_no_attn.yaml
FLOWDEC_FINAL_NO_ATTN = NCSNppConfig(
    nf=64,
    ch_mult=(4, 4, 4, 2),
    num_res_blocks=1,
    attn_resolutions=(),
    bottleneck_attn=False,
    image_size=768,
    output_kernel_size=1,
    output_bias=False,
)
# config/model/backbone/ncsnpp_default_ycond.yaml
SGMSE_DEFAULT_YCOND = NCSNppConfig(
    nf=128,
    ch_mult=(1, 1, 2, 2, 2, 2, 2),
    num_res_blocks=2,
    attn_resolutions=(),
    bottleneck_attn=True,
    image_size=768,
    output_kernel_size=3,
    output_bias=False,
)


class NCSNpp(nn.Module):
    """NCSN++ over (freq, time) complex spectrogram images."""

    config: NCSNppConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # cpair (B, F, T, 2)
        y: jax.Array,  # cpair (B, F, T, 2)
        t: jax.Array,  # (B,) or scalar
        *,
        train: bool = False,
    ) -> jax.Array:  # cpair (B, F, T, 2)
        cfg = self.config
        act = get_act(cfg.nonlinearity)
        num_resolutions = len(cfg.ch_mult)
        all_resolutions = [cfg.image_size // (2**i) for i in range(num_resolutions)]
        resblock = ResnetBlockBigGAN if cfg.resblock_type == "biggan" else ResnetBlockDDPM
        if cfg.remat:
            # static_argnums: (3,) = the `train` flag (0 is the module itself)
            resblock = nn.remat(resblock, static_argnums=(3,))
        common = dict(
            act=act,
            dropout=cfg.dropout,
            skip_rescale=cfg.skip_rescale,
            init_scale=cfg.init_scale,
        )
        if cfg.resblock_type == "biggan":
            common.update(
                fir=cfg.fir, fir_kernel=cfg.fir_kernel,
            )

        if t.ndim == 0:
            t = t[None]

        # cpair (x, y) → 4 real channels (x.re, x.im, y.re, y.im), NHWC
        # (reference _preprocess :401-404).
        assert x.shape[-1] == 2 and y.shape[-1] == 2, "expected cpair inputs"
        h = jnp.concatenate([x, y], axis=-1)
        if cfg.transpose_image:
            h = jnp.swapaxes(h, 1, 2)
        input_dtype = h.dtype

        # --- time embedding ---
        if cfg.embedding_type == "fourier":
            temb = GaussianFourierProjection(
                embedding_size=cfg.nf, scale=cfg.fourier_scale, name="fourier_proj"
            )(t)
        else:
            temb = positional_time_embedding(t, cfg.nf)
        if cfg.conditional:
            temb = nn.Dense(
                cfg.nf * 4,
                kernel_init=default_init(),
                bias_init=nn.initializers.zeros,
                name="temb_dense_0",
            )(temb)
            temb = nn.Dense(
                cfg.nf * 4,
                kernel_init=default_init(),
                bias_init=nn.initializers.zeros,
                name="temb_dense_1",
            )(act(temb))
        else:
            temb = None
        if temb is not None:
            # keep the feature path's compute dtype (bf16 inference): without
            # this, the f32 temb would promote every resblock back to f32
            temb = temb.astype(input_dtype)

        # --- down path ---
        input_pyramid = h if cfg.progressive_input != "none" else None
        hs = [Conv3x3(cfg.nf, name="conv_in")(h)]

        for i_level in range(num_resolutions):
            for i_block in range(cfg.num_res_blocks):
                out_ch = cfg.nf * cfg.ch_mult[i_level]
                h = resblock(
                    out_ch=out_ch, name=f"down_{i_level}_block_{i_block}", **common
                )(hs[-1], temb, train)
                if all_resolutions[i_level] in cfg.attn_resolutions:
                    h = AttnBlock(
                        skip_rescale=cfg.skip_rescale,
                        init_scale=cfg.init_scale,
                        name=f"down_{i_level}_attn_{i_block}",
                    )(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if cfg.resblock_type == "ddpm":
                    h = Downsample(
                        with_conv=cfg.resamp_with_conv,
                        fir=cfg.fir,
                        fir_kernel=cfg.fir_kernel,
                        name=f"down_{i_level}_downsample",
                    )(hs[-1])
                else:
                    h = resblock(down=True, name=f"down_{i_level}_downsample", **common)(
                        hs[-1], temb, train
                    )

                if cfg.progressive_input == "input_skip":
                    input_pyramid = Downsample(
                        with_conv=False,
                        fir=cfg.fir,
                        fir_kernel=cfg.fir_kernel,
                        name=f"down_{i_level}_pyramid_downsample",
                    )(input_pyramid)
                    h = Combine(
                        features=h.shape[-1],
                        method=cfg.progressive_combine,
                        name=f"down_{i_level}_combine",
                    )(input_pyramid, h)
                elif cfg.progressive_input == "residual":
                    input_pyramid = Downsample(
                        out_ch=h.shape[-1],
                        with_conv=True,
                        fir=cfg.fir,
                        fir_kernel=cfg.fir_kernel,
                        name=f"down_{i_level}_pyramid_downsample",
                    )(input_pyramid)
                    if cfg.skip_rescale:
                        input_pyramid = (input_pyramid + h) * 0.7071067811865476
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- bottleneck ---
        h = hs[-1]
        h = resblock(name="mid_block_0", **common)(h, temb, train)
        if cfg.bottleneck_attn:
            h = AttnBlock(
                skip_rescale=cfg.skip_rescale, init_scale=cfg.init_scale, name="mid_attn"
            )(h)
        h = resblock(name="mid_block_1", **common)(h, temb, train)

        # --- up path ---
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(cfg.num_res_blocks + 1):
                out_ch = cfg.nf * cfg.ch_mult[i_level]
                h = resblock(
                    out_ch=out_ch, name=f"up_{i_level}_block_{i_block}", **common
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb, train)
            if all_resolutions[i_level] in cfg.attn_resolutions:
                h = AttnBlock(
                    skip_rescale=cfg.skip_rescale,
                    init_scale=cfg.init_scale,
                    name=f"up_{i_level}_attn",
                )(h)

            if cfg.progressive != "none":
                if i_level == num_resolutions - 1:
                    if cfg.progressive == "output_skip":
                        pyramid = group_norm_act(
                            h.shape[-1], act,
                            name=f"up_{i_level}_pyramid_norm",
                        )(h)
                        pyramid = Conv3x3(
                            cfg.num_channels,
                            init_scale=cfg.init_scale,
                            name=f"up_{i_level}_pyramid_conv",
                        )(pyramid)
                    else:  # residual
                        pyramid = group_norm_act(
                            h.shape[-1], act,
                            name=f"up_{i_level}_pyramid_norm",
                        )(h)
                        pyramid = Conv3x3(
                            h.shape[-1], name=f"up_{i_level}_pyramid_conv"
                        )(pyramid)
                else:
                    if cfg.progressive == "output_skip":
                        pyramid = Upsample(
                            with_conv=False,
                            fir=cfg.fir,
                            fir_kernel=cfg.fir_kernel,
                            name=f"up_{i_level}_pyramid_upsample",
                        )(pyramid)
                        pyramid_h = group_norm_act(
                            h.shape[-1], act,
                            name=f"up_{i_level}_pyramid_norm",
                        )(h)
                        pyramid_h = Conv3x3(
                            cfg.num_channels,
                            init_scale=cfg.init_scale,
                            name=f"up_{i_level}_pyramid_conv",
                        )(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = Upsample(
                            out_ch=h.shape[-1],
                            with_conv=True,
                            fir=cfg.fir,
                            fir_kernel=cfg.fir_kernel,
                            name=f"up_{i_level}_pyramid_upsample",
                        )(pyramid)
                        if cfg.skip_rescale:
                            pyramid = (pyramid + h) * 0.7071067811865476
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if cfg.resblock_type == "ddpm":
                    h = Upsample(
                        with_conv=cfg.resamp_with_conv,
                        fir=cfg.fir,
                        fir_kernel=cfg.fir_kernel,
                        name=f"up_{i_level}_upsample",
                    )(h)
                else:
                    h = resblock(up=True, name=f"up_{i_level}_upsample", **common)(
                        h, temb, train
                    )

        assert not hs, "U-Net skip bookkeeping failed"

        if cfg.progressive == "output_skip":
            h = pyramid
        else:
            h = act(group_norm(h.shape[-1], name="norm_out", dtype=h.dtype)(h).astype(h.dtype))
            h = Conv3x3(
                cfg.num_channels, init_scale=cfg.init_scale, name="conv_out"
            )(h)

        # Final conv to exactly 2 channels = the output cpair
        # (reference output_layer ncsnpp.py:100 + _postprocess :407-411).
        out = nn.Conv(
            2,
            (cfg.output_kernel_size, cfg.output_kernel_size),
            padding="SAME",
            use_bias=cfg.output_bias,
            name="output_layer",
        )(h.astype(input_dtype))
        if cfg.transpose_image:
            out = jnp.swapaxes(out, 1, 2)
        return out.astype(jnp.float32)
