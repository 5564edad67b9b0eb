"""NDAC: the underlying non-adversarial neural audio codec, in JAX/Flax.

FlowDec consumes a retrained descript-audio-codec ("NDAC-25/75") as an
external pip package (reference demo.ipynb cell 3/4; requirements.txt pins
descript-audio-codec==1.0.0). The API surface used by the pipeline is
    dac.encode(x, n_quantizers) -> (z, codes, latents)
    dac.quantizer.from_codes(codes) -> zq
    dac.decode(z) -> waveform
This module provides that capability natively: a DAC-architecture codec
(Snake-activated conv encoder, residual vector quantizer with projected
codebooks, transposed-conv decoder) as Flax modules, TPU-first:

  * 1-D convs in NWC layout (time, channels-last) — XLA's preferred form;
  * codebook lookup in `from_codes` is a one-hot matmul (MXU-friendly gather);
  * quantization uses straight-through estimators; commitment + codebook
    losses are returned for training (NDAC is trained non-adversarially with
    reconstruction losses — see flowdec_tpu.losses).

Weight-norm reparametrization from the torch original is folded into plain
kernels (inference-equivalent; a converter can fuse g·v/|v| on import).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NDACConfig", "NDAC", "ResidualVectorQuantizer", "snake",
    "cast_codec_params",
]


def cast_codec_params(params, dtype) -> dict:
    """Cast float codec params for reduced-precision inference (bf16 decode).

    Flax conv/dense ops follow their operand dtypes, so a bf16 param tree +
    bf16 input runs the whole decode on the MXU in bf16 (mirrors
    EnhancementModel.cast_for_compute). Integer leaves (codes) are untouched.
    The serving pipeline (bench.py measure_pipeline_rtf) casts the
    decoded waveform back to float32 before the postfilter's preprocess.
    """
    dt = jnp.dtype(dtype)
    return jax.tree.map(
        lambda p: p.astype(dt) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation x + sin²(αx)/α (periodic inductive bias for audio)."""
    alpha = jnp.maximum(alpha, 1e-9)
    return x + jnp.square(jnp.sin(alpha * x)) / alpha


class Snake(nn.Module):
    """Per-channel learnable-frequency Snake activation."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        return snake(x, alpha)


def _conv1d(features: int, kernel: int, *, stride: int = 1, dilation: int = 1,
            init_scale: float = 1.0, name: Optional[str] = None) -> nn.Conv:
    """1-D conv; init_scale multiplies the init STD (lecun_normal at 1.0).

    Small init_scale is the TPU-training stabilizer replacing torch DAC's
    weight_norm dynamics: without it the decoder's tanh saturates at init
    (pre-tanh activations ≫1 from the Snake DC accumulation) and the RVQ
    residual chain inflates z_e, and Adam's scale-free steps then run the
    un-normed weights away (first NDAC campaign: VQ loss 879→24k in 7
    steps). Checkpoint LAYOUT is unchanged (init only)."""
    pad = ((kernel - 1) * dilation) // 2
    return nn.Conv(
        features, (kernel,), strides=(stride,), kernel_dilation=(dilation,),
        padding=((pad, pad),),
        kernel_init=nn.initializers.variance_scaling(
            init_scale * init_scale, "fan_in", "truncated_normal"
        ),
        name=name,
    )


class ResidualUnit(nn.Module):
    """Snake → dilated 7-conv → Snake → 1-conv, residual (DAC ResidualUnit)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Snake(name="snake_0")(x)
        h = _conv1d(self.dim, 7, dilation=self.dilation, name="conv_0")(h)
        h = Snake(name="snake_1")(h)
        h = _conv1d(self.dim, 1, name="conv_1")(h)
        return x + h


class EncoderBlock(nn.Module):
    """3 residual units (dilations 1/3/9) + strided down-conv."""

    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_dim // 2, dilation, name=f"res_{i}")(x)
        x = Snake(name="snake_out")(x)
        k = 2 * self.stride
        pad = math.ceil(self.stride / 2)
        return nn.Conv(
            self.out_dim, (k,), strides=(self.stride,),
            padding=((pad, pad),), name="down_conv",
        )(x)


class DecoderBlock(nn.Module):
    """Snake + transposed up-conv + 3 residual units."""

    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Snake(name="snake_in")(x)
        k = 2 * self.stride
        pad = math.ceil(self.stride / 2)
        # flax ConvTranspose pads the stride-dilated input like a plain conv;
        # torch-style transposed-conv padding p corresponds to k-1-p here,
        # giving output length T*stride exactly.
        fpad = k - 1 - pad
        x = nn.ConvTranspose(
            self.out_dim, (k,), strides=(self.stride,),
            padding=((fpad, fpad),), name="up_conv",
        )(x)
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_dim, dilation, name=f"res_{i}")(x)
        return x


class Encoder(nn.Module):
    d_model: int
    strides: Tuple[int, ...]
    latent_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, 1) → (B, frames, latent)
        d = self.d_model
        h = _conv1d(d, 7, name="conv_in")(x)
        for i, stride in enumerate(self.strides):
            d *= 2
            h = EncoderBlock(d, stride, name=f"block_{i}")(h)
        h = Snake(name="snake_out")(h)
        return _conv1d(self.latent_dim, 3, name="conv_out")(h)


class Decoder(nn.Module):
    d_model: int
    strides: Tuple[int, ...]

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:  # (B, frames, latent) → (B, T, 1)
        d = self.d_model
        h = _conv1d(d, 7, name="conv_in")(z)
        for i, stride in enumerate(self.strides):
            d //= 2
            h = DecoderBlock(d, stride, name=f"block_{i}")(h)
        h = Snake(name="snake_out")(h)
        # small-init: start unsaturated (tanh near-linear) so recon grads
        # flow from step 0 — see _conv1d docstring
        h = _conv1d(1, 7, init_scale=0.01, name="conv_out")(h)
        return jnp.tanh(h)


class VectorQuantizer(nn.Module):
    """One RVQ stage: project in → L2-normalized codebook lookup → project out.

    setup-based (not compact) because both __call__ and the from_codes-time
    `lookup` share the same parameters."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = _conv1d(self.codebook_dim, 1, name="in_proj")
        # damped out-projection: keeps the 16-stage residual chain from
        # inflating ‖residual‖ (and with it z_e/commitment) at init
        self.out_proj = _conv1d(self.input_dim, 1, init_scale=0.3, name="out_proj")
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )

    def __call__(self, residual: jax.Array):
        z_e = self.in_proj(residual)
        codebook = self.codebook

        # L2-normalized nearest neighbor (DAC uses cosine/normalized lookup)
        z_n = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-8)
        c_n = codebook / (jnp.linalg.norm(codebook, axis=-1, keepdims=True) + 1e-8)
        # distance argmin == similarity argmax; one matmul on the MXU
        sim = jnp.einsum("btd,kd->btk", z_n, c_n)
        codes = jnp.argmax(sim, axis=-1)  # (B, T)

        z_q = jnp.take(codebook, codes, axis=0)  # (B, T, codebook_dim)

        commitment = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)))
        codebook_loss = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z_e)))
        # straight-through
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)

        out = self.out_proj(z_q)
        return out, codes, z_e, commitment, codebook_loss

    def lookup(self, codes: jax.Array) -> jax.Array:
        """codes (B, T) → out-projected continuous latents (B, T, input_dim).

        One-hot matmul so the gather rides the MXU (from_codes path)."""
        onehot = jax.nn.one_hot(codes, self.codebook.shape[0], dtype=self.codebook.dtype)
        z_q = jnp.einsum("btk,kd->btd", onehot, self.codebook)
        return self.out_proj(z_q)


class ResidualVectorQuantizer(nn.Module):
    """Stack of VQ stages quantizing successive residuals (DAC RVQ).

    n_quantizers can be reduced at call time (bitrate control: nq∈{4..16} ⇒
    0.75 kbps per codebook at 75 Hz frame rate / 10-bit codebooks)."""

    input_dim: int
    n_codebooks: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.vqs = [
            VectorQuantizer(
                self.input_dim, self.codebook_size, self.codebook_dim,
                name=f"vq_{i}",
            )
            for i in range(self.n_codebooks)
        ]

    def __call__(
        self,
        z: jax.Array,
        n_quantizers: Optional[int] = None,
        nq_per_sample: Optional[jax.Array] = None,
    ):
        """Quantize z through the stage stack.

        n_quantizers: static prefix length (bitrate control at inference).
        nq_per_sample: (B,) int array — per-SAMPLE prefix lengths, the DAC
            quantizer-dropout training recipe (each sample trains a random
            bitrate); jit-friendly masking, overrides n_quantizers.
        """
        nq = self.n_codebooks if n_quantizers is None else n_quantizers
        z_q = jnp.zeros_like(z)
        residual = z
        codes, latents = [], []
        commitment = 0.0
        codebook_loss = 0.0
        batch = z.shape[0]
        for i, vq in enumerate(self.vqs):
            out_i, codes_i, z_e_i, comm_i, cb_i = vq(residual)
            if nq_per_sample is not None:
                mask = (nq_per_sample > i).astype(z.dtype).reshape(batch, 1, 1)
                z_q = z_q + out_i * mask
                residual = residual - out_i * mask
                commitment = commitment + comm_i * jnp.mean(mask)
                codebook_loss = codebook_loss + cb_i * jnp.mean(mask)
            elif i < nq:  # static gate: nq is a Python int at trace time
                z_q = z_q + out_i
                residual = residual - out_i
                commitment = commitment + comm_i
                codebook_loss = codebook_loss + cb_i
            codes.append(codes_i)
            latents.append(z_e_i)
        return (
            z_q,
            jnp.stack(codes, axis=1),  # (B, n_codebooks, T)
            jnp.concatenate(latents, axis=-1),
            commitment,
            codebook_loss,
        )

    def from_codes(self, codes: jax.Array, n_quantizers: Optional[int] = None) -> jax.Array:
        """codes (B, n_codebooks, T) → summed quantized latent (B, T, input_dim)
        (the demo's dac.quantizer.from_codes path, demo.ipynb cell 4)."""
        nq = codes.shape[1] if n_quantizers is None else n_quantizers
        z_q = None
        for i in range(nq):
            contrib = self.vqs[i].lookup(codes[:, i])
            z_q = contrib if z_q is None else z_q + contrib
        return z_q


@dataclasses.dataclass(frozen=True)
class NDACConfig:
    """48 kHz full-band configuration by default (NDAC; the public DAC-44k
    uses encoder_dim 64, rates [2,4,8,8], 9 codebooks — NDAC-25s carries 16
    codebooks at nq=16 ⇒ 4.0 kbps, NDAC-75m uses nq≤10 ⇒ ≤7.5 kbps,
    demo.ipynb cell 4)."""

    sampling_rate: int = 48000
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 10)  # hop 640 → 75 Hz @ 48 kHz
    decoder_dim: int = 1536
    latent_dim: int = 1024
    n_codebooks: int = 16
    codebook_size: int = 1024
    codebook_dim: int = 8

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    def kbps(self, n_quantizers: int) -> float:
        frame_rate = self.sampling_rate / self.hop_length
        return n_quantizers * math.log2(self.codebook_size) * frame_rate / 1000.0


class NDAC(nn.Module):
    """Full codec: encode / quantize / decode, mirroring the DAC API."""

    config: NDACConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg.encoder_dim, cfg.encoder_rates, cfg.latent_dim)
        self.quantizer = ResidualVectorQuantizer(
            cfg.latent_dim, cfg.n_codebooks, cfg.codebook_size, cfg.codebook_dim
        )
        self.decoder = Decoder(
            cfg.decoder_dim, tuple(reversed(cfg.encoder_rates))
        )

    # --- API mirroring dac.DAC ---

    def preprocess(self, x: jax.Array) -> jax.Array:
        """(B, T) waveform → (B, T', 1) right-padded to a hop multiple."""
        if x.ndim == 2:
            x = x[..., None]
        hop = self.config.hop_length
        pad = (-x.shape[1]) % hop
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    def encode(
        self,
        x: jax.Array,
        n_quantizers: Optional[int] = None,
        nq_per_sample: Optional[jax.Array] = None,
    ):
        """waveform → (z_q, codes, latents, commitment_loss, codebook_loss)."""
        z = self.encoder(self.preprocess(x))
        return self.quantizer(z, n_quantizers, nq_per_sample)

    def decode(self, z_q: jax.Array) -> jax.Array:
        """quantized latent (B, frames, latent) → waveform (B, T)."""
        return self.decoder(z_q)[..., 0]

    def from_codes(self, codes: jax.Array, n_quantizers: Optional[int] = None):
        return self.quantizer.from_codes(codes, n_quantizers)

    def __call__(
        self,
        x: jax.Array,
        n_quantizers: Optional[int] = None,
        nq_per_sample: Optional[jax.Array] = None,
    ):
        """Full autoencode: returns dict with reconstruction + VQ losses."""
        length = x.shape[-1]
        z_q, codes, latents, commitment, codebook_loss = self.encode(
            x, n_quantizers, nq_per_sample
        )
        recon = self.decode(z_q)[..., :length]
        return {
            "audio": recon,
            "z": z_q,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commitment,
            "vq/codebook_loss": codebook_loss,
        }
