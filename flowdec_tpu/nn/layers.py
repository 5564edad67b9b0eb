"""Core NN layers for the NCSN++ backbone (Flax/linen, NHWC).

Capability parity with /root/reference/flowdec/backbones/ncsnpp_utils/
{layers,layerspp}.py — re-designed as structured Flax modules. The DDPM
'fan_avg uniform' initializer is JAX-native here (the reference *ported it
from JAX* in layers.py:64-101, so we simply use flax's variance_scaling).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "default_init",
    "get_act",
    "Conv3x3",
    "Conv1x1",
    "NIN",
    "GaussianFourierProjection",
    "positional_time_embedding",
    "group_norm",
    "FusedGroupNormSiLU",
]


def default_init(scale: float = 1.0):
    """DDPM initializer: variance_scaling(scale, fan_avg, uniform); scale 0 → 1e-10
    (reference layers.py:97-101)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


_ACTS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "swish": jax.nn.silu,
}


def get_act(name: str) -> Callable[[jax.Array], jax.Array]:
    try:
        return _ACTS[name]
    except KeyError as e:
        raise NotImplementedError(f"activation function {name!r} does not exist!") from e


class GroupNorm(nn.Module):
    """GroupNorm with f32 statistics but normalize/affine in the INPUT dtype.

    flax's nn.GroupNorm promotes the whole normalize to f32 (its subtract
    happens in f32 even with dtype=bf16), which makes XLA emit f32 outputs
    for the producer convolutions and f32 layout copies of the largest
    activations (measured on the (768,640,256) level-0 tensors). Here the
    f32 mean/rsqrt are cast DOWN before the elementwise apply, so every
    tensor-sized value stays in x.dtype; stats still accumulate in f32
    (fast-variance form E[x²]−E[x]², like flax). Param names (scale, bias)
    match nn.GroupNorm — checkpoints are interchangeable."""

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        # f32 statistics, input-dtype apply. Consumer-side attempts to stop
        # XLA's excess-precision f32 producer-conv temps (optimization
        # barriers, an opaque Pallas stats pass, bf16 bitcast round-trips)
        # all measured SLOWER end-to-end and are deleted — see PERF.md
        # "GN stats interventions" scorecard and the megakernel gate.
        xg = x.reshape(x.shape[:-1] + (g, c // g))
        red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(
            jnp.square(xg.astype(jnp.float32)), axis=red, keepdims=True
        )
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)

        y = (xg - mean.astype(x.dtype)) * inv.astype(x.dtype)
        y = y.reshape(x.shape)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def group_norm(ch: int, name: str | None = None, dtype=None) -> GroupNorm:
    """GroupNorm(min(ch//4, 32) groups, eps=1e-6) as hardcoded throughout
    NCSN++ (reference hardcodes nn.GroupNorm, SURVEY §2.3 normalization.py
    note). `dtype` is accepted for signature stability; the apply dtype
    always follows the input (see GroupNorm)."""
    del dtype
    return GroupNorm(num_groups=min(ch // 4, 32), epsilon=1e-6, name=name)


class Conv3x3(nn.Module):
    """3×3 same-padding conv with DDPM init and zero-init bias
    (reference layers.py:128-136)."""

    features: int
    init_scale: float = 1.0
    use_bias: bool = True
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # (a Pallas halo-DMA conv3x3 dispatched here through round 1;
        # deleted after losing end-to-end — PERF.md. XLA's conv wins at every
        # measured shape once fusion barriers are accounted for.)
        return nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            name="Conv_0",
        )(x)


class Conv1x1(nn.Module):
    """1×1 conv with DDPM init and zero-init bias (reference layers.py:110-115)."""

    features: int
    init_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.features,
            (1, 1),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )(x)


class NIN(nn.Module):
    """Network-in-network: per-pixel dense over channels (reference layers.py:566-576).

    On NHWC this is just a Dense on the trailing axis — no permutes needed.
    """

    features: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("W", default_init(self.init_scale), (x.shape[-1], self.features))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        return jnp.tensordot(x, w, axes=1) + b


class GaussianFourierProjection(nn.Module):
    """[sin(2π t W), cos(2π t W)] time embedding with a frozen random W·scale
    (reference layerspp.py:42-51). W is stored in params but must be excluded
    from optimization — see flowdec_tpu.train.state.trainable_mask."""

    embedding_size: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        # frequencies always in f32: bf16 would perturb sin/cos phases by
        # O(0.002·|W|·2π) — far above embedding resolution
        w = jax.lax.stop_gradient(w).astype(jnp.float32)
        x_proj = t.astype(jnp.float32)[:, None] * w[None, :] * (2 * np.pi)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def positional_time_embedding(
    timesteps: jax.Array, embedding_dim: int, max_positions: int = 10000
) -> jax.Array:
    """Transformer sinusoidal embedding (reference layers.py:535-550)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = np.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def group_norm_act(ch: int, act, name: str | None = None):
    """act(GroupNorm(x)), cast back to the input dtype: flax GroupNorm
    computes statistics in f32 and returns the promoted dtype, which silently
    upgraded every downstream conv to f32 in bf16 inference (measured:
    188/202 convs f32 before this cast)."""
    return lambda x: act(group_norm(ch, name=name, dtype=x.dtype)(x).astype(x.dtype))
