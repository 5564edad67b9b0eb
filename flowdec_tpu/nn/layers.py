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
        import os

        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        # NOTE (measured, PERF.md): an optimization_barrier here was tried to
        # stop XLA emitting f32 producer-conv outputs (7.5 GB HLO temps in the
        # batch-8×10 s graph). It cost 17% end-to-end AND did not remove the
        # temps — this runtime pins --xla_allow_excess_precision=true, which
        # keeps f32 through the barrier. The structural fix is the opaque
        # Pallas stats pass below (FLOWDEC_GN_STATS=pallas): the producer
        # materializes in x.dtype once and the normalize consumes the
        # kernel's aliased passthrough, never the pre-boundary f32 value.
        force = os.environ.get("FLOWDEC_GN_STATS_FORCE") == "1"
        n_spatial = 1
        for d in x.shape[1:-1]:
            n_spatial *= d
        if (
            (force or os.environ.get("FLOWDEC_GN_STATS") == "pallas")
            and x.ndim >= 3
            and n_spatial % 8 == 0
            and (force or jax.default_backend() == "tpu")
        ):
            from flowdec_tpu.ops.group_stats_pallas import group_stats_passthrough

            xp, mean_g, inv_g = group_stats_passthrough(
                x, g, self.epsilon, interpret=force
            )
            cg = c // g
            a = (inv_g[:, :, None] * scale.astype(jnp.float32).reshape(g, cg))
            b = (
                bias.astype(jnp.float32).reshape(g, cg)
                - mean_g[:, :, None] * a
            )
            bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            a = a.reshape(x.shape[0], -1).reshape(bshape).astype(x.dtype)
            b = b.reshape(x.shape[0], -1).reshape(bshape).astype(x.dtype)
            return xp * a + b

        # A bf16 bitcast round-trip on the stats input was also tried
        # (FLOWDEC_GN_STATS=bitcast, removed): measured 8.25× vs 8.96× AND
        # the batch-16 f32[B,768,T,256] conv temps survived — the
        # excess-precision chain isn't breakable from the consumer side
        # without an opaque boundary, and every opaque boundary measured so
        # far (barrier, Pallas stats, Pallas convs) costs more than it saves.
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


class _Conv3x3Kernel(nn.Module):
    """Stride-1 3×3 conv with nn.Conv-compatible params (kernel, bias) that
    dispatches through ops.conv3x3_pallas.conv3x3 — the Pallas halo-DMA
    kernel on TPU for MXU-sized channel counts (measured 26% faster than
    XLA's conv at the U-Net's level-0 shape), XLA everywhere else."""

    features: int
    init_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from flowdec_tpu.ops.conv3x3_pallas import conv3x3

        k = self.param(
            "kernel", default_init(self.init_scale), (3, 3, x.shape[-1], self.features)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv3x3(x, k.astype(x.dtype), b)


class Conv3x3(nn.Module):
    """3×3 same-padding conv with DDPM init and zero-init bias
    (reference layers.py:128-136)."""

    features: int
    init_scale: float = 1.0
    use_bias: bool = True
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.stride == 1:
            # param path stays Conv_0/{kernel,bias} — checkpoint-identical
            return _Conv3x3Kernel(
                self.features, self.init_scale, self.use_bias, name="Conv_0"
            )(x)
        return nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
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


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm + SiLU via the fused Pallas kernel (ops/groupnorm_pallas).

    Parameter names (scale, bias) match nn.GroupNorm so checkpoints are
    interchangeable with the unfused path.
    """

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from flowdec_tpu.ops.groupnorm_pallas import fused_group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return fused_group_norm_silu(x, scale, bias, self.num_groups, self.epsilon)


def group_norm_act(ch: int, act, fused: bool, name: str | None = None):
    """act(GroupNorm(x)) — fused Pallas path when `fused` and act is SiLU.

    The unfused path casts the GN output back to the input dtype: flax
    GroupNorm computes statistics in f32 and returns the promoted dtype, which
    silently upgraded every downstream conv to f32 in bf16 inference (measured:
    188/202 convs f32 before this cast)."""
    if fused and act in (_ACTS["swish"],):
        return FusedGroupNormSiLU(num_groups=min(ch // 4, 32), epsilon=1e-6, name=name)
    return lambda x: act(group_norm(ch, name=name, dtype=x.dtype)(x).astype(x.dtype))
