"""upfirdn2d (upsample → FIR filter → downsample) and StyleGAN2-style fused
resampling, as XLA dilated convolutions.

Capability parity with the reference's CUDA kernels
(/root/reference/flowdec/backbones/ncsnpp_utils/op/upfirdn2d_kernel.cu and the
exact spec `upfirdn2d_native`, op/upfirdn2d.py:183-224) and with
up_or_down_sampling.py:84-282. TPU-native design: instead of a hand-written
device kernel + custom double-backward autograd, upfirdn is expressed as
`lax.conv_general_dilated` with `lhs_dilation=up`, `window_strides=down`, and
explicit (possibly negative) padding — XLA tiles it onto the hardware and
autodiff is free. The 2-D FIR used by NCSN++ ([1,3,3,1] outer product) is
separable, so we run two cheap 1-D depthwise passes instead of one 4×4.

All functions use NHWC layout (batch, freq, time, channels).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "setup_fir_kernel",
    "set_fir_method",
    "upfirdn2d",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
]

_DN = ("NHWC", "HWIO", "NHWC")


def setup_fir_kernel(k: Sequence[float]) -> np.ndarray:
    """Normalize a 1-D FIR kernel to unit sum (reference _setup_kernel, 1-D case)."""
    k = np.asarray(k, dtype=np.float32)
    assert k.ndim == 1
    return k / np.sum(k)


def _depthwise_conv(
    x: jax.Array,
    kernel: jax.Array,  # (kh, kw)
    *,
    up: Tuple[int, int],
    down: Tuple[int, int],
    pad_h: Tuple[int, int],
    pad_w: Tuple[int, int],
) -> jax.Array:
    """Depthwise cross-correlation with per-axis input dilation/stride/padding."""
    channels = x.shape[-1]
    kh, kw = kernel.shape
    rhs = jnp.broadcast_to(kernel.astype(x.dtype)[:, :, None, None], (kh, kw, 1, channels))
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=down,
        padding=(pad_h, pad_w),
        lhs_dilation=up,
        dimension_numbers=_DN,
        feature_group_count=channels,
    )


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """Upsample by zero-stuffing, pad, convolve with `kernel`, downsample.

    Exact to the reference spec (upfirdn2d_native): the input is zero-stuffed to
    H*up (including up-1 trailing zeros), padded by `pad`, *convolved* (i.e.
    cross-correlated with the flipped kernel), then stride-sliced by `down`.
    With lhs_dilation the stuffed length is (H-1)*up+1, so the trailing up-1
    zeros fold into the high-side padding.

    Args:
        x: NHWC input.
        kernel: 2-D FIR kernel (kh, kw) — applied identically per channel.
        up/down: integer resampling factors (same for both spatial axes).
        pad: (pad0, pad1) applied to both spatial axes; may be negative.
    """
    kernel = jnp.flip(jnp.asarray(kernel), (0, 1))  # conv, not correlation
    pad0, pad1 = pad
    p = (pad0, pad1 + up - 1)
    return _depthwise_conv(x, kernel, up=(up, up), down=(down, down), pad_h=p, pad_w=p)


def _zero_stuff(x: jax.Array, up: int, axis: int) -> jax.Array:
    """Insert up-1 zeros after every element along `axis` (length becomes
    len*up, including up-1 trailing zeros — the exact upfirdn stuffing)."""
    if up == 1:
        return x
    axis = axis % x.ndim
    parts = [x] + [jnp.zeros_like(x)] * (up - 1)
    stacked = jnp.stack(parts, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = x.shape[axis] * up
    return stacked.reshape(new_shape)


def _slice_axis(x: jax.Array, start: int, stop, axis: int, step: int = 1) -> jax.Array:
    idx = [slice(None)] * x.ndim
    idx[axis % x.ndim] = slice(start, stop, step)
    return x[tuple(idx)]


def _fir_axis(
    x: jax.Array, k1d: np.ndarray, *, up: int, down: int,
    pad: Tuple[int, int], axis: int,
) -> jax.Array:
    """1-D upfirdn along one axis as shift-and-add.

    Profiling showed XLA's depthwise (feature_group_count=C) convolutions
    force layout conversions: the FIR resampling was costing more in `copy` /
    `pad` ops than the U-Net's real convolutions. A K-tap FIR is just K
    weighted shifted adds — pure elementwise work XLA fuses with neighbors in
    the native NHWC layout.
    """
    axis = axis % x.ndim
    x = _zero_stuff(x, up, axis)
    lo, hi = pad
    if lo > 0 or hi > 0:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (max(lo, 0), max(hi, 0))
        x = jnp.pad(x, widths)
    if lo < 0 or hi < 0:
        x = _slice_axis(x, max(-lo, 0), x.shape[axis] - max(-hi, 0), axis)

    k = k1d[::-1]  # flip: convolution, not correlation
    taps = len(k)
    out_len = x.shape[axis] - taps + 1
    out = float(k[0]) * _slice_axis(x, 0, out_len, axis)
    for t in range(1, taps):
        out = out + float(k[t]) * _slice_axis(x, t, t + out_len, axis)
    if down > 1:
        out = _slice_axis(out, 0, None, axis, step=down)
    return out


def _separable_fir(
    x: jax.Array, k1d: np.ndarray, *, up: int, down: int, pad: Tuple[int, int]
) -> jax.Array:
    """Apply :func:`upfirdn2d` with the separable kernel outer(k1d, k1d) as two
    1-D depthwise passes (H then W) — half the FLOPs of the 2-D form.

    Measured on v5e (PERF.md): the depthwise-conv form beats the
    shift-and-add form in :func:`_fir_axis` (5.9× vs 7.9× RT end to end —
    the zero-stuff interleave and stride-2 slices cost more in layout
    rearrangement than the depthwise convs do)."""
    k = jnp.asarray(k1d[::-1].copy())  # flip: convolution
    pad_eff = (pad[0], pad[1] + up - 1)
    x = _depthwise_conv(
        x, k[:, None], up=(up, 1), down=(down, 1), pad_h=pad_eff, pad_w=(0, 0)
    )
    x = _depthwise_conv(
        x, k[None, :], up=(1, up), down=(1, down), pad_h=(0, 0), pad_w=pad_eff
    )
    return x


def _separable_fir_shift_add(
    x: jax.Array, k1d: np.ndarray, *, up: int, down: int, pad: Tuple[int, int]
) -> jax.Array:
    """Shift-and-add variant of :func:`_separable_fir` (kept for layout
    experiments; exact per the oracle tests but slower on v5e)."""
    x = _fir_axis(x, k1d, up=up, down=down, pad=pad, axis=-3)  # H (freq)
    x = _fir_axis(x, k1d, up=up, down=down, pad=pad, axis=-2)  # W (time)
    return x


import functools


@functools.lru_cache(maxsize=None)
def _resample_matrix(
    length: int, up: int, down: int, lo: int, hi: int, k_bytes: bytes
) -> np.ndarray:
    """Dense banded matrix W (out_len, length) such that W @ x == 1-D upfirdn
    of x (zero-stuff ×up incl. trailing zeros, pad (lo, hi), convolve, stride
    ×down) — the exact upfirdn2d_native spec per axis.

    Cached as NUMPY (device conversion happens per call: jnp arrays created
    inside a trace must never be cached, they leak tracers)."""
    k = np.frombuffer(k_bytes, dtype=np.float32)
    kf = k[::-1]  # flip: convolution, not correlation
    taps = len(kf)
    padded_len = length * up + lo + hi
    out_len = (padded_len - taps) // down + 1
    w = np.zeros((out_len, length), np.float32)
    for j in range(out_len):
        for t in range(taps):
            s = j * down + t - lo  # index into the zero-stuffed signal
            if s % up == 0 and 0 <= s // up < length:
                w[j, s // up] += kf[t]
    return w


def _fir_axis_matmul(
    x: jax.Array, k1d: np.ndarray, *, up: int, down: int,
    pad: Tuple[int, int], axis: int,
) -> jax.Array:
    """1-D upfirdn along one axis as a dense matmul with a banded resample
    matrix.

    Depthwise (feature_group_count=C) convolutions don't map to the MXU and
    force XLA layout conversions — profiling showed the FIR resampling paths
    costing ~30% of device time in pure `copy`/`pad` ops. A dense (O, L)
    resample matrix turns the whole up-FIR-down into ONE dot_general in the
    native NHWC layout: ~L/taps× more FLOPs, but the model is data-movement
    bound (~8% MXU), so FLOPs are nearly free while the copies vanish."""
    axis = axis % x.ndim
    w = _resample_matrix(x.shape[axis], up, down, pad[0], pad[1],
                         np.asarray(k1d, np.float32).tobytes())
    wj = jnp.asarray(w, x.dtype)
    # in-place contraction (no moveaxis: explicit transposes forced layout
    # copies and measured slower; einsum lets XLA pick the contraction layout)
    if axis == x.ndim - 3:
        return jnp.einsum("oh,...hwc->...owc", wj, x)
    if axis == x.ndim - 2:
        return jnp.einsum("ot,...htc->...hoc", wj, x)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.tensordot(moved, wj, axes=[[-1], [1]])
    return jnp.moveaxis(out, -1, axis)


def _separable_fir_matmul(
    x: jax.Array, k1d: np.ndarray, *, up: int, down: int, pad: Tuple[int, int]
) -> jax.Array:
    """Matmul variant of :func:`_separable_fir` (see _fir_axis_matmul)."""
    x = _fir_axis_matmul(x, k1d, up=up, down=down, pad=pad, axis=-3)  # H
    x = _fir_axis_matmul(x, k1d, up=up, down=down, pad=pad, axis=-2)  # W
    return x


_FIR_IMPLS = {
    "depthwise": _separable_fir,
    "shift_add": _separable_fir_shift_add,
    "matmul": _separable_fir_matmul,
}
# "auto" (measured on v5e, 75M enhance): matmul wins single-stream on TPU
# (8.96x vs 8.72x RT — the dense resample matrix rides the MXU in the native
# layout while depthwise feature_group_count convs force layout copies), but
# its ~L/taps FLOP inflation loses once batched work saturates the MXU
# (batch 8: 13.1x vs 14.2x) — so auto picks matmul only for batch-1 TPU
# graphs, depthwise otherwise (incl. CPU).
_fir_method = os.environ.get("FLOWDEC_FIR", "auto")


def set_fir_method(name: str) -> None:
    """Select the separable-FIR implementation globally ("auto", "depthwise",
    "shift_add", "matmul"). Also settable via env FLOWDEC_FIR. Changing it
    invalidates nothing persistent — jit caches key on the traced graph."""
    assert name == "auto" or name in _FIR_IMPLS, f"unknown FIR method {name!r}"
    global _fir_method
    _fir_method = name


def _separable_fir_dispatch(
    x: jax.Array, k1d: np.ndarray, *, up: int, down: int, pad: Tuple[int, int]
) -> jax.Array:
    method = _fir_method
    if method == "auto":
        single = x.ndim < 4 or x.shape[0] == 1
        # small-C tensors (the 2/4-channel progressive pyramids) waste
        # 16-32x in lane padding under depthwise convs (an OOM dump showed a
        # 120 MB pyramid tensor padded to 1.88 GB) — always matmul those
        small_c = x.shape[-1] <= 8
        method = (
            "matmul"
            if (single or small_c) and jax.default_backend() == "tpu"
            else "depthwise"
        )
    return _FIR_IMPLS[method](x, k1d, up=up, down=down, pad=pad)


def upsample_2d(x: jax.Array, k: Sequence[float], factor: int = 2, gain: float = 1.0) -> jax.Array:
    """FIR-filtered 2× upsampling (reference up_or_down_sampling.py:220-249)."""
    k1d = setup_fir_kernel(k)
    # gain*(factor**2) is split evenly between the two separable passes
    scale = float(np.sqrt(gain) * factor)
    k1d = k1d * scale
    p = k1d.shape[0] - factor
    return _separable_fir_dispatch(
        x, k1d, up=factor, down=1, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample_2d(x: jax.Array, k: Sequence[float], factor: int = 2, gain: float = 1.0) -> jax.Array:
    """FIR-filtered 2× downsampling (reference up_or_down_sampling.py:252-282)."""
    k1d = setup_fir_kernel(k) * float(np.sqrt(gain))
    p = k1d.shape[0] - factor
    return _separable_fir_dispatch(x, k1d, up=1, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(
    x: jax.Array,
    w: jax.Array,  # (kh, kw, in_ch, out_ch) HWIO
    k: Sequence[float],
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """Fused 2× upsample + 3×3 conv (reference up_or_down_sampling.py:97-166).

    The reference's conv_transpose+weight-shuffle reduces to: cross-correlate
    the zero-stuffed input with the *original* conv kernel at full padding,
    then FIR-filter. We express the first step directly with lhs_dilation.
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    assert kh == kw
    x = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=_DN,
    )
    k1d = setup_fir_kernel(k) * float(np.sqrt(gain) * factor)
    p = (k1d.shape[0] - factor) - (kw - 1)
    return _separable_fir_dispatch(
        x, k1d, up=1, down=1, pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )


def conv_downsample_2d(
    x: jax.Array,
    w: jax.Array,  # (kh, kw, in_ch, out_ch) HWIO
    k: Sequence[float],
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """Fused FIR + 3×3 conv with stride 2 (reference up_or_down_sampling.py:169-203)."""
    kh, kw = int(w.shape[0]), int(w.shape[1])
    assert kh == kw
    k1d = setup_fir_kernel(k) * float(np.sqrt(gain))
    p = (k1d.shape[0] - factor) + (kw - 1)
    x = _separable_fir_dispatch(x, k1d, up=1, down=1, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(factor, factor),
        padding=((0, 0), (0, 0)),
        dimension_numbers=_DN,
    )


def naive_upsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor upsampling (reference up_or_down_sampling.py:84-88)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Mean-pool downsampling (reference up_or_down_sampling.py:91-94)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))
