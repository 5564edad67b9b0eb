"""upfirdn2d / FIR resampling parity vs an independent numpy oracle.

The oracle implements the published upfirdn spec (zero-stuff → pad → convolve
with flipped kernel → stride-slice), the same contract as the reference's
`upfirdn2d_native` (op/upfirdn2d.py:183-224) and its CUDA kernels.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from flowdec_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)

FIR = [1.0, 3.0, 3.0, 1.0]


def _oracle_upfirdn2d(x_nchw, kernel, up, down, pad):
    """Direct numpy spec: zero-stuff, pad, correlate with flipped kernel, slice."""
    n, c, h, w = x_nchw.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # zero-stuff to h*up (note trailing up-1 zeros)
    stuffed = np.zeros((n, c, h * up, w * up), dtype=np.float64)
    stuffed[:, :, ::up, ::up] = x_nchw
    # pad (may be negative)
    def _pad_axis(a, axis, lo, hi):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (max(lo, 0), max(hi, 0))
        a = np.pad(a, pads)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(-lo, 0), a.shape[axis] - max(-hi, 0))
        return a[tuple(sl)]

    stuffed = _pad_axis(stuffed, 2, pad0, pad1)
    stuffed = _pad_axis(stuffed, 3, pad0, pad1)
    # convolve (flip kernel, then correlate)
    kf = kernel[::-1, ::-1]
    oh = stuffed.shape[2] - kh + 1
    ow = stuffed.shape[3] - kw + 1
    out = np.zeros((n, c, oh, ow))
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * stuffed[:, :, i : i + oh, j : j + ow]
    return out[:, :, ::down, ::down]


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@pytest.fixture(scope="module")
def x_nchw():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 3, 12, 16)).astype(np.float32)


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 2)), (1, 1, (-1, 2))],
)
def test_upfirdn2d_matches_oracle(x_nchw, up, down, pad):
    k1d = np.asarray(FIR) / np.sum(FIR)
    k2d = np.outer(k1d, k1d)
    ours = np.asarray(upfirdn2d(_nchw_to_nhwc(x_nchw), k2d, up=up, down=down, pad=pad))
    oracle = _oracle_upfirdn2d(x_nchw.astype(np.float64), k2d, up, down, pad)
    np.testing.assert_allclose(_nhwc_to_nchw(ours), oracle, atol=1e-5)


def test_upsample_2d_matches_oracle(x_nchw):
    """upsample_2d spec: k*(factor^2), up=2, pad=((p+1)//2+factor-1, p//2), p=len(k)-factor."""
    factor = 2
    k1d = np.asarray(FIR) / np.sum(FIR)
    k2d = np.outer(k1d, k1d) * factor**2
    p = 4 - factor
    oracle = _oracle_upfirdn2d(
        x_nchw.astype(np.float64), k2d, factor, 1, ((p + 1) // 2 + factor - 1, p // 2)
    )
    ours = np.asarray(upsample_2d(_nchw_to_nhwc(x_nchw), FIR, factor=factor))
    assert ours.shape[1:3] == (24, 32)
    np.testing.assert_allclose(_nhwc_to_nchw(ours), oracle, atol=1e-5)


def test_downsample_2d_matches_oracle(x_nchw):
    factor = 2
    k1d = np.asarray(FIR) / np.sum(FIR)
    k2d = np.outer(k1d, k1d)
    p = 4 - factor
    oracle = _oracle_upfirdn2d(
        x_nchw.astype(np.float64), k2d, 1, factor, ((p + 1) // 2, p // 2)
    )
    ours = np.asarray(downsample_2d(_nchw_to_nhwc(x_nchw), FIR, factor=factor))
    assert ours.shape[1:3] == (6, 8)
    np.testing.assert_allclose(_nhwc_to_nchw(ours), oracle, atol=1e-5)


def test_upsample_conv_2d_matches_torch(x_nchw):
    """Fused upsample+conv vs torch conv_transpose2d + oracle FIR (the reference
    recipe, up_or_down_sampling.py:97-166)."""
    factor = 2
    rng = np.random.default_rng(1)
    w_oihw = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)  # out,in,kh,kw

    # torch reference path
    xt = torch.from_numpy(x_nchw)
    wt = torch.from_numpy(w_oihw)
    num_groups = 1
    w2 = wt.reshape(num_groups, -1, 3, 3, 3)
    w2 = torch.flip(w2, [3, 4]).permute(0, 2, 1, 3, 4).reshape(3, 5, 3, 3)
    ht = F.conv_transpose2d(xt, w2, stride=2, padding=0, output_padding=0)
    k1d = np.asarray(FIR) / np.sum(FIR)
    k2d = np.outer(k1d, k1d) * factor**2
    p = (4 - factor) - (3 - 1)
    oracle = _oracle_upfirdn2d(
        ht.numpy().astype(np.float64), k2d, 1, 1, ((p + 1) // 2 + factor - 1, p // 2 + 1)
    )

    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    ours = np.asarray(upsample_conv_2d(_nchw_to_nhwc(x_nchw), w_hwio, FIR, factor=factor))
    assert ours.shape[1:3] == (24, 32)
    np.testing.assert_allclose(_nhwc_to_nchw(ours), oracle, atol=1e-4)


def test_conv_downsample_2d_matches_torch(x_nchw):
    factor = 2
    rng = np.random.default_rng(2)
    w_oihw = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)

    k1d = np.asarray(FIR) / np.sum(FIR)
    k2d = np.outer(k1d, k1d)
    p = (4 - factor) + (3 - 1)
    filtered = _oracle_upfirdn2d(
        x_nchw.astype(np.float64), k2d, 1, 1, ((p + 1) // 2, p // 2)
    )
    theirs = F.conv2d(
        torch.from_numpy(filtered.astype(np.float32)), torch.from_numpy(w_oihw), stride=2
    ).numpy()

    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    ours = np.asarray(conv_downsample_2d(_nchw_to_nhwc(x_nchw), w_hwio, FIR, factor=factor))
    assert ours.shape[1:3] == (6, 8)
    np.testing.assert_allclose(_nhwc_to_nchw(ours), theirs, atol=1e-4)


def test_naive_resampling(x_nchw):
    up = np.asarray(naive_upsample_2d(_nchw_to_nhwc(x_nchw)))
    assert up.shape == (2, 24, 32, 3)
    np.testing.assert_allclose(up[:, ::2, ::2], _nchw_to_nhwc(x_nchw))
    down = np.asarray(naive_downsample_2d(_nchw_to_nhwc(x_nchw)))
    theirs = F.avg_pool2d(torch.from_numpy(x_nchw), 2).numpy()
    np.testing.assert_allclose(_nhwc_to_nchw(down), theirs, atol=1e-6)


@pytest.mark.parametrize("method", ["depthwise", "shift_add", "matmul"])
def test_fir_methods_agree(x_nchw, method):
    """All separable-FIR implementations (set_fir_method) produce identical
    results for every resampler, including odd lengths and the fused
    conv+resample forms."""
    import flowdec_tpu.ops.upfirdn as U

    import jax.numpy as jnp

    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((3, 3, x.shape[-1], 5)).astype(np.float32))
    k = [1.0, 3.0, 3.0, 1.0]

    U.set_fir_method("depthwise")
    ref = [
        U.upsample_2d(x, k),
        U.downsample_2d(x, k),
        U.upsample_conv_2d(x, w, k),
        U.conv_downsample_2d(x, w, k),
    ]
    try:
        U.set_fir_method(method)
        got = [
            U.upsample_2d(x, k),
            U.downsample_2d(x, k),
            U.upsample_conv_2d(x, w, k),
            U.conv_downsample_2d(x, w, k),
        ]
    finally:
        U.set_fir_method("depthwise")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-5)
