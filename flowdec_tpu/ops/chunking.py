"""Chunked overlap-add streaming for long-form inference.

The reference caps inference at 30 s per file and runs single-shot
(/root/reference/enhance.py:115). The TPU framework instead supports
arbitrary-length audio by slicing the waveform into fixed-size overlapping
chunks (so jit sees ONE compiled shape), enhancing each chunk, and
cross-fading the overlaps. The FlowDec backbone is a conv U-Net with a finite
receptive field, so with overlap >= the receptive-field halo this is exact up
to the crossfade window.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["plan_chunks", "extract_chunks", "merge_chunks"]


def plan_chunks(length: int, chunk_len: int, overlap: int) -> Tuple[np.ndarray, int]:
    """Compute chunk start offsets for a signal of `length` samples.

    Returns (starts, n_chunks). Chunks are `chunk_len` long with `overlap`
    samples shared between neighbors; the final chunk is aligned to the signal
    end (its overlap with the previous chunk may be larger).
    """
    assert 0 <= overlap < chunk_len
    if length <= chunk_len:
        return np.array([0], dtype=np.int64), 1
    hop = chunk_len - overlap
    n = 1 + math.ceil((length - chunk_len) / hop)
    starts = np.minimum(np.arange(n, dtype=np.int64) * hop, length - chunk_len)
    return starts, n


def extract_chunks(x: jax.Array, starts: np.ndarray, chunk_len: int) -> jax.Array:
    """Gather chunks (n_chunks, ..., chunk_len) from a signal (..., length).

    The signal is zero-padded on the right if shorter than chunk_len.
    """
    length = x.shape[-1]
    if length < chunk_len:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, chunk_len - length)]
        x = jnp.pad(x, pad)
    idx = starts[:, None] + np.arange(chunk_len)[None, :]
    return jnp.moveaxis(x[..., idx], -2, 0)  # (n_chunks, ..., chunk_len)


def _crossfade_ramp(n: int, dtype) -> jax.Array:
    """Equal-sum (linear) fade-in ramp of length n."""
    return jnp.linspace(0.0, 1.0, n + 2, dtype=dtype)[1:-1]


def merge_chunks(
    chunks: jax.Array, starts: np.ndarray, length: int
) -> jax.Array:
    """Overlap-add chunks (n_chunks, ..., chunk_len) back to (..., length).

    Overlapping regions are linearly cross-faded: each sample's weights over
    the contributing chunks sum to 1 exactly, so non-overlap regions pass
    through bit-exact.
    """
    n_chunks, *mid, chunk_len = chunks.shape
    starts = np.asarray(starts, dtype=np.int64)
    assert starts.shape[0] == n_chunks

    # Build per-chunk weights on host: fade-in over the overlap with the
    # previous chunk, fade-out over the overlap with the next chunk.
    weights = np.ones((n_chunks, chunk_len), dtype=np.float64)
    for i in range(n_chunks):
        if i > 0:
            ov = int(starts[i - 1] + chunk_len - starts[i])
            if ov > 0:
                ramp = np.linspace(0.0, 1.0, ov + 2)[1:-1]
                weights[i, :ov] *= ramp
        if i < n_chunks - 1:
            ov = int(starts[i] + chunk_len - starts[i + 1])
            if ov > 0:
                ramp = np.linspace(0.0, 1.0, ov + 2)[1:-1]
                weights[i, chunk_len - ov :] *= ramp[::-1]
    w = jnp.asarray(weights, dtype=chunks.real.dtype if jnp.iscomplexobj(chunks) else chunks.dtype)
    w = w.reshape((n_chunks,) + (1,) * len(mid) + (chunk_len,))

    total_len = int(starts[-1]) + chunk_len
    out = jnp.zeros((*mid, total_len), dtype=chunks.dtype)
    weighted = chunks * w
    for i in range(n_chunks):  # static unroll: n_chunks is host-known
        s = int(starts[i])
        out = out.at[..., s : s + chunk_len].add(weighted[i])
    return out[..., :length]
