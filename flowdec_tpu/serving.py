"""Serving helpers: long-form streaming enhancement.

The reference caps inference at 30 s and skips longer files
(/root/reference/enhance.py:115). This framework enhances arbitrary-length
audio by chunked overlap-add (ops/chunking.py): fixed-size overlapping chunks
(so jit compiles ONE shape), enhanced as a single batch (all chunks ride the
MXU together), then cross-faded. The global peak normalization is applied
once up front so every chunk sees the same conditioning scale the model saw
on full files.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.ops.chunking import extract_chunks, merge_chunks, plan_chunks
from flowdec_tpu.train.trainer import bucket_length, enhance_bucketed

__all__ = ["StreamingEnhancer"]


class StreamingEnhancer:
    """Callable (key, waveform (L,)) → enhanced waveform (L,).

    Files up to chunk_seconds run single-shot (shape-bucketed); longer files
    stream through overlapping chunks with linear crossfade.
    """

    def __init__(
        self,
        model,
        params,
        *,
        chunk_seconds: Optional[float] = 30.0,
        overlap_seconds: float = 1.0,
        max_chunk_batch: int = 8,
        enhance_kwargs: Optional[Dict[str, Any]] = None,
    ):
        self.model = model
        self.params = params
        self.enhance_kwargs = enhance_kwargs or {}
        sr = model.sampling_rate
        self.chunk_len = (
            None if chunk_seconds is None else bucket_length(model, int(chunk_seconds * sr))
        )
        self.overlap = int(overlap_seconds * sr)
        self.max_chunk_batch = max_chunk_batch

    def __call__(self, key: jax.Array, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y, np.float32)
        assert y.ndim == 1, "StreamingEnhancer takes a single mono waveform"
        if self.chunk_len is None or len(y) <= self.chunk_len:
            return enhance_bucketed(
                self.model, self.params, key, y, **self.enhance_kwargs
            )

        # global peak normalization once (chunks then see normfac≈1)
        peak = float(np.max(np.abs(y)))
        peak = 1.0 if peak <= 1e-8 else peak
        y_norm = y / peak

        starts, n = plan_chunks(len(y_norm), self.chunk_len, self.overlap)
        chunks = extract_chunks(jnp.asarray(y_norm[None]), starts, self.chunk_len)
        chunks = jnp.squeeze(chunks, axis=1)  # (n_chunks, chunk_len)

        # enhance in fixed-size batches so jit sees one batched shape
        from flowdec_tpu.train.trainer import _jitted_enhance

        fn = _jitted_enhance(tuple(sorted(self.enhance_kwargs.items())))
        outs = []
        bs = self.max_chunk_batch
        for b0 in range(0, n, bs):
            block = chunks[b0 : b0 + bs]
            pad_rows = bs - block.shape[0]
            if pad_rows:
                block = jnp.pad(block, ((0, pad_rows), (0, 0)))
            out = fn(self.model, self.params, jax.random.fold_in(key, b0), block)
            # keep on device: no per-block host sync; blocks pipeline
            outs.append(out[: bs - pad_rows if pad_rows else bs])
        enhanced = jnp.concatenate(outs, axis=0)

        merged = merge_chunks(enhanced, starts, len(y_norm))
        return np.asarray(merged) * peak
