"""Misc audio/statistics helpers.

Capability parity with /root/reference/flowdec/util/other.py's grab-bag:
load48000 (:137-162), mean_conf_int (:85-101), batch_broadcast (:119-134).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.stats

__all__ = ["load_audio", "load48000", "mean_conf_int", "batch_broadcast"]


def load_audio(path: str, target_sr: int) -> np.ndarray:
    """Load any supported audio file as mono float32 (1, samples) at target_sr
    (high-quality polyphase resampling, lowpass_filter_width=256 like the
    reference's load48000)."""
    from flowdec_tpu.data.dataset import resample_np
    from flowdec_tpu.data.wavio import read_wav

    x, sr = read_wav(path)
    if x.shape[0] > 1:
        x = np.mean(x, axis=0, keepdims=True)
    if sr != target_sr:
        x = resample_np(x, sr, target_sr, lowpass_filter_width=256)
    return x.astype(np.float32)


def load48000(path: str) -> Optional[np.ndarray]:
    """48 kHz loader returning (1, 1, samples) like the reference (or None on
    failure — it logs-and-continues, util/other.py:160-162)."""
    try:
        return load_audio(path, 48000)[None]
    except Exception:
        print("FAILED loading", path)
        return None


def mean_conf_int(data, confidence: float = 0.95) -> Tuple[float, float]:
    """(mean, half-width of the t confidence interval)."""
    a = 1.0 * np.asarray(data)
    n = len(a)
    m, se = np.mean(a), scipy.stats.sem(a)
    h = se * scipy.stats.t.ppf((1 + confidence) / 2.0, n - 1)
    return float(m), float(h)


def batch_broadcast(a, x):
    """Broadcast a per-sample vector over all non-batch dims of x."""
    a = np.asarray(a)
    if a.ndim != 1:
        a = a.squeeze()
        if a.ndim != 1:
            raise ValueError(
                f"Cannot batch-broadcast array with effective ndim > 1 (shape {a.shape})"
            )
    if a.shape[0] != x.shape[0] and a.shape[0] != 1:
        raise ValueError(
            f"Cannot batch-broadcast shape {a.shape} over {x.shape}: batch mismatch"
        )
    return a.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
