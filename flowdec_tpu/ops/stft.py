"""Invertible STFT/ISTFT as pure JAX functions, exact to torch.stft semantics.

Reference behavior being matched (see /root/reference/flowdec/data/
feature_extractors.py:62-109): center=True (reflect padding of n_fft//2),
onesided spectra, window length == n_fft, istft with overlap-add normalized by
the squared-window envelope and cropped to ``length``.

TPU-first design notes:
  * Spectra are produced in the cpair representation — real arrays
    (..., F, T, 2) with a trailing (re, im) axis — because TPUs have no
    complex ALU (see ops/cpair.py). `stft`/`istft` complex wrappers exist for
    host-side/test convenience.
  * FlowDec's n_fft is 1534 — NOT a power of two (768 onesided bins, chosen so
    the U-Net sees a 768-tall image). Non-pow2 FFTs can hit slow paths on TPU,
    so the default implementation is a *matmul DFT*: framing → one
    (frames × n_fft) @ (n_fft × n_bins) matmul per real/imag part, which maps
    straight onto the MXU and fuses with the window multiply. `method="fft"`
    uses jnp.fft.rfft instead (exact; CPU-only since it yields complex).
  * Overlap-add is expressed as K=ceil(n_fft/hop) shifted block adds (static
    Python loop, fully vectorized) instead of scatter-adds, so XLA sees only
    dense slicing and additions.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "get_window",
    "stft_pair",
    "istft_pair",
    "stft",
    "istft",
    "StftConfig",
]

# Matmul-DFT runs in f32 on the MXU; HIGHEST keeps ~f32 accuracy on TPU
# (3-pass bf16) which the invertibility contract requires.
_DFT_PRECISION = jax.lax.Precision.HIGHEST


def hann_window(n: int, *, sym: bool = True, dtype=jnp.float32) -> jax.Array:
    """Symmetric (default) or periodic Hann window.

    Matches torch.signal.windows.hann(n) which is *symmetric* by default —
    this is what the reference uses for its window (feature_extractors.py:73-75),
    unlike torch.hann_window whose default is periodic.
    """
    if n == 1:
        return jnp.ones((1,), dtype=dtype)
    denom = (n - 1) if sym else n
    k = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / denom)
    return jnp.asarray(w, dtype=dtype)


_WINDOW_FNS = {
    "hann": hann_window,
}


def get_window(name: str, n: int, dtype=jnp.float32) -> jax.Array:
    """Look up a window function by name (reference: torch.signal.windows.<name>)."""
    try:
        fn = _WINDOW_FNS[name]
    except KeyError as e:
        raise ValueError(f"Unknown window {name!r}; known: {sorted(_WINDOW_FNS)}") from e
    return fn(n, dtype=dtype)


def _n_frames(length: int, n_fft: int, hop: int, center: bool) -> int:
    padded = length + (n_fft // 2) * 2 if center else length
    return 1 + (padded - n_fft) // hop


@functools.lru_cache(maxsize=8)
def _frame_indices(n_fft: int, hop: int, n_frames: int) -> np.ndarray:
    starts = np.arange(n_frames) * hop
    return starts[:, None] + np.arange(n_fft)[None, :]


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int, dtype_name: str):
    """Real/imag onesided DFT matrices of shape (n_fft, n_bins), as NUMPY
    arrays (never cache jnp arrays: inside a jit trace they are tracer-bound
    constants and caching them across traces leaks).

    X[k] = sum_n x[n] e^{-2πi kn/N}  →  re = x @ C, im = -(x @ S).
    Built in float64 then cast, so matrix accuracy isn't the bottleneck.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * n * k / n_fft
    dtype = np.dtype(dtype_name)
    return np.cos(theta).astype(dtype), np.sin(theta).astype(dtype)


@functools.lru_cache(maxsize=8)
def _idft_matrices(n_fft: int, dtype_name: str):
    """Onesided inverse-DFT matrices of shape (n_bins, n_fft), as numpy.

    x[n] = (1/N) Σ_k w_k (Re X_k cosθ - Im X_k sinθ), w_0 = w_{N/2} = 1 else 2
    (hermitian fold for even N; for odd N only k=0 has weight 1).
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    dtype = np.dtype(dtype_name)
    cos_m = (np.cos(theta) * w / n_fft).astype(dtype)
    sin_m = (np.sin(theta) * w / n_fft).astype(dtype)
    return cos_m, sin_m


def _resolve_method(method: str) -> str:
    if method != "auto":
        return method
    platform = jax.default_backend()
    # Matmul-DFT rides the MXU; on CPU the pocketfft path is faster/exact.
    # (On TPU it is also the only option: complex dtypes are unsupported.)
    return "fft" if platform == "cpu" else "matmul"


def stft_pair(
    x: jax.Array,
    window: jax.Array,
    *,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
    method: str = "auto",
) -> jax.Array:
    """Onesided STFT of a real signal, in cpair representation.

    Args:
        x: real signal, shape (..., length).
        window: window of length n_fft (win_length == n_fft, as in the reference).
        hop_length: frame hop.
        center: reflect-pad by n_fft//2 on both sides (torch.stft center=True).
        pad_mode: padding mode for center padding.
        method: "matmul" (MXU DFT), "fft" (jnp.fft.rfft; complex intermediate,
            CPU only), or "auto".

    Returns:
        (..., n_bins, n_frames, 2) — frequency-first layout matching
        torch.stft, with a trailing (re, im) axis.
    """
    n_fft = window.shape[0]
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = _frame_indices(n_fft, hop_length, n_frames)
    frames = x[..., idx]  # (..., n_frames, n_fft)
    frames = frames * window  # broadcast over trailing n_fft

    method = _resolve_method(method)
    if method == "fft":
        # XLA's RFFT is f32/f64-only; for reduced-precision inputs (the
        # cast_preprocess serving path on CPU) compute in f32, round back
        in_dtype = frames.dtype
        if in_dtype not in (jnp.float32, jnp.float64):
            frames = frames.astype(jnp.float32)
        spec = jnp.fft.rfft(frames, axis=-1)  # (..., n_frames, n_bins)
        pair = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        pair = pair.astype(in_dtype)
    elif method == "matmul":
        cos_m, sin_m = _dft_matrices(n_fft, str(frames.dtype))
        re = jnp.matmul(frames, cos_m, precision=_DFT_PRECISION)
        im = -jnp.matmul(frames, sin_m, precision=_DFT_PRECISION)
        pair = jnp.stack([re, im], axis=-1)  # (..., n_frames, n_bins, 2)
    else:
        raise ValueError(f"Unknown stft method {method!r}")
    return jnp.swapaxes(pair, -2, -3)  # (..., n_bins, n_frames, 2)


def _overlap_add(frames: jax.Array, hop: int, out_length: int) -> jax.Array:
    """Overlap-add frames (..., n_frames, n_fft) with the given hop.

    Implemented as K=ceil(n_fft/hop) shifted dense adds (no scatter):
    pad each frame to K*hop, view as K hop-sized chunks, and add chunk k of
    frame t into output block (t + k).
    """
    *batch, n_frames, n_fft = frames.shape
    k_blocks = -(-n_fft // hop)  # ceil
    pad_tail = k_blocks * hop - n_fft
    if pad_tail:
        frames = jnp.pad(frames, [(0, 0)] * (len(batch) + 1) + [(0, pad_tail)])
    chunks = frames.reshape(*batch, n_frames, k_blocks, hop)
    n_blocks = n_frames + k_blocks - 1
    out = jnp.zeros((*batch, n_blocks, hop), dtype=frames.dtype)
    for k in range(k_blocks):
        out = out.at[..., k : k + n_frames, :].add(chunks[..., :, k, :])
    out = out.reshape(*batch, n_blocks * hop)
    return out[..., :out_length]


def istft_pair(
    spec: jax.Array,
    window: jax.Array,
    *,
    hop_length: int,
    center: bool = True,
    length: Optional[int] = None,
    method: str = "auto",
) -> jax.Array:
    """Inverse of :func:`stft_pair`, matching torch.istft semantics.

    Args:
        spec: cpair spectrogram (..., n_bins, n_frames, 2).
        window: synthesis window (same as analysis), length n_fft.
        hop_length: frame hop.
        center: whether the forward STFT used center padding.
        length: target output length (torch.istft `length=`); if None, inferred.

    Returns:
        Real signal of shape (..., length).
    """
    n_fft = window.shape[0]
    n_frames = spec.shape[-2]
    spec = jnp.swapaxes(spec, -2, -3)  # (..., n_frames, n_bins, 2)
    re, im = spec[..., 0], spec[..., 1]

    method = _resolve_method(method)
    if method == "fft":
        in_dtype = re.dtype
        if in_dtype not in (jnp.float32, jnp.float64):
            re, im = re.astype(jnp.float32), im.astype(jnp.float32)
        frames = jnp.fft.irfft(jax.lax.complex(re, im), n=n_fft, axis=-1)
        frames = frames.astype(in_dtype)
    elif method == "matmul":
        cos_m, sin_m = _idft_matrices(n_fft, str(re.dtype))
        frames = jnp.matmul(re, cos_m, precision=_DFT_PRECISION) - jnp.matmul(
            im, sin_m, precision=_DFT_PRECISION
        )
    else:
        raise ValueError(f"Unknown istft method {method!r}")

    frames = frames * window
    full_length = n_fft + (n_frames - 1) * hop_length
    signal = _overlap_add(frames, hop_length, full_length)

    # Normalize by the squared-window overlap-add envelope (COLA normalization).
    win_sq = (window * window)[None, :]
    envelope = _overlap_add(
        jnp.broadcast_to(win_sq, (n_frames, n_fft)), hop_length, full_length
    )
    # torch.istft guards against division by ~0 bins (NOLA check); we clamp.
    envelope = jnp.where(envelope > 1e-11, envelope, 1.0)
    signal = signal / envelope

    if center:
        pad = n_fft // 2
        signal = signal[..., pad:]
        if length is None:
            signal = signal[..., : full_length - 2 * pad]
        else:
            signal = signal[..., :length]
    elif length is not None:
        signal = signal[..., :length]
    return signal


def stft(x, window, *, hop_length, center=True, pad_mode="reflect", method="auto"):
    """Complex-output wrapper over :func:`stft_pair` (host/test convenience)."""
    p = stft_pair(
        x, window, hop_length=hop_length, center=center, pad_mode=pad_mode, method=method
    )
    return jax.lax.complex(p[..., 0], p[..., 1])


def istft(spec, window, *, hop_length, center=True, length=None, method="auto"):
    """Complex-input wrapper over :func:`istft_pair` (host/test convenience)."""
    p = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return istft_pair(
        p, window, hop_length=hop_length, center=center, length=length, method=method
    )


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """Static STFT geometry, the moral equivalent of the reference's ComplexSTFT ctor.

    Exactly one of hop_length / n_hops must be set; n_hops converts as
    hop = ceil(n_fft / n_hops) (feature_extractors.py:70).
    """

    n_fft: int
    sampling_rate: int
    window_fn: str = "hann"
    hop_length: Optional[int] = None
    n_hops: Optional[int] = None
    center: bool = True

    def __post_init__(self):
        if (self.hop_length is None) == (self.n_hops is None):
            raise ValueError("Exactly one of {hop_length, n_hops} must be specified!")

    @property
    def hop(self) -> int:
        if self.hop_length is not None:
            return self.hop_length
        return int(math.ceil(self.n_fft / self.n_hops))

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def window(self, dtype=jnp.float32) -> jax.Array:
        return get_window(self.window_fn, self.n_fft, dtype=dtype)

    def num_frames(self, length: int) -> int:
        return _n_frames(length, self.n_fft, self.hop, self.center)
