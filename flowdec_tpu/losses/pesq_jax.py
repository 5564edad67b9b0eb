"""Differentiable PESQ surrogate in pure JAX.

Capability parity with the reference's TorchPESQSpeechLoss
(/root/reference/flowdec/losses.py:14-37), which delegates to the external
`torch_pesq` package so PESQ can act as a TRAINING loss. That package is a
perceptual re-implementation of ITU-T P.862, not the scored metric; this
module takes the same approach natively in JAX so the loss can live INSIDE
the jitted finetune step (losses/pesq.py's torch wrapper round-trips through
host memory and returns a Python float — eval-only by construction).

Perceptual model (P.862-shaped, simplified where the full standard is
non-differentiable or irrelevant for a gradient signal):

  1. resample to 16 kHz (anti-aliased polyphase FIR, differentiable),
  2. 32 ms / 50 % Hann STFT power spectra,
  3. 49-band Bark-warped filterbank  (z = 13·atan(7.6e-4 f) + 3.5·atan((f/7500)²)),
  4. Zwicker loudness  S = Sl·(P0/0.5)^0.23 · [(0.5 + 0.5·P/P0)^0.23 − 1]
     with a Terhardt absolute-threshold curve for P0,
  5. masked disturbance  d = max(|Lx − Ly| − 0.25·min(Lx, Ly), 0),
     plus an asymmetry factor ((Py+c)/(Px+c))^1.2 (clipped) that penalizes
     ADDED distortion more than removed signal, as PESQ does,
  6. L6-over-syllables → L2-over-time pooling of Bark-L2 frame disturbances,
  7. loss = 0.1·D_sym + 0.0309·D_asym  (the P.862 MOS regression slope, so
     the loss reads as "MOS points lost"), clamped at 10 like the reference.

This is a SURROGATE: it tracks PESQ's structure and is monotone in the
distortions PESQ penalizes (validated in tests/test_codec_losses.py), but it
is not the ITU scorer — use eval/metrics.py's PESQ wrapper for reporting.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PesqSurrogateLoss"]


def _design_lowpass(num_taps: int, cutoff: float) -> np.ndarray:
    """Windowed-sinc FIR lowpass (cutoff in normalized Nyquist units)."""
    n = np.arange(num_taps) - (num_taps - 1) / 2
    h = np.sinc(cutoff * n) * cutoff
    h *= np.hanning(num_taps)
    return (h / h.sum()).astype(np.float32)


def _resample_fir(x: jax.Array, up: int, down: int, taps: np.ndarray) -> jax.Array:
    """Differentiable rational resampling: zero-stuff by `up`, FIR, take
    every `down`-th sample (the upfirdn decomposition, cf. ops/upfirdn.py)."""
    if up == 1 and down == 1:
        return x
    b = x.shape[0]
    k = jnp.asarray(taps * up, x.dtype).reshape(1, 1, -1)
    pad = (len(taps) - 1) // 2
    out = jax.lax.conv_general_dilated(
        x[:, None, :], k, window_strides=(down,), padding=[(pad, pad)],
        lhs_dilation=(up,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


def _bark_filterbank(sr: int, n_fft: int, n_bands: int) -> np.ndarray:
    """(n_bands, n_bins) Bark-warped filterbank, rows normalized to sum 1."""
    freqs = np.linspace(0.0, sr / 2, n_fft // 2 + 1)

    def z(f):
        return 13.0 * np.arctan(7.6e-4 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)

    z_bins = z(freqs)
    edges = np.linspace(z_bins[1], z_bins[-1], n_bands + 1)
    fb = np.zeros((n_bands, len(freqs)), np.float32)
    for i in range(n_bands):
        lo, hi = edges[i], edges[i + 1]
        w = np.clip((z_bins - lo) / max(hi - lo, 1e-6), 0.0, 1.0) * \
            np.clip((hi - z_bins) / max(hi - lo, 1e-6), 0.0, 1.0) * 4.0
        w = np.minimum(w, 1.0)
        if w.sum() <= 0:  # guarantee coverage for narrow high bands
            w[np.argmin(np.abs(z_bins - (lo + hi) / 2))] = 1.0
        fb[i] = w / w.sum()
    return fb


def _terhardt_threshold_db(freqs_hz: np.ndarray) -> np.ndarray:
    """Absolute hearing threshold (dB SPL), Terhardt's approximation."""
    f = np.maximum(freqs_hz, 20.0) / 1000.0
    return (3.64 * f ** -0.8
            - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
            + 1e-3 * f ** 4).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class PesqSurrogateLoss:
    """Differentiable PESQ-shaped loss on (x_hat, x) waveforms at any sr.

    Speech-only by contract (reference losses.py:15): carries
    `only_applies_to = ['speech']` so finetune_loss gates it by audiotype.
    """

    sampling_rate: int
    n_fft: int = 512           # 32 ms at 16 kHz
    hop: int = 256
    n_bands: int = 49
    syllable_frames: int = 20  # P.862 pools |d| with p=6 inside ~320 ms spans
    max_loss: float = 10.0     # reference clamps at 10 (losses.py:35)

    only_applies_to = ("speech",)

    def __repr__(self):
        return f"PesqSurrogateLoss(sr={self.sampling_rate})"

    @functools.cached_property
    def _static(self):
        sr = self.sampling_rate
        g = int(np.gcd(sr, 16000))
        up, down = 16000 // g, sr // g
        taps = _design_lowpass(16 * max(up, down) + 1,
                               min(1.0 / up, 1.0 / down) * 0.9)
        fb = _bark_filterbank(16000, self.n_fft, self.n_bands)
        centers_z = np.linspace(0, 1, self.n_bands)
        freqs = np.linspace(0, 8000, self.n_fft // 2 + 1)
        band_center_hz = fb @ freqs
        thr_db = _terhardt_threshold_db(band_center_hz)
        # map digital full-scale to ~90 dB SPL so nominal speech (~-26 dBov)
        # sits at a conversational ~64 dB level
        p0 = (10.0 ** ((thr_db - 90.0) / 10.0)).astype(np.float32)
        win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(self.n_fft)
                                  / self.n_fft)).astype(np.float32)
        del centers_z
        return up, down, taps, jnp.asarray(fb), jnp.asarray(p0), jnp.asarray(win)

    # --- perceptual transform ---

    def _bark_power(self, x: jax.Array) -> jax.Array:
        """(B, T) 16 kHz waveform → (B, frames, n_bands) Bark power."""
        up, down, taps, fb, _p0, win = self._static
        n, h = self.n_fft, self.hop
        pad = jnp.pad(x, ((0, 0), (n // 2, n)))
        idx = jnp.arange(0, pad.shape[-1] - n + 1, h)
        frames = pad[:, idx[:, None] + jnp.arange(n)[None, :]] * win
        spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        power = jnp.square(jnp.abs(spec)) / (n * n / 4)
        return power @ fb.T

    def _loudness(self, pb: jax.Array) -> jax.Array:
        """Zwicker sone transform per Bark band."""
        p0 = self._static[4]
        sl = 2.0  # global loudness scale (absorbed calibration constant)
        return (sl * jnp.power(p0 / 0.5, 0.23)
                * (jnp.power(0.5 + 0.5 * pb / p0, 0.23) - 1.0))

    def __call__(self, x_hat: jax.Array, x: jax.Array) -> jax.Array:
        up, down, taps, *_ = self._static
        x_hat = x_hat.reshape(-1, x_hat.shape[-1])
        x = x.reshape(-1, x.shape[-1])

        # level alignment: one gain from the REFERENCE, applied to both, so
        # pure gain errors in x_hat still register as disturbance
        gain = 0.05 / (jnp.sqrt(jnp.mean(jnp.square(x), axis=-1,
                                         keepdims=True)) + 1e-8)
        x = x * gain
        x_hat = x_hat * gain

        x16 = _resample_fir(x, up, down, taps)
        y16 = _resample_fir(x_hat, up, down, taps)

        px = self._bark_power(x16)
        py = self._bark_power(y16)
        lx = self._loudness(px)
        ly = self._loudness(py)

        # masked symmetric disturbance (P.862 §10.2: 25 % of the smaller
        # loudness masks the difference)
        mask = 0.25 * jnp.minimum(lx, ly)
        d = jax.nn.relu(jnp.abs(ly - lx) - mask)

        # asymmetry factor: additions (codec noise) weigh more than omissions
        af = jnp.power((py + 50.0) / (px + 50.0), 1.2)
        af = jnp.where(af < 3.0, 0.0, jnp.minimum(af, 12.0))

        # eps inside every fractional root: d can be exactly 0 (fully masked
        # frames) where x^(1/6) and sqrt have infinite slope → NaN gradients
        eps = 1e-12
        d_frame = jnp.sqrt(jnp.sum(jnp.square(d), axis=-1) + eps)  # (B, F)
        da_frame = jnp.sum(d * af, axis=-1)

        def pool(f):  # L6 inside syllables → L2 across syllables
            nf = f.shape[-1]
            s = self.syllable_frames
            n_syl = (nf + s - 1) // s
            f = jnp.pad(f, ((0, 0), (0, n_syl * s - nf)))
            # eps scaled to the root's power so the loss floor stays ~1e-6
            syl = (jnp.mean(jnp.power(f.reshape(f.shape[0], n_syl, s), 6.0),
                            axis=-1) + 1e-36) ** (1.0 / 6.0)
            return jnp.sqrt(jnp.mean(jnp.square(syl), axis=-1) + eps)

        d_sym = pool(d_frame)
        d_asym = pool(da_frame)

        # P.862 raw-MOS regression slopes: loss reads as MOS points lost
        loss = 0.1 * d_sym + 0.0309 * d_asym
        return jnp.mean(jnp.minimum(loss, self.max_loss))
