#!/usr/bin/env python
"""Synthesize a paired (clean, coded) 48 kHz training corpus.

No audio corpus ships with this environment, so the training campaign uses
synthetic full-band audio with speech/music-like structure (harmonic stacks
with vibrato and envelopes, filtered-noise bursts, chirps, noise beds) and a
deterministic codec-like degradation for the "coded" side:

  1. band-limit (~12 kHz lowpass) — low-bitrate codecs discard highs,
  2. STFT magnitude quantization (coarse dB steps) — spectral holes /
     musical noise, the dominant artifact class FlowDec's postfilter targets,
  3. 6-bit mu-law requantization — broadband quantization noise.

This mirrors the role of the reference's NDAC-coded `y` side
(/root/reference/flowdec/data/data_module.py pairs clean x with coded y;
demo.ipynb cell 4 produces y via DAC encode/decode): a stochastic-postfilter
task whose conditional distribution is non-trivial but learnable at
small-corpus scale. Layout written:

    <out>/train/clean/*.wav + <out>/train/coded/*.wav   (+ valid/, test/)
    <out>/{train,valid,test}_pairs.txt                  (paired_filelist mode)

Usage:
    python scripts/make_corpus.py --out /tmp/corpus --train 2000 --valid 48
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowdec_tpu.data.wavio import write_wav  # noqa: E402

SR = 48000


def _envelope(rng, n, smooth=4800, attack_prob=0.5):
    """Smoothed positive random envelope with occasional sharp attacks."""
    e = rng.standard_normal(n // smooth + 2)
    e = np.repeat(e, smooth)[:n]
    k = np.hanning(smooth)
    e = np.convolve(e, k / k.sum(), mode="same")
    e = np.abs(e) + 0.05
    if rng.random() < attack_prob:
        pos = rng.integers(0, max(1, n - smooth))
        e[pos:] *= np.exp(-np.arange(n - pos) / (SR * rng.uniform(0.1, 0.5)))
        e[pos:pos + 480] *= np.linspace(3.0, 1.0, 480)
    return e / (np.abs(e).max() + 1e-9)


def _harmonic(rng, n):
    """Harmonic stack with random-walk f0 (vibrato) and 1/k^p partials."""
    f0 = rng.uniform(80.0, 500.0)
    drift = np.cumsum(rng.standard_normal(n)) / np.sqrt(n)
    vib = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(3, 7) *
                              np.arange(n) / SR) + 0.03 * drift
    phase = 2 * np.pi * np.cumsum(f0 * vib) / SR
    p = rng.uniform(0.5, 2.0)
    out = np.zeros(n)
    k_max = int(min(40, (SR / 2 - 1000) / f0))
    for k in range(1, max(2, k_max)):
        out += np.sin(k * phase + rng.uniform(0, 2 * np.pi)) / k ** p
    return out * _envelope(rng, n)


def _noise_burst(rng, n):
    """Band-filtered noise with a gated envelope (consonant / percussion)."""
    x = rng.standard_normal(n)
    lo = rng.uniform(200, 8000)
    hi = min(lo * rng.uniform(1.5, 8.0), 22000.0)
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1 / SR)
    X *= np.exp(-0.5 * ((np.log(f + 1) - np.log(np.sqrt(lo * hi)))
                        / (0.5 * np.log(hi / lo) + 1e-9)) ** 2)
    x = np.fft.irfft(X, n)
    return x / (np.abs(x).max() + 1e-9) * _envelope(rng, n, smooth=1200)


def _chirp(rng, n):
    f_a, f_b = rng.uniform(300, 4000), rng.uniform(1000, 16000)
    freq = np.geomspace(f_a, f_b, n)
    return np.sin(2 * np.pi * np.cumsum(freq) / SR) * _envelope(rng, n)


def synth_clean(rng, duration: float) -> np.ndarray:
    n = int(duration * SR)
    mix = np.zeros(n)
    for _ in range(rng.integers(1, 4)):
        mix += _harmonic(rng, n) * rng.uniform(0.4, 1.0)
    for _ in range(rng.integers(0, 3)):
        mix += _noise_burst(rng, n) * rng.uniform(0.1, 0.5)
    if rng.random() < 0.3:
        mix += _chirp(rng, n) * rng.uniform(0.1, 0.4)
    mix += rng.standard_normal(n) * rng.uniform(0.001, 0.01)  # noise bed
    mix = mix / (np.abs(mix).max() + 1e-9) * rng.uniform(0.25, 0.7)
    return mix.astype(np.float32)


def degrade(x: np.ndarray, rng) -> np.ndarray:
    """Deterministic-family codec-like degradation (fixed parameters)."""
    n = len(x)
    # 1. band-limit at 12 kHz
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1 / SR)
    X[f > 12000] = 0.0
    x = np.fft.irfft(X, n)

    # 2. STFT magnitude quantization (coarse 3 dB steps below a per-frame
    #    masking floor) — spectral holes + musical noise
    n_fft, hop = 1024, 256
    win = np.hanning(n_fft + 1)[:-1]
    pad = np.concatenate([np.zeros(n_fft // 2), x, np.zeros(n_fft)])
    frames = np.lib.stride_tricks.sliding_window_view(pad, n_fft)[::hop]
    S = np.fft.rfft(frames * win, axis=-1)
    mag = np.abs(S)
    ref = mag.max(axis=-1, keepdims=True) + 1e-9
    db = 20 * np.log10(mag / ref + 1e-9)
    db_q = np.round(db / 4.5) * 4.5
    db_q = np.where(db < -38.0, -120.0, db_q)  # kill below masking floor
    S = S * 10 ** ((db_q - db) / 20)
    # overlap-add resynthesis
    y = np.zeros(len(pad))
    wsum = np.zeros(len(pad))
    rec = np.fft.irfft(S, n_fft, axis=-1) * win
    for i in range(rec.shape[0]):
        y[i * hop:i * hop + n_fft] += rec[i]
        wsum[i * hop:i * hop + n_fft] += win ** 2
    y = (y / np.maximum(wsum, 1e-8))[n_fft // 2:n_fft // 2 + n]

    # 3. 6-bit mu-law requantization
    mu = 63.0
    peak = np.abs(y).max() + 1e-9
    z = y / peak
    comp = np.sign(z) * np.log1p(mu * np.abs(z)) / np.log1p(mu)
    comp = np.round(comp * mu) / mu
    y = np.sign(comp) * (np.expm1(np.abs(comp) * np.log1p(mu))) / mu * peak
    return y.astype(np.float32)


def make_split(out: str, split: str, count: int, seed: int, dur_range):
    cdir = os.path.join(out, split, "clean")
    ydir = os.path.join(out, split, "coded")
    os.makedirs(cdir, exist_ok=True)
    os.makedirs(ydir, exist_ok=True)
    pairs = []
    rng = np.random.default_rng(seed)
    for i in range(count):
        dur = rng.uniform(*dur_range)
        x = synth_clean(rng, dur)
        y = degrade(x, rng)
        name = f"{split}_{i:05d}.wav"
        write_wav(os.path.join(cdir, name), x, SR)
        write_wav(os.path.join(ydir, name), y, SR)
        pairs.append(f"{os.path.join(cdir, name)},{os.path.join(ydir, name)}")
    with open(os.path.join(out, f"{split}_pairs.txt"), "w") as fh:
        fh.write("\n".join(pairs) + "\n")
    print(f"{split}: {count} pairs")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=2000)
    p.add_argument("--valid", type=int, default=48)
    p.add_argument("--test", type=int, default=24)
    p.add_argument("--seed", type=int, default=302)
    args = p.parse_args(argv)

    make_split(args.out, "train", args.train, args.seed, (2.0, 2.2))
    make_split(args.out, "valid", args.valid, args.seed + 1, (2.0, 2.0))
    make_split(args.out, "test", args.test, args.seed + 2, (2.0, 2.0))


if __name__ == "__main__":
    main()
