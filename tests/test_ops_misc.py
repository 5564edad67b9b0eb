"""pad_spec / normalize_noisy / resample / chunking invariants."""

import numpy as np
import pytest

from flowdec_tpu.ops import (
    extract_chunks,
    merge_chunks,
    normalize_noisy,
    pad_spec,
    plan_chunks,
    resample,
    unpad_spec,
)


def test_pad_spec_to_64():
    Y = np.ones((1, 768, 251), dtype=np.complex64)
    padded, orig = pad_spec(Y, mode="zero")
    assert padded.shape == (1, 768, 256)
    assert orig == 251
    assert np.all(np.asarray(padded)[..., 251:] == 0)
    np.testing.assert_array_equal(np.asarray(unpad_spec(padded, orig)), Y)

    already = np.ones((1, 768, 256), dtype=np.complex64)
    padded2, orig2 = pad_spec(already)
    assert padded2.shape == already.shape and orig2 == 256


def test_normalize_noisy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 1, 1000)).astype(np.float32) * 3.0
    x = rng.standard_normal((2, 1, 1000)).astype(np.float32)
    yn, xn, normfac = normalize_noisy(y, mode="noisy", x=x)
    assert np.allclose(np.max(np.abs(np.asarray(yn)), axis=(1, 2)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yn) * np.asarray(normfac), y, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xn) * np.asarray(normfac), x, atol=1e-5)


def test_normalize_noisy_silence_guard():
    y = np.zeros((1, 1, 100), dtype=np.float32)
    yn, _, normfac = normalize_noisy(y, mode="noisy")
    assert np.all(np.isfinite(np.asarray(yn)))
    assert np.asarray(normfac).item() == 1.0


def test_normalize_none():
    y = np.full((1, 10), 5.0, dtype=np.float32)
    yn, _, normfac = normalize_noisy(y, mode="none")
    np.testing.assert_array_equal(np.asarray(yn), y)


def test_resample_sine_tone():
    """A bandlimited tone must survive 48k→16k→48k with high fidelity."""
    sr_hi, sr_lo = 48000, 16000
    t = np.arange(sr_hi, dtype=np.float64) / sr_hi
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    lo = np.asarray(resample(x, sr_hi, sr_lo, lowpass_filter_width=64))
    assert lo.shape[-1] == sr_lo
    t_lo = np.arange(sr_lo) / sr_lo
    expect = np.sin(2 * np.pi * 440.0 * t_lo)
    # ignore filter-edge transients
    w = slice(1000, sr_lo - 1000)
    assert np.max(np.abs(lo[0, w] - expect[w])) < 1e-3

    back = np.asarray(resample(lo, sr_lo, sr_hi, lowpass_filter_width=64))
    assert back.shape[-1] == sr_hi
    w = slice(3000, sr_hi - 3000)
    assert np.max(np.abs(back[0, w] - x[0, w])) < 2e-3


def test_resample_441_to_48():
    """Non-trivial gcd pair: 44100→48000 (gcd 300: 147→160)."""
    sr0, sr1 = 44100, 48000
    t = np.arange(sr0, dtype=np.float64) / sr0
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    y = np.asarray(resample(x, sr0, sr1, lowpass_filter_width=64))
    assert y.shape[-1] == sr1
    expect = np.sin(2 * np.pi * 1000.0 * np.arange(sr1) / sr1)
    w = slice(2000, sr1 - 2000)
    assert np.max(np.abs(y[0, w] - expect[w])) < 2e-3


def test_resample_identity():
    x = np.ones((1, 100), dtype=np.float32)
    assert resample(x, 48000, 48000) is x


def test_chunking_roundtrip():
    rng = np.random.default_rng(0)
    length, chunk_len, overlap = 10_000, 4_096, 512
    x = rng.standard_normal((1, length)).astype(np.float32)
    starts, n = plan_chunks(length, chunk_len, overlap)
    chunks = extract_chunks(x, starts, chunk_len)
    assert chunks.shape == (n, 1, chunk_len)
    merged = np.asarray(merge_chunks(chunks, starts, length))
    np.testing.assert_allclose(merged, x, atol=1e-6)


def test_chunking_short_signal():
    x = np.ones((1, 100), dtype=np.float32)
    starts, n = plan_chunks(100, 4096, 512)
    assert n == 1
    chunks = extract_chunks(x, starts, 4096)
    assert chunks.shape == (1, 1, 4096)
    merged = np.asarray(merge_chunks(chunks, starts, 100))
    np.testing.assert_allclose(merged, x, atol=1e-6)
