"""STFT/ISTFT parity vs torch.stft/istft and round-trip invariants.

These encode the reference's (untested) numerical contract: the feature
extractor must be exactly invertible (feature_extractors.py:22) and its STFT
must match torch.stft(center=True, onesided=True) with a symmetric Hann window
of length n_fft=1534 (a non-power-of-2 FFT size).
"""

import numpy as np
import pytest
import torch

from flowdec_tpu.ops import StftConfig, hann_window, istft, stft
from flowdec_tpu.ops.compression import compress, decompress

N_FFT = 1534
HOP = 384  # ceil(1534 / 4)
SR = 48000


def _torch_stft(x: np.ndarray) -> np.ndarray:
    window = torch.signal.windows.hann(N_FFT)  # symmetric, as the reference uses
    X = torch.stft(
        torch.from_numpy(x),
        n_fft=N_FFT,
        hop_length=HOP,
        window=window,
        center=True,
        onesided=True,
        return_complex=True,
    )
    return X.numpy()


def _torch_istft(X: np.ndarray, length: int) -> np.ndarray:
    window = torch.signal.windows.hann(N_FFT)
    x = torch.istft(
        torch.from_numpy(X),
        n_fft=N_FFT,
        hop_length=HOP,
        window=window,
        center=True,
        onesided=True,
        length=length,
    )
    return x.numpy()


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 96000)).astype(np.float32)  # 2 s @ 48 kHz


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(N_FFT))
    theirs = torch.signal.windows.hann(N_FFT).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_stft_matches_torch(signal, method):
    window = hann_window(N_FFT)
    ours = np.asarray(stft(signal, window, hop_length=HOP, method=method))
    theirs = _torch_stft(signal)
    assert ours.shape == theirs.shape == (2, 768, 251)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_istft_matches_torch(signal, method):
    X = _torch_stft(signal)
    window = hann_window(N_FFT)
    ours = np.asarray(
        istft(X, window, hop_length=HOP, length=signal.shape[-1], method=method)
    )
    theirs = _torch_istft(X, signal.shape[-1])
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_roundtrip_exact(signal, method):
    window = hann_window(N_FFT)
    X = stft(signal, window, hop_length=HOP, method=method)
    x = istft(X, window, hop_length=HOP, length=signal.shape[-1], method=method)
    np.testing.assert_allclose(np.asarray(x), signal, atol=1e-4)


def test_odd_length_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 48001)).astype(np.float32)
    window = hann_window(N_FFT)
    X = stft(x, window, hop_length=HOP)
    out = istft(X, window, hop_length=HOP, length=x.shape[-1])
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)
    theirs = _torch_stft(x)
    np.testing.assert_allclose(np.asarray(X), theirs, atol=2e-4)


def test_compression_roundtrip(signal):
    window = hann_window(N_FFT)
    X = np.asarray(stft(signal, window, hop_length=HOP))
    C = compress(X, alpha=0.3, beta=0.33)
    # magnitudes compressed, phase preserved
    np.testing.assert_allclose(
        np.abs(np.asarray(C)), 0.33 * np.abs(X) ** 0.3, atol=1e-5
    )
    back = np.asarray(decompress(np.asarray(C), alpha=0.3, beta=0.33))
    np.testing.assert_allclose(back, X, atol=1e-3)


def test_compression_zero_guard():
    X = np.zeros((4, 4), dtype=np.complex64)
    C = np.asarray(compress(X, alpha=0.3, beta=0.33))
    assert np.all(np.isfinite(C)) and np.all(C == 0)
    D = np.asarray(decompress(C, alpha=0.3, beta=0.33))
    assert np.all(np.isfinite(D)) and np.all(D == 0)


def test_stft_config():
    cfg = StftConfig(n_fft=N_FFT, sampling_rate=SR, n_hops=4)
    assert cfg.hop == HOP
    assert cfg.n_bins == 768
    assert cfg.num_frames(96000) == 251
    with pytest.raises(ValueError):
        StftConfig(n_fft=N_FFT, sampling_rate=SR)
    with pytest.raises(ValueError):
        StftConfig(n_fft=N_FFT, sampling_rate=SR, hop_length=384, n_hops=4)
