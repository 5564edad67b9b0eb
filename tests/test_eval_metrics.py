"""Eval metric tests: SI-SXR identities, LogSpecMSE vs torch, SNRseg behavior,
the row/DataFrame harness with NaN-on-exception, and audiotype routing."""

import numpy as np
import pytest
import torch

from flowdec_tpu.eval.metrics import (
    FWSNRseg,
    LogSpecMSE,
    Metric,
    SISXR,
    SNRseg,
    get_audiotype_from_basename,
    get_metrics_df,
    get_metrics_row,
    si_sxr_components,
    visqol_mode_heuristic,
)

SR = 16000


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SR).astype(np.float32) * 0.1
    n = rng.standard_normal(SR).astype(np.float32) * 0.02
    y = x + n
    x_hat = x + 0.3 * n
    return x_hat, x, y


def test_si_sxr_decomposition(audio):
    x_hat, x, y = audio
    n = y - x
    s_target, e_noise, e_art = si_sxr_components(x_hat, x, n)
    # the decomposition always reconstructs the estimate exactly
    np.testing.assert_allclose(s_target + e_noise + e_art, x_hat, atol=1e-5)

    # with s ⊥ n and x_hat ∈ span{s, n}, the artifact term vanishes and the
    # projections recover the mixing coefficients exactly
    n_orth = n - (np.dot(n, x) / np.dot(x, x)) * x
    x_hat2 = 1.0 * x + 0.3 * n_orth
    s_t2, e_n2, e_a2 = si_sxr_components(x_hat2, x, n_orth)
    assert np.linalg.norm(e_a2) < 1e-4 * np.linalg.norm(x_hat2)
    np.testing.assert_allclose(s_t2, x, atol=1e-5)
    np.testing.assert_allclose(e_n2, 0.3 * n_orth, atol=1e-5)


def test_sisxr_values(audio):
    x_hat, x, y = audio
    sdr, sir, sar = SISXR(SR)(x_hat, x, y)
    # estimate is closer to x than y is
    sdr_y, _, _ = SISXR(SR)(y, x, y)
    assert sdr > sdr_y
    # perfect estimate → huge SDR
    sdr_perfect, _, _ = SISXR(SR)(x, x, y)
    assert sdr_perfect > 50


def test_sisxr_phase_flip_correction(audio):
    """If y is phase-flipped relative to x, n must be computed as y + x."""
    x_hat, x, _ = audio
    y_flipped = -x + 0.02 * np.random.default_rng(1).standard_normal(SR).astype(np.float32)
    sdr, sir, sar = SISXR(SR)(x_hat, x, y_flipped)
    assert np.isfinite(sdr) and np.isfinite(sir)


def test_logspec_mse_matches_torch(audio):
    x_hat, x, _ = audio
    ours = LogSpecMSE(SR)(x_hat, x)

    # torch reference computed inline (no torchaudio available):
    n_fft, hop = int(0.032 * SR), int(0.008 * SR)
    window = torch.signal.windows.hann(n_fft)

    def pspec(sig):
        X = torch.stft(torch.from_numpy(sig), n_fft=n_fft, hop_length=hop,
                       window=window, center=True, return_complex=True)
        return (X.abs() ** 2)

    sh, s = pspec(x_hat), pspec(x)
    ls_hat = 10 * torch.log10(torch.clamp(sh, min=1e-8))
    ls = 10 * torch.log10(torch.clamp(s, min=1e-8))
    theirs = float(torch.mean((ls - ls_hat) ** 2))
    assert abs(ours - theirs) / theirs < 0.02


def test_logspec_mse_zero_for_identical(audio):
    _, x, _ = audio
    assert LogSpecMSE(SR)(x, x) < 1e-10


def test_snrseg(audio):
    x_hat, x, _ = audio
    m = SNRseg(SR)
    perfect = m(x, x)
    assert perfect == 35.0  # clamped at the top
    noisy = m(x_hat, x)
    assert -10 <= noisy <= 35
    silent = m(np.zeros(SR, np.float32), x)
    assert silent <= noisy


def test_fwsnrseg(audio):
    x_hat, x, _ = audio
    m = FWSNRseg(SR)
    perfect = m(x, x)
    assert perfect == 35.0
    noisy = m(x_hat, x)
    worse = m(x_hat + 0.1 * np.random.default_rng(2).standard_normal(SR).astype(np.float32), x)
    assert worse < noisy <= 35


def test_get_metrics_row_exception_to_nan(audio):
    x_hat, x, y = audio

    class Broken(Metric):
        names = ["broken"]

        def __call__(self, *a, **k):
            raise RuntimeError("boom")

    row = get_metrics_row([SISXR(SR), Broken(SR)], "speech_0.wav", x_hat, x, y)
    assert np.isfinite(row["sisdr"])
    assert np.isnan(row["broken"])


def test_namefilter_gating(audio):
    x_hat, x, y = audio
    row = get_metrics_row([(SISXR(SR), "speech")], "music_0.wav", x_hat, x, y)
    assert np.isnan(row["sisdr"])
    row2 = get_metrics_row([(SISXR(SR), "speech")], "speech_0.wav", x_hat, x, y)
    assert np.isfinite(row2["sisdr"])


def test_metrics_df(audio):
    x_hat, x, y = audio
    df = get_metrics_df([x_hat, y], [x, x], [y, y], [SISXR(SR)],
                        names=["a.wav", "b.wav"])
    assert list(df["name"]) == ["a.wav", "b.wav"]
    assert df["sisdr"][0] > df["sisdr"][1]


def test_audiotype_heuristic():
    assert get_audiotype_from_basename("speech_123.wav") == "speech"
    assert get_audiotype_from_basename("train_set_music_x.wav") == "music"
    assert get_audiotype_from_basename("whatever.wav") is None
    assert visqol_mode_heuristic("speech_1.wav") == "speech"
    assert visqol_mode_heuristic("music_1.wav") == "audio"
    assert visqol_mode_heuristic("zzz.wav") is None


def test_gated_metrics_raise_cleanly():
    """External-runtime metrics must fail at construction with ImportError-ish
    errors when their runtime is absent (then degrade to NaN rows upstream)."""
    from flowdec_tpu.eval.metrics import DNSMOS, ESTOI, PESQ, SIGMOS

    for cls in (PESQ, ESTOI, DNSMOS, SIGMOS):
        with pytest.raises(Exception):
            cls(SR)
