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

    for cls in (PESQ, DNSMOS, SIGMOS):
        with pytest.raises(Exception):
            cls(SR)
    # ESTOI now has a native backend and must CONSTRUCT without pystoi;
    # backend='pystoi' still raises cleanly when the package is absent
    ESTOI(SR)
    with pytest.raises(ImportError):
        ESTOI(SR, backend="pystoi")


# ---------------------------------------------------------------------------
# Mocked-runtime contracts: the external-runtime wrappers' behavior is PINNED
# with fake runtimes — happy path produces floats, call-time runtime failures
# degrade to NaN rows via get_metrics_row (VERDICT: contract-test the
# degradation paths rather than assuming them).
# ---------------------------------------------------------------------------


def _fake_module(name, **attrs):
    import types

    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def test_pesq_estoi_dnsmos_with_mocked_runtimes(audio, monkeypatch):
    import sys

    x_hat, x, y = audio
    monkeypatch.setitem(sys.modules, "pesq",
                        _fake_module("pesq", pesq=lambda sr, ref, deg, mode: 3.21))
    monkeypatch.setitem(sys.modules, "pystoi",
                        _fake_module("pystoi", stoi=lambda ref, deg, sr, extended: 0.87))
    monkeypatch.setitem(
        sys.modules, "speechmos",
        _fake_module("speechmos", dnsmos=_fake_module(
            "speechmos.dnsmos",
            run=lambda a, sr: {"ovrl_mos": 2.5, "sig_mos": 3.0,
                               "bak_mos": 3.5, "p808_mos": 2.8})))

    from flowdec_tpu.eval.metrics import DNSMOS, ESTOI, PESQ

    row = get_metrics_row([PESQ(SR), ESTOI(SR), DNSMOS(SR)],
                          "speech_0.wav", x_hat, x, y)
    assert row["pesq"] == pytest.approx(3.21)
    assert row["estoi"] == pytest.approx(0.87)
    assert row["ovrl_mos"] == pytest.approx(2.5)
    assert row["p808_mos"] == pytest.approx(2.8)


def test_mocked_runtime_call_failure_degrades_to_nan(audio, monkeypatch):
    """A runtime that constructs fine but explodes at call time (the realistic
    failure: bad license file, missing model asset, OOM) must yield NaN for
    ITS columns while other metrics still report."""
    import sys

    def boom(*a, **k):
        raise OSError("runtime exploded")

    monkeypatch.setitem(sys.modules, "pesq", _fake_module("pesq", pesq=boom))
    x_hat, x, y = audio

    from flowdec_tpu.eval.metrics import PESQ

    row = get_metrics_row([PESQ(SR), SISXR(SR)], "speech_0.wav", x_hat, x, y)
    assert np.isnan(row["pesq"])
    assert np.isfinite(row["sisdr"])


def test_sigmos_with_mocked_onnxruntime(audio, monkeypatch, tmp_path):
    """SigMOS feature pipeline runs for real; only the ONNX session is faked
    (the .onnx weights are not distributed — same as the reference,
    /root/reference/flowdec/eval/sigmos/sigmos.py:58)."""
    import sys

    captured = {}

    class FakeSession:
        def __init__(self, path, opts, providers):
            captured["path"] = path

        def get_inputs(self):
            class _In:
                name = "input"
            return [_In()]

        def run(self, outs, feed):
            feats = next(iter(feed.values()))
            captured["feed_shape"] = np.asarray(feats).shape
            return [np.full((1, 7), 3.0, np.float32)]

    class _Opts:
        graph_optimization_level = None

    fake_ort = _fake_module(
        "onnxruntime", InferenceSession=FakeSession, SessionOptions=_Opts,
        GraphOptimizationLevel=_fake_module("g", ORT_ENABLE_ALL=99),
    )
    monkeypatch.setitem(sys.modules, "onnxruntime", fake_ort)
    model = tmp_path / "model-sigmos_1697718653_41d092e8-epo-200.onnx"
    model.write_bytes(b"fake")

    from flowdec_tpu.eval.metrics import SIGMOS

    x_hat, x, y = audio
    m = SIGMOS(SR, model_dir=str(tmp_path))
    row = get_metrics_row([m], "speech_0.wav", x_hat, x, y)
    for n in m.names:
        assert row[n] == pytest.approx(3.0), n
    assert len(captured["feed_shape"]) >= 3  # (1?, frames, bins, 2) features


def test_visqol_subprocess_with_fake_binary(audio, tmp_path):
    """ViSQOL subprocess backend contract: invokes the binary with
    --reference_file/--degraded_file (speech mode at 16 kHz adds
    --use_speech_mode) and parses the MOS-LQO line."""
    import stat

    fake = tmp_path / "visqol"
    fake.write_text(
        "#!/bin/sh\n"
        "echo something\n"
        "echo 'MOS-LQO: 4.123'\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    from flowdec_tpu.eval.metrics import ViSQOL

    x_hat, x, y = audio
    m = ViSQOL(SR, mode="audio", backend="subprocess", binary_path=str(fake))
    assert float(m(x_hat, x, None, "music_0.wav")) == pytest.approx(4.123)

    # a binary that fails → NaN row via the harness
    bad = tmp_path / "visqol_bad"
    bad.write_text("#!/bin/sh\nexit 3\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    m_bad = ViSQOL(SR, mode="audio", backend="subprocess", binary_path=str(bad))
    row = get_metrics_row([m_bad], "music_0.wav", x_hat, x, y)
    assert np.isnan(row[m_bad.names[0]])


# ---------------------------------------------------------------------------
# Native ESTOI (eval/estoi.py) — produces real numbers without pystoi
# ---------------------------------------------------------------------------


def _speechy(sr=10000, seconds=1.2, seed=0):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    f0 = 120 + 40 * np.sin(2 * np.pi * 3 * t)
    ph = 2 * np.pi * np.cumsum(f0) / sr
    x = sum(np.sin(k * ph) / k for k in range(1, 10))
    env = 0.4 + 0.6 * np.sin(2 * np.pi * 3.5 * t) ** 2
    return (x * env + 0.01 * rng.standard_normal(n)).astype(np.float64)


class TestNativeESTOI:
    def test_identical_is_one(self):
        from flowdec_tpu.eval.estoi import estoi_np

        x = _speechy()
        assert estoi_np(x, x, 10000) == pytest.approx(1.0, abs=1e-6)

    def test_monotone_in_noise(self):
        from flowdec_tpu.eval.estoi import estoi_np

        x = _speechy(seed=1)
        rng = np.random.default_rng(2)
        noise = rng.standard_normal(x.shape)
        scores = [estoi_np(x, x + a * noise, 10000)
                  for a in (0.0, 0.05, 0.2, 0.8)]
        assert scores[0] > scores[1] > scores[2] > scores[3], scores
        assert scores[-1] < 0.5

    def test_resampling_from_48k(self):
        from flowdec_tpu.eval.estoi import estoi_np

        x = _speechy(sr=48000, seconds=1.0, seed=3)
        s = estoi_np(x, x, 48000)
        assert s == pytest.approx(1.0, abs=1e-4)

    def test_metric_wrapper_native_backend(self, audio):
        x_hat, x, y = audio
        m = ESTOI_cls = __import__("flowdec_tpu.eval.metrics",
                                   fromlist=["ESTOI"]).ESTOI
        metric = ESTOI_cls(SR)  # pystoi absent → native backend
        row = get_metrics_row([metric], "speech_0.wav", x_hat, x, y)
        assert np.isfinite(row["estoi"]) and -1.0 <= row["estoi"] <= 1.0

    def test_published_framing_constants(self):
        # ESTOI's definition (Jensen & Taal 2016 / pystoi): 256-sample Hann
        # frames with 50% overlap zero-padded to a 512-pt FFT, 30-frame
        # (384 ms) segments.
        from flowdec_tpu.eval import estoi as E

        assert (E._N_FRAME, E._HOP, E._N_FFT, E._SEG) == (256, 128, 512, 30)
        assert E._SEG * E._HOP / E._SR == pytest.approx(0.384)
        # band matrix covers 257 rfft bins with 15 non-empty bands
        H = E._third_octave_matrix()
        assert H.shape == (15, 257)
        assert (H.sum(axis=1) > 0).all()

    def test_tracks_pystoi_when_available(self):
        pystoi = pytest.importorskip("pystoi")
        from flowdec_tpu.eval.estoi import estoi_np

        x = _speechy(sr=10000, seconds=2.0, seed=4)
        rng = np.random.default_rng(5)
        for a in (0.02, 0.1, 0.4):
            y = x + a * rng.standard_normal(x.shape)
            ours = estoi_np(x, y, 10000)
            theirs = pystoi.stoi(x, y, 10000, extended=True)
            assert ours == pytest.approx(theirs, abs=0.02), (a, ours, theirs)
