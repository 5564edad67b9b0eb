"""NDAC codec + auxiliary loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowdec_tpu.codec import NDAC, NDACConfig
from flowdec_tpu.losses import (
    CQTLoss,
    MelSpectrogramLoss,
    MultiScaleSTFTLoss,
    WaveformL1Loss,
    mel_filterbank,
)

SR = 8000
TINY = NDACConfig(
    sampling_rate=SR,
    encoder_dim=8,
    encoder_rates=(2, 4, 4),  # hop 32
    decoder_dim=64,
    latent_dim=32,
    n_codebooks=4,
    codebook_size=32,
    codebook_dim=4,
)


@pytest.fixture(scope="module")
def codec_and_params():
    codec = NDAC(TINY)
    x = jnp.zeros((1, 640))
    params = codec.init(jax.random.PRNGKey(0), x)
    return codec, params


def test_config_bitrate():
    cfg = NDACConfig()  # 48 kHz, hop 640, 10-bit codebooks
    assert cfg.hop_length == 640
    # demo.ipynb: nq=10 ⇒ 7.5 kbps, nq=4 ⇒ 3.0 kbps (75 Hz frame rate)
    assert abs(cfg.kbps(10) - 7.5) < 1e-6
    assert abs(cfg.kbps(4) - 3.0) < 1e-6
    assert abs(cfg.kbps(16) - 12.0) < 1e-6


def test_autoencode_shapes(codec_and_params):
    codec, params = codec_and_params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 800)) * 0.1, jnp.float32)
    out = codec.apply(params, x)
    assert out["audio"].shape == x.shape  # cropped back to input length
    assert out["codes"].shape[0] == 2 and out["codes"].shape[1] == TINY.n_codebooks
    n_frames = 800 // TINY.hop_length  # 800 is already a hop multiple
    assert out["codes"].shape[2] == n_frames
    assert np.all(np.isfinite(np.asarray(out["audio"])))
    assert float(out["vq/commitment_loss"]) >= 0


def test_codes_roundtrip(codec_and_params):
    """decode(from_codes(codes)) must equal decode(z_q) — the demo's
    codebook-lookup path (demo.ipynb cell 4)."""
    codec, params = codec_and_params
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 640)) * 0.1, jnp.float32)

    z_q, codes, latents, _, _ = codec.apply(params, x, method=codec.encode)
    z_q2 = codec.apply(params, codes, method=codec.from_codes)
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(z_q2), atol=1e-5)

    wav1 = codec.apply(params, z_q, method=codec.decode)
    wav2 = codec.apply(params, z_q2, method=codec.decode)
    # decoder depth amplifies the float32 straight-through roundoff
    np.testing.assert_allclose(np.asarray(wav1), np.asarray(wav2), atol=1e-3)


def test_bitrate_control(codec_and_params):
    """Fewer quantizers → different (coarser) z_q; codes identical for the
    shared prefix stages."""
    codec, params = codec_and_params
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 640)) * 0.1, jnp.float32)
    z_full, codes_full, *_ = codec.apply(params, x, method=codec.encode)
    z_2, codes_2, *_ = codec.apply(params, x, n_quantizers=2, method=codec.encode)
    assert not np.allclose(np.asarray(z_full), np.asarray(z_2))
    np.testing.assert_array_equal(np.asarray(codes_full[:, 0]), np.asarray(codes_2[:, 0]))


@pytest.mark.slow
def test_codec_training_grads(codec_and_params):
    codec, params = codec_and_params
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 640)) * 0.1, jnp.float32)
    mel = MelSpectrogramLoss(sampling_rate=SR, n_mels=(10, 20), window_lengths=(128, 256),
                             mel_fmin=(0.0, 0.0), mel_fmax=(None, None))

    def loss_fn(p):
        out = codec.apply(p, x)
        return (
            mel(out["audio"], x)
            + out["vq/commitment_loss"] * 0.25
            + out["vq/codebook_loss"]
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
    # straight-through: encoder receives gradient
    enc_g = grads["params"]["encoder"]["conv_in"]["kernel"]
    assert float(jnp.sum(jnp.abs(enc_g))) > 0
    # codebooks receive gradient via the codebook loss
    cb_g = grads["params"]["quantizer"]["vq_0"]["codebook"]
    assert float(jnp.sum(jnp.abs(cb_g))) > 0


def test_spectral_loss_grads_finite_at_saturated_recon():
    """Regression: a tanh-saturated (constant) reconstruction has exactly-zero
    STFT bins, where d|z|/dz = 0/0 = NaN — the unguarded magnitude NaN'd the
    whole param tree in the first NDAC campaign. All spectral losses must
    give finite grads there."""
    from flowdec_tpu.losses import (
        CQTLoss,
        MelSpectrogramLoss,
        MultiScaleSTFTLoss,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 0.1)

    for loss in (
        MultiScaleSTFTLoss(window_lengths=(512, 256)),
        MelSpectrogramLoss(sampling_rate=SR, n_mels=(10, 20),
                           window_lengths=(256, 512),
                           mel_fmin=(0.0, 0.0), mel_fmax=(None, None)),
        CQTLoss(sampling_rate=SR),
    ):
        for recon in (jnp.ones_like(x), jnp.zeros_like(x)):
            val, grad = jax.value_and_grad(lambda r: loss(r, x))(recon)
            assert np.isfinite(float(val)), loss
            assert np.isfinite(np.asarray(grad)).all(), (
                f"{type(loss).__name__} grad NaN at saturated recon"
            )


def test_mel_filterbank_matches_librosa_shape():
    fb = np.asarray(mel_filterbank(SR, 512, 40))
    assert fb.shape == (40, 257)
    assert np.all(fb >= 0)
    # every FFT bin in band is covered by some filter
    assert fb.sum() > 0
    # slaney normalization: peak values shrink with center frequency
    peaks = fb.max(axis=1)
    assert peaks[5] > peaks[-1]


def test_mel_filterbank_matches_torch_reference():
    """Compare against torchaudio's slaney mel if available, else librosa's
    published values via torch.stft path — here we check the well-known
    invariant sum over mels of filter * enorm⁻¹ tiles the spectrum."""
    fb = np.asarray(_unnormalized(SR, 512, 24))
    coverage = fb.sum(axis=0)
    inner = coverage[10:200]
    assert np.all(inner > 0)


def _unnormalized(sr, n_fft, n_mels):
    from flowdec_tpu.losses.spectral import _mel_filterbank_np, _hz_to_mel, _mel_to_hz

    fb = _mel_filterbank_np(sr, n_fft, n_mels, 0.0, None)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2), n_mels + 2)
    hz = _mel_to_hz(mel_pts)
    enorm = 2.0 / (hz[2:] - hz[:n_mels])
    return fb / enorm[:, None]


def test_spectral_losses_behave():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4096)) * 0.1, jnp.float32)
    noisy = x + 0.05 * jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    worse = x + 0.2 * jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)

    for loss in (
        MultiScaleSTFTLoss(window_lengths=(512, 256)),
        MelSpectrogramLoss(sampling_rate=SR, n_mels=(20, 40), window_lengths=(256, 512),
                           mel_fmin=(0.0, 0.0), mel_fmax=(None, None)),
        CQTLoss(sampling_rate=SR, n_fft=512, n_bins=48),
        WaveformL1Loss(),
    ):
        zero = float(loss(x, x))
        small = float(loss(noisy, x))
        big = float(loss(worse, x))
        assert zero < small < big, f"{loss} not monotone: {zero} {small} {big}"

    # differentiable
    g = jax.grad(lambda a: MultiScaleSTFTLoss(window_lengths=(256,))(a, x))(noisy)
    assert np.all(np.isfinite(np.asarray(g)))


def test_snr_and_complex_stft_losses():
    """Phase-aware codec terms (r4): SNRLoss matches closed-form SNR and both
    losses are monotone in noise + grad-safe at zero residual (the exact
    failure mode that NaN'd the first codec campaign for the magnitude
    losses)."""
    from flowdec_tpu.losses import ComplexSTFTLoss, SNRLoss

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4096)) * 0.1, jnp.float32)
    noisy = x + 0.01 * jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    worse = x + 0.05 * jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)

    snr = SNRLoss()
    # closed form: loss = -10 log10(||x||^2 / ||e||^2) averaged over batch
    e = np.asarray(noisy - x)
    xn = np.asarray(x)
    expect = float(np.mean(-10.0 * np.log10(
        (xn ** 2).sum(-1) / (e ** 2).sum(-1))))
    assert abs(float(snr(noisy, x)) - expect) < 1e-3
    assert float(snr(noisy, x)) < float(snr(worse, x))
    # eps-floored at identical inputs, far below any real value
    assert float(snr(x, x)) < -80.0

    cstft = ComplexSTFTLoss(window_lengths=(512, 256))
    assert float(cstft(x, x)) < float(cstft(noisy, x)) < float(cstft(worse, x))

    # a PURE PHASE error must move both losses (the gap magnitude-only
    # losses cannot see): circular-shift the signal by a few samples
    shifted = jnp.roll(x, 3, axis=-1)
    assert float(cstft(shifted, x)) > 10 * float(cstft(x, x))
    assert float(snr(shifted, x)) > -10.0  # shifted speech ~ decorrelated

    for loss in (snr, cstft):
        g = jax.grad(lambda a: loss(a, x))(x)  # zero residual
        assert np.all(np.isfinite(np.asarray(g)))
        g = jax.grad(lambda a: loss(a, x))(noisy)
        assert np.all(np.isfinite(np.asarray(g)))


def test_pesq_loss_gated():
    from flowdec_tpu.losses import TorchPESQSpeechLoss

    assert TorchPESQSpeechLoss.only_applies_to == ["speech"]
    with pytest.raises(Exception):
        TorchPESQSpeechLoss(SR)  # torch_pesq not installed in this image


@pytest.mark.slow
def test_codec_train_step(codec_and_params):
    """One jitted codec training step improves the reconstruction mix."""
    import optax
    from flowdec_tpu.codec import CodecLossWeights, create_codec_train_state, make_codec_train_step

    codec, _ = codec_and_params
    optimizer = optax.adam(3e-4)
    state = create_codec_train_state(codec, jax.random.PRNGKey(0), optimizer, length=640)
    # lighter loss mix for the tiny 8 kHz test geometry
    weights = CodecLossWeights(mel=1.0, stft=1.0, waveform=1.0)
    step = make_codec_train_step(codec, optimizer, weights=weights)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 640)) * 0.1, jnp.float32)
    totals, recons = [], []
    for i in range(15):
        state, metrics = step(state, x, jax.random.PRNGKey(i))
        totals.append(float(metrics["loss/total"]))
        recons.append(
            float(metrics["loss/mel"] + metrics["loss/stft"] + metrics["loss/waveform"])
        )
    assert int(state.step) == 15
    assert all(np.isfinite(totals))
    # The VQ commitment/codebook terms legitimately grow early (random
    # codebooks chasing a live encoder — DAC warms this up over many steps);
    # the smoke assertion is that the reconstruction mix improves.
    assert recons[-1] < recons[0], f"codec not learning: {recons[0]} -> {recons[-1]}"


def test_load_codec_roundtrip(tmp_path):
    """load_codec restores (codec, EMA params, config) from a
    scripts/train_codec.py-layout checkpoint dir — the NDAC counterpart of
    checkpoints.load_model (reference demo.ipynb cell 3 dac_utils.load_model)."""
    from flowdec_tpu.codec import codec_optimizer, create_codec_train_state, load_codec
    from flowdec_tpu.train.checkpoints import CheckpointManager

    codec = NDAC(TINY)
    optimizer = codec_optimizer(1e-4)
    state = create_codec_train_state(codec, jax.random.PRNGKey(3), optimizer, length=640)
    # make raw and EMA distinguishable
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        ema_params=jax.tree.map(lambda p: p + 1.0, state.params),
    )
    ckpt_dir = str(tmp_path / "ndac")
    mgr = CheckpointManager(ckpt_dir, last_every_n_steps=1,
                            config={"codec": TINY.__dict__})
    mgr.maybe_save(state, force=True)
    mgr.wait()
    mgr.close()

    codec2, params_ema, cfg = load_codec(ckpt_dir, ema=True)
    assert cfg == TINY and codec2.config.hop_length == TINY.hop_length
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_ema, state.ema_params,
    )
    _, params_raw, _ = load_codec(ckpt_dir, ema=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_raw, state.params,
    )


def test_codec_optimizer_lr_schedule(tmp_path):
    """codec_optimizer(lr2, switch_step) = the measured v3→v4 recipe in one
    graph: lr until switch_step, then the cold refine lr (CAMPAIGN.md r4
    §2-3). Also: load_codec rebuilds the SCHEDULED opt_state tree from the
    recorded settings — a schedule adds a count to scale_by_learning_rate's
    state, so a constant-lr template would fail StandardRestore."""
    from flowdec_tpu.codec import codec_optimizer, create_codec_train_state, load_codec
    from flowdec_tpu.train.checkpoints import CheckpointManager

    opt = codec_optimizer(1e-4, grad_clip=None, lr2=3e-5, switch_step=2)
    params = {"w": jnp.ones(3)}
    st = opt.init(params)
    scales = []
    for _ in range(4):
        up, st = opt.update({"w": jnp.ones(3)}, st, params)
        scales.append(abs(float(up["w"][0])))
    # steps 0-1 at ~1e-4, steps 2-3 at ~3e-5 (AdamW wd shifts magnitude ~1%)
    assert scales[0] == pytest.approx(1e-4, rel=0.05)
    assert scales[1] == pytest.approx(1e-4, rel=0.05)
    assert scales[2] == pytest.approx(3e-5, rel=0.05)
    assert scales[3] == pytest.approx(3e-5, rel=0.05)

    codec = NDAC(TINY)
    optimizer = codec_optimizer(1e-4, lr2=3e-5, switch_step=2)
    state = create_codec_train_state(codec, jax.random.PRNGKey(3), optimizer, length=640)
    ckpt_dir = str(tmp_path / "ndac_sched")
    mgr = CheckpointManager(
        ckpt_dir, last_every_n_steps=1,
        config={"codec": TINY.__dict__,
                "optimizer": {"lr": 1e-4, "grad_clip": 1.0,
                              "lr2": 3e-5, "switch_step": 2}},
    )
    mgr.maybe_save(state, force=True)
    mgr.wait()
    mgr.close()
    _, params_raw, cfg = load_codec(ckpt_dir, ema=False)
    assert cfg == TINY
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_raw, state.params,
    )


def test_code_corpus_cli(tmp_path):
    """scripts/code_corpus.py re-codes a corpus's coded side through a
    trained-NDAC checkpoint end to end: pairs files written, coded wavs
    decodable, clean side referenced from the source corpus."""
    import numpy as np

    from flowdec_tpu.codec import codec_optimizer, create_codec_train_state
    from flowdec_tpu.data.wavio import read_wav, write_wav
    from flowdec_tpu.train.checkpoints import CheckpointManager
    from scripts.code_corpus import main as code_main

    sr = TINY.sampling_rate
    src = tmp_path / "src"
    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("test", 2)):
        cdir = src / split / "clean"
        ydir = src / split / "coded"
        cdir.mkdir(parents=True)
        ydir.mkdir(parents=True)
        lines = []
        for i in range(n):
            x = (rng.standard_normal(sr // 4) * 0.1).astype(np.float32)
            cp, yp = cdir / f"{split}_{i}.wav", ydir / f"{split}_{i}.wav"
            write_wav(str(cp), x, sr)
            write_wav(str(yp), x, sr)  # placeholder coded side
            lines.append(f"{cp},{yp}")
        (src / f"{split}_pairs.txt").write_text("\n".join(lines) + "\n")

    codec = NDAC(TINY)
    state = create_codec_train_state(
        codec, jax.random.PRNGKey(0), codec_optimizer(1e-4), length=640
    )
    ckpt = tmp_path / "ck"
    mgr = CheckpointManager(str(ckpt), last_every_n_steps=1,
                            config={"codec": TINY.__dict__})
    mgr.maybe_save(state, force=True)
    mgr.wait()
    mgr.close()

    out = tmp_path / "coded"
    code_main([
        "--corpus", str(src), "--out", str(out), "--codec-ckpt", str(ckpt),
        "--nq", "2", "--batch", "2", "--splits", "train,test",
    ])
    for split, n in (("train", 3), ("test", 2)):
        pairs = [l.split(",") for l in
                 (out / f"{split}_pairs.txt").read_text().splitlines()]
        assert len(pairs) == n
        for clean_path, coded_path in pairs:
            assert clean_path.startswith(str(src))
            y, got_sr = read_wav(coded_path)
            x, _ = read_wav(clean_path)
            assert got_sr == sr and y.shape[-1] == x.shape[-1]
            assert np.isfinite(y).all()


@pytest.mark.slow
def test_flow_finetune_loss():
    """Aux finetuning losses on the one-step reconstruction (restored stripped
    capability) produce finite grads and respect the speech mask."""
    from tests.test_models import TINY_BACKBONE, FEX, SR as MSR
    from flowdec_tpu.models import FlowModel
    from flowdec_tpu.nn import NCSNpp

    model = FlowModel(backbone=NCSNpp(TINY_BACKBONE), feature_extractor=FEX,
                      sampling_rate=MSR, sigma_y=jnp.asarray(0.5))
    params = model.init_params(jax.random.PRNGKey(0), frames=128)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4064)) * 0.1, jnp.float32)
    y = x + 0.05 * jnp.asarray(rng.standard_normal((2, 4064)), jnp.float32)

    stft_l = MultiScaleSTFTLoss(window_lengths=(256,))

    class SpeechOnly:
        only_applies_to = ["speech"]

        def __call__(self, a, b):
            return jnp.mean(jnp.abs(a - b))

    mask = jnp.asarray([1.0, 0.0])
    loss, aux = model.finetune_loss(
        params, jax.random.PRNGKey(1), (x, y),
        aux_losses=(stft_l, SpeechOnly()), speech_mask=mask,
    )
    assert np.isfinite(float(loss))
    assert "aux/MultiScaleSTFTLoss" in aux and "aux/SpeechOnly" in aux

    g = jax.grad(
        lambda p: model.finetune_loss(
            p, jax.random.PRNGKey(1), (x, y), aux_losses=(stft_l,)
        )[0]
    )(params)
    gsum = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0


@pytest.mark.slow
def test_quantizer_dropout_per_sample(codec_and_params):
    """Per-sample nq masking (DAC quantizer dropout): a sample with nq=1 must
    see only stage-0 output; a sample with full nq gets the full stack."""
    codec, params = codec_and_params
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 640)) * 0.1, jnp.float32)

    nq = jnp.asarray([1, TINY.n_codebooks])
    z_mixed, *_ = codec.apply(params, x, method=codec.encode, nq_per_sample=nq)
    z_1, *_ = codec.apply(params, x[:1], n_quantizers=1, method=codec.encode)
    z_full, *_ = codec.apply(params, x[1:], method=codec.encode)
    np.testing.assert_allclose(np.asarray(z_mixed[0]), np.asarray(z_1[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_mixed[1]), np.asarray(z_full[0]), atol=1e-5)


def test_train_step_nq_min_floor(codec_and_params):
    """nq_min raises the quantizer-dropout floor (alignment-stage recipe):
    with nq_min == n_codebooks every sample must use the FULL stack, i.e. the
    step behaves exactly like a no-dropout step under the same key."""
    import optax
    from flowdec_tpu.codec import (CodecLossWeights, create_codec_train_state,
                                   make_codec_train_step)

    codec, _ = codec_and_params
    optimizer = optax.adam(3e-4)
    weights = CodecLossWeights(mel=1.0, stft=1.0, waveform=1.0)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 640)) * 0.1, jnp.float32)

    def one_step(**kw):
        state = create_codec_train_state(
            codec, jax.random.PRNGKey(0), optimizer, length=640)
        step = make_codec_train_step(codec, optimizer, weights=weights, **kw)
        _, metrics = step(state, x, jax.random.PRNGKey(3))
        return metrics

    m_floor = one_step(nq_min=TINY.n_codebooks)
    m_nodrop = one_step(n_quantizers_dropout=False)
    np.testing.assert_allclose(float(m_floor["loss/total"]),
                               float(m_nodrop["loss/total"]), rtol=1e-5)
    # and a floored draw differs from the unfloored one (dropout still live)
    m_free = one_step(nq_min=1)
    assert float(m_free["loss/total"]) != float(m_floor["loss/total"])


# --------------------------------------------------------------------------
# differentiable PESQ surrogate (losses/pesq_jax.py)
# --------------------------------------------------------------------------


class TestPesqSurrogate:
    def _loss(self, sr=16000):
        from flowdec_tpu.losses import PesqSurrogateLoss

        return PesqSurrogateLoss(sampling_rate=sr)

    def _speech_like(self, sr, seconds=1.0, seed=0):
        rng = np.random.default_rng(seed)
        n = int(sr * seconds)
        t = np.arange(n) / sr
        f0 = 140 + 30 * np.sin(2 * np.pi * 2.5 * t)
        x = np.zeros(n)
        ph = 2 * np.pi * np.cumsum(f0) / sr
        for k in range(1, 12):
            x += np.sin(k * ph) / k
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t) ** 2
        x = (x * env + 0.01 * rng.standard_normal(n)).astype(np.float32)
        return 0.1 * x / np.abs(x).max()

    def test_zero_for_identical(self):
        loss = self._loss()
        x = jnp.asarray(self._speech_like(16000)[None])
        v = float(loss(x, x))
        assert v < 1e-3, v

    def test_monotone_in_noise(self):
        loss = self._loss()
        x = self._speech_like(16000)
        rng = np.random.default_rng(1)
        noise = rng.standard_normal(x.shape).astype(np.float32)
        vals = [float(loss(jnp.asarray((x + a * noise)[None]),
                           jnp.asarray(x[None])))
                for a in (0.0, 0.003, 0.01, 0.03)]
        assert vals[0] < vals[1] < vals[2] < vals[3], vals

    def test_penalizes_additive_more_than_attenuation(self):
        """PESQ's asymmetry: added noise hurts more than mild spectral loss."""
        loss = self._loss()
        x = self._speech_like(16000, seed=2)
        rng = np.random.default_rng(3)
        added = x + 0.02 * rng.standard_normal(x.shape).astype(np.float32)
        # lowpass (remove content) with the same residual energy
        X = np.fft.rfft(x)
        X[len(X) // 3:] *= 0.3
        removed = np.fft.irfft(X, len(x)).astype(np.float32)
        err_a = np.linalg.norm(added - x)
        err_r = np.linalg.norm(removed - x)
        removed = x + (removed - x) * (err_a / err_r)  # match error energy
        va = float(loss(jnp.asarray(added[None]), jnp.asarray(x[None])))
        vr = float(loss(jnp.asarray(removed[None]), jnp.asarray(x[None])))
        assert va > vr, (va, vr)

    def test_differentiable_and_jittable(self):
        loss = self._loss()
        x = jnp.asarray(self._speech_like(16000, seed=4)[None])
        rng = np.random.default_rng(5)
        y = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

        g = jax.jit(jax.grad(lambda yy: loss(yy, x)))(y)
        g = np.asarray(g)
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0

    def test_48k_resampling_path(self):
        loss48 = self._loss(sr=48000)
        x = self._speech_like(48000, seconds=0.5, seed=6)
        rng = np.random.default_rng(7)
        y = x + 0.01 * rng.standard_normal(x.shape).astype(np.float32)
        clean = float(loss48(jnp.asarray(x[None]), jnp.asarray(x[None])))
        noisy = float(loss48(jnp.asarray(y[None]), jnp.asarray(x[None])))
        assert clean < 1e-3 and noisy > clean

    def test_speech_gating_attribute(self):
        assert tuple(self._loss().only_applies_to) == ("speech",)


def test_codec_bf16_decode_close(codec_and_params):
    """bf16 decode (bench.py's serving-pipeline fast path) tracks the f32
    decode: cast_codec_params + bf16 latents must reproduce the waveform to
    bf16 noise (~40 dB SNR), with integer code paths untouched."""
    from flowdec_tpu.codec.ndac import cast_codec_params

    codec, params = codec_and_params
    rng = np.random.default_rng(5)
    codes = jnp.asarray(rng.integers(0, TINY.codebook_size, (2, 4, 20)), jnp.int32)

    z_q = codec.apply(params, codes, method=NDAC.from_codes)
    y32 = codec.apply(params, z_q, method=NDAC.decode)

    p16 = cast_codec_params(params, "bfloat16")
    # codebooks now bf16 ⇒ from_codes yields bf16 latents; codes stay int
    z16 = codec.apply(p16, codes, method=NDAC.from_codes)
    assert z16.dtype == jnp.bfloat16
    y16 = codec.apply(p16, z16, method=NDAC.decode)
    assert y16.dtype == jnp.bfloat16

    err = np.asarray(y16.astype(jnp.float32) - y32)
    snr = 10 * np.log10(float(np.mean(np.asarray(y32) ** 2)) / max(float(np.mean(err**2)), 1e-30))
    # ~23 dB on a random-init tiny codec (bf16 has 8 mantissa bits and the
    # 0.01-scaled conv_out init makes the relative scale worst-case); the
    # trained-codec validation on real audio lives in CAMPAIGN.md r3
    assert snr > 20.0, f"bf16 decode SNR {snr:.1f} dB vs f32"
