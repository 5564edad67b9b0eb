"""Model-family tests: preprocess/postprocess inversion, losses, enhance.

Uses a miniature geometry (n_fft=126 → 64 bins, 2-level U-Net) so CPU tests
stay fast while exercising the exact same code paths as the 75M model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowdec_tpu.flow.sdes import OUVESDE
from flowdec_tpu.models import (
    AmplitudeCompressedComplexSTFT,
    FlowModel,
    RegressionModel,
    ScoreModel,
    sigma_models,
)
from flowdec_tpu.nn import NCSNpp, NCSNppConfig

SR = 8000
N_FFT = 126  # 64 bins
LENGTH = 4064  # 1 + 4064/32 = 128 frames (multiple of 64 after padding)

FEX = AmplitudeCompressedComplexSTFT(
    n_fft=N_FFT, sampling_rate=SR, alpha=0.3, beta=0.33, n_hops=4
)
TINY_BACKBONE = NCSNppConfig(
    nf=16,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(),
    bottleneck_attn=False,
    image_size=64,
    output_kernel_size=1,
    output_bias=False,
)


def _make_flow_model(**kw):
    return FlowModel(
        backbone=NCSNpp(TINY_BACKBONE),
        feature_extractor=FEX,
        sampling_rate=SR,
        **kw,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, LENGTH)).astype(np.float32) * 0.1
    y = (x + 0.05 * rng.standard_normal((2, LENGTH))).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


@pytest.fixture(scope="module")
def flow_model_and_params(batch):
    model = _make_flow_model()
    params = model.init_params(jax.random.PRNGKey(0), frames=128)
    return model, params


def test_preprocess_postprocess_roundtrip(batch):
    model = _make_flow_model()
    _, y = batch
    Y, _, info = model.preprocess(y)
    assert Y.shape == (2, 64, 128, 2)  # cpair, padded to multiple of 64
    back = model.postprocess(Y, info)
    np.testing.assert_allclose(np.asarray(back), np.asarray(y), atol=1e-4)


def test_preprocess_with_clean(batch):
    model = _make_flow_model()
    x, y = batch
    Y, X, info = model.preprocess(y, x=x)
    assert X.shape == Y.shape
    back_x = model.postprocess(X, info)
    np.testing.assert_allclose(np.asarray(back_x), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("shape_kind", ["1d", "3d"])
def test_shape_handling(batch, shape_kind):
    model = _make_flow_model()
    _, y = batch
    if shape_kind == "1d":
        y_in = y[0]
    else:
        y_in = y[:, None, :]
    Y, _, info = model.preprocess(y_in)
    back = model.postprocess(Y, info)
    assert back.shape == y_in.shape


def test_flow_loss_and_grads(flow_model_and_params, batch):
    model, params = flow_model_and_params
    loss, aux = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    assert int(aux["n_nan"]) == 0
    assert aux["per_sample"].shape == (2,)

    g = jax.grad(lambda p: model.loss(p, jax.random.PRNGKey(1), batch)[0])(params)
    gsum = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_flow_loss_nan_masking(flow_model_and_params, batch):
    """A NaN sample must be masked out, not poison the batch (reference
    model.py:447-464 drops NaN samples)."""
    model, params = flow_model_and_params
    x, y = batch
    x_bad = x.at[1].set(jnp.nan)
    loss, aux = model.loss(params, jax.random.PRNGKey(1), (x_bad, y))
    assert np.isfinite(float(loss))
    assert int(aux["n_nan"]) == 1
    # all-NaN batch → NaN loss (training loop escalates)
    loss_all, _ = model.loss(
        params, jax.random.PRNGKey(1), (x.at[:].set(jnp.nan), y)
    )
    assert np.isnan(float(loss_all))


def test_flow_enhance(flow_model_and_params, batch):
    model, params = flow_model_and_params
    _, y = batch
    x_hat = model.enhance(params, jax.random.PRNGKey(2), y, n_steps=2, solver="midpoint")
    assert x_hat.shape == y.shape
    assert np.all(np.isfinite(np.asarray(x_hat)))


def test_flow_enhance_trajectory(flow_model_and_params, batch):
    model, params = flow_model_and_params
    _, y = batch
    X_hats, x_hats = model.enhance(
        params, jax.random.PRNGKey(2), y, n_steps=2, solver="euler",
        return_trajectory=True,
    )
    assert X_hats.shape[0] == 3 and x_hats.shape == (3, *y.shape)


def test_flow_per_band_sigma(batch):
    curve = np.linspace(0.2, 0.6, 64).astype(np.float32)
    model = _make_flow_model(sigma_y=sigma_models.as_band_sigma(curve))
    params = model.init_params(jax.random.PRNGKey(0), frames=128)
    loss, _ = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    x_hat = model.enhance(params, jax.random.PRNGKey(2), batch[1], n_steps=1)
    assert x_hat.shape == batch[1].shape


@pytest.mark.slow
def test_flow_jit_enhance(flow_model_and_params, batch):
    model, params = flow_model_and_params
    _, y = batch
    fn = jax.jit(
        lambda m, p, k, y_: m.enhance(p, k, y_, n_steps=2, solver="midpoint")
    )
    out = fn(model, params, jax.random.PRNGKey(3), y)
    ref = model.enhance(params, jax.random.PRNGKey(3), y, n_steps=2, solver="midpoint")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_score_model(batch):
    model = ScoreModel(
        backbone=NCSNpp(TINY_BACKBONE),
        feature_extractor=FEX,
        sampling_rate=SR,
        sde=OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.82, N=30),
    )
    params = model.init_params(jax.random.PRNGKey(0), frames=128)
    loss, aux = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))

    x_hat = model.enhance(
        params, jax.random.PRNGKey(2), batch[1], sampler_type="pc", n_steps=3
    )
    assert x_hat.shape == batch[1].shape
    assert np.all(np.isfinite(np.asarray(x_hat)))

    x_ode = model.enhance(
        params, jax.random.PRNGKey(2), batch[1], sampler_type="ode", n_steps=3
    )
    assert x_ode.shape == batch[1].shape


def test_regression_model(batch):
    model = RegressionModel(
        backbone=NCSNpp(TINY_BACKBONE), feature_extractor=FEX, sampling_rate=SR
    )
    params = model.init_params(jax.random.PRNGKey(0), frames=128)
    loss, _ = model.loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    x_hat = model.enhance(params, jax.random.PRNGKey(2), batch[1])
    assert x_hat.shape == batch[1].shape


def test_released_sigma_curves_load():
    for name, factor in (("flowdec_autoparams_75m.npy", 1.0),
                         ("flowdec_autoparams_25s.npy", 1.0)):
        curve = sigma_models.from_file(name, factor=factor, kernel_bandwidth=3)
        assert curve.shape == (768, 1, 1)
        assert 0.1 < curve.min() < curve.max() < 0.7


def test_bf16_enhance_close_to_f32(flow_model_and_params, batch):
    """bf16 inference path must stay numerically close to f32 (quality knob
    for the >50x RTF target)."""
    import dataclasses

    model, params = flow_model_and_params
    _, y = batch
    model_bf16 = model.replace(compute_dtype="bfloat16")
    out32 = model.enhance(params, jax.random.PRNGKey(5), y, n_steps=1, solver="euler")
    out16 = model_bf16.enhance(params, jax.random.PRNGKey(5), y, n_steps=1, solver="euler")
    assert out16.dtype == jnp.float32
    # same noise draw → differences only from compute precision
    denom = float(jnp.mean(jnp.abs(out32))) + 1e-9
    rel = float(jnp.mean(jnp.abs(out32 - out16))) / denom
    assert rel < 0.1, f"bf16 diverges from f32: rel={rel}"


@pytest.mark.slow
def test_learnable_window(batch):
    """learnable_window=True puts the STFT window in params; gradients reach
    it through the finetune path's differentiable ISTFT (reference
    feature_extractors.py:75 learnable_window)."""
    import dataclasses

    from flowdec_tpu.losses.spectral import WaveformL1Loss

    x, y = batch
    model = FlowModel(
        backbone=NCSNpp(TINY_BACKBONE),
        feature_extractor=dataclasses.replace(FEX, learnable_window=True),
        sampling_rate=SR,
    )
    params = model.init_params(jax.random.PRNGKey(0), frames=64)
    w = params["params"]["stft_window"]
    assert w.shape == (FEX.n_fft,)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(FEX.complex_stft.stft_config.window()), rtol=1e-6
    )

    # plain CFM loss runs (preprocess is stop_gradient'ed → zero window grad)
    loss, _ = model.loss(params, jax.random.PRNGKey(1), (x, y))
    assert np.isfinite(float(loss))

    def ft(p):
        l, _ = model.finetune_loss(
            p, jax.random.PRNGKey(2), (x, y), aux_losses=(WaveformL1Loss(),)
        )
        return l

    g = jax.grad(ft)(params)["params"]["stft_window"]
    assert np.asarray(jnp.abs(g)).sum() > 0, "no gradient reached the window"

    out = model.enhance(params, jax.random.PRNGKey(3), y, n_steps=1)
    assert out.shape == y.shape and np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_enhance_bucketed_batch_pad_trough_guard():
    """TPU small-batch trough guard, both regimes (trainer.enhance_bucketed):
    batch <= split_max runs as sequential single-stream calls; batches
    split_max+1..7 are zero-row-padded to 8 with pad rows cropped. With
    sigma_y=0 enhance is deterministic, so both must equal the plain batched
    result exactly (silent pad rows / per-row splitting can't leak)."""
    from flowdec_tpu.train.trainer import enhance_bucketed

    # (with noise, jax.random draws are shape-dependent and rows would differ
    # by design, masking a padding bug)
    model = _make_flow_model(sigma_y=jnp.asarray(0.0))
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(5)

    # split regime (batch 3 <= split_max 5): sequential single-stream calls
    y3 = (0.1 * rng.standard_normal((3, LENGTH))).astype(np.float32)
    out_split = enhance_bucketed(model, params, key, y3, batch_pad_to=8,
                                 split_max=5, n_steps=1, solver="euler")
    out_plain3 = enhance_bucketed(model, params, key, y3,
                                  batch_pad_to=0, n_steps=1, solver="euler")
    assert out_split.shape == y3.shape
    np.testing.assert_allclose(out_split, out_plain3, atol=1e-5)

    # pad regime (batch 6 > split_max 5): zero-row-pad to 8, crop back
    y6 = (0.1 * rng.standard_normal((6, LENGTH))).astype(np.float32)
    out_padded = enhance_bucketed(model, params, key, y6, batch_pad_to=8,
                                  split_max=5, n_steps=1, solver="euler")
    out_plain6 = enhance_bucketed(model, params, key, y6,
                                  batch_pad_to=0, n_steps=1, solver="euler")
    assert out_padded.shape == y6.shape
    np.testing.assert_allclose(out_padded, out_plain6, atol=1e-5)


def test_enhance_cast_preprocess_bf16(flow_model_and_params, batch):
    """cast_preprocess runs the fixed feature chain (normalize→STFT→compress
    and the inverse) in compute_dtype; the enhanced waveform must track the
    f32-feature-chain result to bf16 noise and come back as float32."""
    import dataclasses as _dc

    model, params = flow_model_and_params
    _, y = batch
    m16 = _dc.replace(model, compute_dtype="bfloat16")
    m16c = _dc.replace(model, compute_dtype="bfloat16", cast_preprocess=True)

    # preprocess itself runs in bf16 under the knob
    Yc, _, _ = m16c.preprocess(y)
    assert Yc.dtype == jnp.bfloat16
    Y, _, _ = m16.preprocess(y)
    assert Y.dtype == jnp.float32

    key = jax.random.PRNGKey(7)
    out_ref = m16.enhance(params, key, y, n_steps=1, solver="euler")
    out_cast = m16c.enhance(params, key, y, n_steps=1, solver="euler")
    assert out_cast.dtype == jnp.float32
    assert out_cast.shape == out_ref.shape
    err = np.asarray(out_cast - out_ref)
    ref = np.asarray(out_ref)
    snr = 10 * np.log10(float((ref**2).mean()) / max(float((err**2).mean()), 1e-30))
    # both paths share the bf16 backbone; the delta is feature-chain rounding
    assert snr > 25.0, f"cast_preprocess SNR {snr:.1f} dB vs bf16-backbone f32-features"
