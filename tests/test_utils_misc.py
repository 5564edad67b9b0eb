"""Tests for grab-bag utilities: fused activation, audio helpers, adaptive
PF-ODE sampler, profiling timer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowdec_tpu.flow import OUVESDE, probability_flow_sample_adaptive
from flowdec_tpu.ops import fused_leaky_relu
from flowdec_tpu.utils.audio import batch_broadcast, load_audio, mean_conf_int
from flowdec_tpu.utils.profiling import rtf_timer


def test_fused_leaky_relu_matches_composition():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(3), jnp.float32)
    out = fused_leaky_relu(x, b)
    expect = jax.nn.leaky_relu(x + b.reshape(1, 1, 1, 3), 0.2) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_mean_conf_int():
    rng = np.random.default_rng(0)
    data = rng.standard_normal(1000)
    m, h = mean_conf_int(data)
    assert abs(m) < 0.1 and 0 < h < 0.1


def test_batch_broadcast():
    a = np.asarray([1.0, 2.0])
    x = np.zeros((2, 3, 4))
    out = batch_broadcast(a, x)
    assert out.shape == (2, 1, 1)
    with pytest.raises(ValueError):
        batch_broadcast(np.zeros((3,)), x)


def test_load_audio_roundtrip(tmp_path):
    from flowdec_tpu.data.wavio import write_wav

    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 16000)
    out = load_audio(path, 8000)
    assert out.shape == (1, 8000)


def test_adaptive_pf_ode_matches_fixed_grid():
    """scipy RK45 adaptive sampler recovers the same target as the fixed-grid
    on-device sampler (exact-score toy)."""
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.82, N=50)
    x_target = jnp.full((2, 4, 4), 0.5, dtype=jnp.float32)
    y = jnp.full((2, 4, 4), -0.5, dtype=jnp.float32)

    def exact_score(x, y_, t):
        mean = sde.mean(x_target, t, y_)
        std = sde.std(t).reshape(-1, 1, 1)
        return -(x - mean) / std**2

    x_hat, nfe = probability_flow_sample_adaptive(
        jax.random.PRNGKey(0), sde, exact_score, y, rtol=1e-4, atol=1e-4
    )
    assert nfe > 10
    err = float(jnp.mean(jnp.abs(x_hat - x_target)))
    assert err < 0.1, f"adaptive PF-ODE error {err}"


def test_rtf_timer():
    @jax.jit
    def fn():
        return jnp.sum(jnp.ones((64, 64)))

    stats = rtf_timer(lambda: fn(), audio_seconds=1.0, iters=3)
    assert stats["rtf"] > 0 and stats["compile_time"] >= 0


def test_viz_complex_to_rgb():
    from flowdec_tpu.utils.viz import complex_to_rgb

    X = np.exp(1j * np.linspace(0, 2 * np.pi, 16)).reshape(4, 4)
    rgb = complex_to_rgb(X)
    assert rgb.shape == (4, 4, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # cpair input path
    pair = np.stack([X.real, X.imag], axis=-1)
    rgb2 = complex_to_rgb(pair)
    np.testing.assert_allclose(rgb, rgb2, atol=1e-6)
