"""NCSN++ backbone structural/numerical invariants.


The reference has no model tests; these encode its implicit contracts:
complex-in/complex-out shape preservation, the m_idx==len(modules) wiring
check (here: construction-time skip bookkeeping), parameter count scale, and
zero-init of the progressive output convs (init_scale=0 → output ≈ tiny at
init, dominated by output_layer of near-zero input).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowdec_tpu.nn import (
    FLOWDEC_FINAL_NO_ATTN,
    SGMSE_DEFAULT_YCOND,
    NCSNpp,
    NCSNppConfig,
)

pytestmark = pytest.mark.slow  # full e2e / compile-heavy: nightly tier

B, F, T = 1, 768, 64  # small T to keep CPU tests fast (must be mult of 2^levels)


def _complex_inputs(key, f=F, t_frames=T):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (B, f, t_frames, 2))
    y = jax.random.normal(ky, (B, f, t_frames, 2))
    return x, y


@pytest.fixture(scope="module")
def flowdec_model():
    model = NCSNpp(FLOWDEC_FINAL_NO_ATTN)
    x, y = _complex_inputs(jax.random.PRNGKey(0))
    t = jnp.full((B,), 0.5)
    params = model.init(jax.random.PRNGKey(1), x, y, t)
    return model, params


def test_forward_shape_dtype(flowdec_model):
    model, params = flowdec_model
    x, y = _complex_inputs(jax.random.PRNGKey(2))
    t = jnp.full((B,), 0.3)
    out = model.apply(params, x, y, t)
    assert out.shape == (B, F, T, 2)  # cpair output
    assert np.all(np.isfinite(np.asarray(out)))


def test_scalar_t_accepted(flowdec_model):
    model, params = flowdec_model
    x, y = _complex_inputs(jax.random.PRNGKey(2))
    out = model.apply(params, x, y, jnp.asarray(0.5))
    assert out.shape == (B, F, T, 2)


def test_param_count_75m_scale(flowdec_model):
    """ncsnpp_final_no_attn (nf=64, ch_mult=[4,4,4,2]) ~ the 25-75M family."""
    _, params = flowdec_model
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 20e6 < n < 80e6, f"param count {n} out of expected range"


def test_near_zero_output_at_init(flowdec_model):
    """init_scale=0 zero-inits the progressive output convs, so the pyramid is
    ~0 at init and output_layer sees ~0 input (reference training stability
    property inherited from score_sde)."""
    model, params = flowdec_model
    x, y = _complex_inputs(jax.random.PRNGKey(3))
    out = model.apply(params, x, y, jnp.full((B,), 0.7))
    assert float(jnp.max(jnp.abs(out))) < 1e-4


def test_t_conditioning_changes_output(flowdec_model):
    model, params = flowdec_model
    x, y = _complex_inputs(jax.random.PRNGKey(4))
    o1 = model.apply(params, x, y, jnp.full((B,), 0.1))
    o2 = model.apply(params, x, y, jnp.full((B,), 0.9))
    # even at near-zero init the fourier-temb path must flow to the output
    # through resblock biases; use a trained-ish perturbation instead:
    params_p = jax.tree.map(
        lambda p: p + 0.01 * np.float32(1.0), params
    )
    o1 = model.apply(params_p, x, y, jnp.full((B,), 0.1))
    o2 = model.apply(params_p, x, y, jnp.full((B,), 0.9))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-7


def test_sgmse_backbone_with_bottleneck_attn():
    cfg = SGMSE_DEFAULT_YCOND
    model = NCSNpp(cfg)
    # 7 resolutions → T must be divisible by 2^6
    x, y = _complex_inputs(jax.random.PRNGKey(5), f=768, t_frames=64)
    t = jnp.full((B,), 0.5)
    params = model.init(jax.random.PRNGKey(6), x, y, t)
    out = model.apply(params, x, y, t)
    assert out.shape == (B, 768, 64, 2)


@pytest.mark.parametrize(
    "overrides",
    [
        dict(resblock_type="ddpm", progressive="none", progressive_input="none"),
        dict(progressive="residual", progressive_input="residual"),
        dict(fir=False),
        dict(embedding_type="positional"),
        dict(progressive_combine="cat"),
        dict(attn_resolutions=(16,)),
    ],
)
def test_config_variants_run(overrides):
    """Exercise the full config space the reference ctor supports."""
    base = dict(
        nf=16,
        ch_mult=(1, 2),
        num_res_blocks=1,
        image_size=32,
        bottleneck_attn=False,
        attn_resolutions=(),
    )
    base.update(overrides)
    cfg = NCSNppConfig(**base)
    model = NCSNpp(cfg)
    x, y = _complex_inputs(jax.random.PRNGKey(7), f=32, t_frames=16)
    t = jnp.full((B,), 0.5)
    params = model.init(jax.random.PRNGKey(8), x, y, t)
    out = model.apply(params, x, y, t)
    assert out.shape == (B, 32, 16, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_jit_and_grad():
    cfg = NCSNppConfig(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, image_size=32,
        bottleneck_attn=False, attn_resolutions=(),
    )
    model = NCSNpp(cfg)
    x, y = _complex_inputs(jax.random.PRNGKey(9), f=32, t_frames=16)
    t = jnp.full((B,), 0.5)
    params = model.init(jax.random.PRNGKey(10), x, y, t)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, x, y, t)
        return jnp.mean(jnp.square(out - x))

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_remat_grad_equivalence():
    """remat=True must not change values or gradients (memory-only knob)."""
    base = dict(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, image_size=32,
        bottleneck_attn=False, attn_resolutions=(),
    )
    m_plain = NCSNpp(NCSNppConfig(**base))
    m_remat = NCSNpp(NCSNppConfig(**base, remat=True))
    x, y = _complex_inputs(jax.random.PRNGKey(11), f=32, t_frames=16)
    t = jnp.full((B,), 0.5)
    params = m_plain.init(jax.random.PRNGKey(12), x, y, t)

    o1 = m_plain.apply(params, x, y, t)
    o2 = m_remat.apply(params, x, y, t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    g1 = jax.grad(lambda p: jnp.mean(jnp.square(m_plain.apply(p, x, y, t))))(params)
    g2 = jax.grad(lambda p: jnp.mean(jnp.square(m_remat.apply(p, x, y, t))))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_custom_groupnorm_matches_flax():
    """layers.GroupNorm (f32 stats, input-dtype apply) == nn.GroupNorm in f32
    and within bf16 rounding in bf16; param structure interchangeable."""
    import flax.linen as nn

    from flowdec_tpu.nn.layers import GroupNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 32)).astype(np.float32) * 3 + 1)
    mine = GroupNorm(num_groups=8)
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-6)
    params = {
        "params": {
            "scale": jnp.asarray(rng.random(32, dtype=np.float32) + 0.5),
            "bias": jnp.asarray(rng.random(32, dtype=np.float32)),
        }
    }
    a = mine.apply(params, x)
    b = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ab = mine.apply(params, x.astype(jnp.bfloat16))
    assert ab.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ab, np.float32), np.asarray(b), atol=0.1
    )


def test_transpose_image_equivalence():
    """transpose_image=True is exactly swapaxes ∘ plain-model ∘ swapaxes with
    the SAME params (all ops are orientation-symmetric in their param
    shapes: square 3×3 kernels, separable FIR, channel-wise norms)."""
    base = dict(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, image_size=32,
        bottleneck_attn=False, attn_resolutions=(),
    )
    plain = NCSNpp(NCSNppConfig(**base))
    trans = NCSNpp(NCSNppConfig(**base, transpose_image=True))
    x, y = _complex_inputs(jax.random.PRNGKey(21), f=32, t_frames=16)
    t = jnp.full((B,), 0.3)
    params = plain.init(jax.random.PRNGKey(22), x, y, t)

    out_t = trans.apply(params, x, y, t)
    xs, ys = jnp.swapaxes(x, 1, 2), jnp.swapaxes(y, 1, 2)
    out_ref = jnp.swapaxes(plain.apply(params, xs, ys, t), 1, 2)
    assert out_t.shape == x.shape
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
