"""Fused GroupNorm+SiLU Pallas kernel: interpret-mode parity with the plain
JAX composition (forward + custom-VJP backward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowdec_tpu.ops.groupnorm_pallas import (
    fused_group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("shape,groups,h_tile", [
    ((2, 8, 16, 32), 8, 4),
    ((1, 12, 10, 16), 4, 0),   # auto tile
    ((1, 6, 8, 8), 2, 2),
])
def test_forward_matches_reference(shape, groups, h_tile):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    out = fused_group_norm_silu(x, scale, bias, groups, 1e-6, h_tile, True)
    ref = group_norm_silu_reference(x, scale, bias, groups, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_backward_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)

    def f_fused(x_, s_, b_):
        return jnp.sum(jnp.square(fused_group_norm_silu(x_, s_, b_, 4, 1e-6, 0, True)))

    def f_ref(x_, s_, b_):
        return jnp.sum(jnp.square(group_norm_silu_reference(x_, s_, b_, 4, 1e-6)))

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flax_groupnorm_parity():
    """The reference composition itself must equal flax GroupNorm + SiLU."""
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-6)
    params = gn.init(jax.random.PRNGKey(0), x)
    scale = params["params"]["scale"]
    bias = params["params"]["bias"]
    ref = jax.nn.silu(gn.apply(params, x))
    ours = group_norm_silu_reference(x, scale, bias, 8, 1e-6)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_backbone_fused_gn_matches_unfused():
    """fused_groupnorm=True must be a pure perf knob: identical params tree,
    near-identical outputs (interpret-mode Pallas on CPU)."""
    import dataclasses

    import flowdec_tpu.ops.groupnorm_pallas as gnp
    from flowdec_tpu.nn import NCSNpp, NCSNppConfig

    base = dict(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, image_size=32,
        bottleneck_attn=False, attn_resolutions=(),
    )
    m_plain = NCSNpp(NCSNppConfig(**base))
    m_fused = NCSNpp(NCSNppConfig(**base, fused_groupnorm=True))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16, 2))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16, 2))
    t = jnp.full((1,), 0.5)
    params = m_plain.init(jax.random.PRNGKey(2), x, y, t)

    # force interpret mode on CPU for the fused path
    orig = gnp._fused_fwd_impl
    gnp_fused = lambda xx, ss, bb, g, e, ht, interp=False: orig(xx, ss, bb, g, e, ht, True)
    try:
        gnp._fused_fwd_impl, saved = gnp_fused, orig
        import flax

        pf = flax.traverse_util.flatten_dict(
            m_fused.init(jax.random.PRNGKey(2), x, y, t)["params"]
        )
        pp = flax.traverse_util.flatten_dict(params["params"])
        assert set(pf) == set(pp), "fused GN changed the parameter tree"

        o_plain = m_plain.apply(params, x, y, t)
        o_fused = m_fused.apply(params, x, y, t)
        np.testing.assert_allclose(
            np.asarray(o_plain), np.asarray(o_fused), atol=5e-5
        )
    finally:
        gnp._fused_fwd_impl = saved


# ---------------------------------------------------------------------------
# Pallas conv3x3 (interpret mode on CPU; compiled path measured on TPU)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(2, 8, 10, 8, 16), (1, 16, 12, 16, 8)])
def test_conv3x3_pallas_matches_lax(shape):
    from flowdec_tpu.ops.conv3x3_pallas import conv3x3_pallas, conv3x3_reference

    b_, h, w_, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b_, h, w_, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    got = conv3x3_pallas(x, w, bias, interpret=True)
    ref = conv3x3_reference(x, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 8, 10, 32, 16, 8), (1, 16, 12, 16, 32, 4)])
def test_gn_silu_conv3x3_fused_matches_reference(shape):
    from flowdec_tpu.ops.gn_act_conv_pallas import (
        gn_silu_conv3x3,
        gn_silu_conv3x3_reference,
    )

    b_, h, w_, ci, co, g = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b_, h, w_, ci)).astype(np.float32))
    s = jnp.asarray(rng.random(ci).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.standard_normal(ci).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)
    got = gn_silu_conv3x3(x, s, bi, w, bc, g, 1e-6, True)
    ref = gn_silu_conv3x3_reference(x, s, bi, w, bc, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_backbone_fused_gn_conv_matches_unfused(monkeypatch):
    """fused_gn_conv=True must be a pure perf knob: identical params tree,
    near-identical outputs (forced interpret-mode Pallas on CPU)."""
    import flax

    from flowdec_tpu.nn import NCSNpp, NCSNppConfig

    monkeypatch.setenv("FLOWDEC_FUSED_GN_CONV_FORCE", "1")
    base = dict(
        nf=16, ch_mult=(1, 2), num_res_blocks=1, image_size=32,
        bottleneck_attn=False, attn_resolutions=(),
    )
    m_plain = NCSNpp(NCSNppConfig(**base))
    m_fused = NCSNpp(NCSNppConfig(**base, fused_gn_conv=True))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16, 2))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16, 2))
    t = jnp.full((1,), 0.5)
    params = m_plain.init(jax.random.PRNGKey(2), x, y, t)

    pf = flax.traverse_util.flatten_dict(
        m_fused.init(jax.random.PRNGKey(2), x, y, t)["params"]
    )
    pp = flax.traverse_util.flatten_dict(params["params"])
    assert set(pf) == set(pp), "fused GN+conv changed the parameter tree"

    o_plain = m_plain.apply(params, x, y, t)
    o_fused = m_fused.apply(params, x, y, t)
    np.testing.assert_allclose(
        np.asarray(o_plain), np.asarray(o_fused), atol=5e-5
    )


@pytest.mark.parametrize("shape", [(2, 8, 10, 32, 16, 8), (1, 16, 12, 16, 32, 4),
                                   (1, 6, 9, 8, 8, 2)])
def test_gn_silu_conv3x3_v2_matches_reference(shape):
    from flowdec_tpu.ops.gn_act_conv_pallas import (
        gn_silu_conv3x3_reference,
        gn_silu_conv3x3_v2,
    )

    b_, h, w_, ci, co, g = shape
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b_, h, w_, ci)).astype(np.float32))
    s = jnp.asarray(rng.random(ci).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.standard_normal(ci).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)
    got = gn_silu_conv3x3_v2(x, s, bi, w, bc, g, 1e-6, True)
    ref = gn_silu_conv3x3_reference(x, s, bi, w, bc, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_gn_silu_conv3x3_v2_backward():
    from flowdec_tpu.ops.gn_act_conv_pallas import (
        gn_silu_conv3x3_reference,
        gn_silu_conv3x3_v2,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    s = jnp.asarray(rng.random(16).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)

    gf = jax.grad(lambda *a: jnp.sum(jnp.square(
        gn_silu_conv3x3_v2(*a, 4, 1e-6, True))), argnums=(0, 1, 2, 3, 4))(
            x, s, bi, w, bc)
    gr = jax.grad(lambda *a: jnp.sum(jnp.square(
        gn_silu_conv3x3_reference(*a, 4, 1e-6))), argnums=(0, 1, 2, 3, 4))(
            x, s, bi, w, bc)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 8, 10, 32, 16, 8), (1, 16, 12, 16, 32, 4)])
def test_gn_silu_conv3x3_v3_matches_reference(shape):
    from flowdec_tpu.ops.gn_act_conv_pallas import (
        gn_silu_conv3x3_reference,
        gn_silu_conv3x3_v3,
    )

    b_, h, w_, ci, co, g = shape
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b_, h, w_, ci)).astype(np.float32))
    s = jnp.asarray(rng.random(ci).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.standard_normal(ci).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.1)
    bc = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)
    got = gn_silu_conv3x3_v3(x, s, bi, w, bc, g, 1e-6, True)
    ref = gn_silu_conv3x3_reference(x, s, bi, w, bc, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_group_stats_passthrough_numerics():
    """stats_op sums/grads + GroupNorm wiring parity for the opaque Pallas
    stats pass (FLOWDEC_GN_STATS=pallas), interpret mode on CPU."""
    from flowdec_tpu.ops.group_stats_pallas import group_stats_passthrough, stats_op

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 16)), jnp.float32)
    xp, s1, s2 = stats_op(x, True)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(x))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(x.sum(1)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray((x**2).sum(1)), rtol=1e-5)

    def f(x):
        xp, a, b = stats_op(x, True)
        return (xp * 2.0).sum() + a.sum() * 0.5 + (b * 0.25).sum()

    def f_ref(x):
        return (x * 2.0).sum() + x.sum(1).sum() * 0.5 + ((x**2).sum(1) * 0.25).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(f_ref)(x)), rtol=1e-5
    )

    x4 = jnp.asarray(rng.standard_normal((2, 8, 6, 32)), jnp.float32)
    _, mean, _ = group_stats_passthrough(x4, 8, 1e-6, interpret=True)
    m_ref = (
        np.asarray(x4).reshape(2, 48, 8, 4).transpose(0, 2, 1, 3)
        .reshape(2, 8, -1).mean(-1)
    )
    np.testing.assert_allclose(np.asarray(mean), m_ref, rtol=1e-5)


def test_groupnorm_pallas_stats_matches_plain(monkeypatch):
    from flowdec_tpu.nn.layers import GroupNorm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 32)), jnp.float32)
    gn = GroupNorm(num_groups=8)
    params = gn.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p + 0.1, params)
    y_plain = gn.apply(params, x)
    monkeypatch.setenv("FLOWDEC_GN_STATS_FORCE", "1")
    y_pallas = gn.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_plain), rtol=2e-5, atol=2e-5
    )
