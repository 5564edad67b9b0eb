"""Sweeper tests: distribution parsing, TPE convergence, sweep-loop plumbing
(capability parity with the reference's hydra-optuna-sweeper workflow,
reference train.py:117-122)."""

import json
import os

import numpy as np
import pytest

from flowdec_tpu.train.sweep import (
    Choice,
    LogUniform,
    QUniform,
    TPESampler,
    Uniform,
    parse_space,
    run_sweep,
)


def test_parse_space():
    space = parse_space([
        "lr=loguniform(1e-5,1e-3)",
        "sigma=uniform(0.1,0.9)",
        "nf=quniform(32,128,32)",
        "solver=choice(euler,midpoint,heun2)",
        "depth=4,6,8",
    ])
    assert isinstance(space["lr"], LogUniform)
    assert isinstance(space["sigma"], Uniform)
    assert isinstance(space["nf"], QUniform)
    assert space["solver"] == Choice(("euler", "midpoint", "heun2"))
    assert space["depth"] == Choice((4, 6, 8))
    rng = np.random.default_rng(0)
    for d in space.values():
        v = d.sample(rng)
        assert 0.0 <= d.to_unit(v) <= max(1.0, d.to_unit(v))
    assert space["nf"].sample(rng) % 32 == 0


def test_distribution_unit_roundtrip():
    rng = np.random.default_rng(1)
    for d in [Uniform(-2, 5), LogUniform(1e-6, 1.0), QUniform(0, 100, 10)]:
        for _ in range(20):
            v = d.sample(rng)
            assert abs(float(d.from_unit(d.to_unit(v))) - float(v)) < 1e-9


def test_tpe_beats_random_on_quadratic():
    """TPE should concentrate near the optimum of a smooth objective and find
    a better best-value than pure random with the same budget."""
    space = {"x": Uniform(-5, 5), "y": Uniform(-5, 5)}

    def f(p):
        return (p["x"] - 1.7) ** 2 + (p["y"] + 0.3) ** 2

    res = run_sweep(f, space, n_trials=60, direction="minimize", seed=0)
    rng = np.random.default_rng(0)
    random_best = min(
        f({k: d.sample(rng) for k, d in space.items()}) for _ in range(60)
    )
    assert res["best_value"] < 0.5
    assert res["best_value"] <= random_best * 1.5
    assert abs(res["best_params"]["x"] - 1.7) < 1.0


def test_tpe_maximize_and_choice():
    space = {"s": Choice(("a", "b", "c")), "x": Uniform(0, 1)}

    def f(p):
        return (2.0 if p["s"] == "b" else 0.0) + p["x"]

    res = run_sweep(f, space, n_trials=40, direction="maximize", seed=1)
    assert res["best_params"]["s"] == "b"
    assert res["best_value"] > 2.5


def test_sweep_persistence_and_resume(tmp_path):
    space = {"x": Uniform(0, 1)}
    calls = []

    def f(p):
        calls.append(p)
        return p["x"]

    d = str(tmp_path / "sw")
    r1 = run_sweep(f, space, n_trials=5, seed=0, sweep_dir=d)
    assert len(calls) == 5
    lines = open(os.path.join(d, "trials.jsonl")).read().splitlines()
    assert len(lines) == 5
    best = json.load(open(os.path.join(d, "best.json")))
    assert best["best_value"] == pytest.approx(r1["best_value"])
    # resume: 5 existing trials count toward the budget
    run_sweep(f, space, n_trials=8, seed=0, sweep_dir=d)
    assert len(calls) == 8
    assert len(open(os.path.join(d, "trials.jsonl")).read().splitlines()) == 8


def test_sweep_survives_failed_trials():
    space = {"x": Uniform(0, 1)}
    n = [0]

    def f(p):
        n[0] += 1
        if n[0] % 3 == 0:
            raise RuntimeError("boom")
        return p["x"]

    res = run_sweep(f, space, n_trials=9, seed=0)
    assert res["best_value"] is not None
    failed = [r for r in res["trials"] if r["value"] is None]
    assert len(failed) == 3
