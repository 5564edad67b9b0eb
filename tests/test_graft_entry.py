"""Driver-contract tests: entry() is jittable; dryrun_multichip executes a
DP+FSDP-sharded train step on virtual devices."""

import sys
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full e2e / compile-heavy: nightly tier

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_lowers():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    txt = lowered.as_text()
    assert "convolution" in txt
    # flagship geometry: 768 bins × 256 frames cpair in/out
    params, xt, y, t = args
    assert xt.shape == (1, 768, 256, 2) and y.shape == (1, 768, 256, 2)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 20e6 < n_params < 80e6


def test_dryrun_multichip_small():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)  # 2-device mesh keeps the test fast
