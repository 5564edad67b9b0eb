"""Model-summary utility (parity: torchinfo.summary at startup, train.py:79)."""

import pytest
import jax
import jax.numpy as jnp

from flowdec_tpu.utils import count_params, model_summary


def _params():
    return {
        "params": {
            "Conv_0": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros(8)},
            "Dense_0": {"kernel": jnp.zeros((8, 2))},
        }
    }


def test_count_params():
    assert count_params(_params()) == 3 * 3 * 4 * 8 + 8 + 8 * 2


def test_model_summary_groups_and_total():
    s = model_summary(_params(), title="toy")
    assert "toy summary" in s
    assert f"{3 * 3 * 4 * 8 + 8 + 16:,}" in s
    assert "Conv_0" in s and "Dense_0" in s


@pytest.mark.slow
def test_model_summary_real_backbone():
    from flowdec_tpu.nn import NCSNpp, NCSNppConfig

    cfg = NCSNppConfig(nf=8, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(), bottleneck_attn=False,
                       image_size=16)
    net = NCSNpp(cfg)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 2)), jnp.zeros((1, 16, 16, 2)),
                      jnp.zeros((1,)))
    s = model_summary(params)
    assert "params in" in s
