"""Weight-converter tests: the torch `all_modules.{idx}` layout derived from
the config must map bijectively onto our structured Flax tree.

Strategy: take our initialized params, reverse-map them into a synthetic
torch-style state dict (inverting every transform), run the converter, and
require exact round-trip equality over the full tree — this proves index
order, scope names, and tensor transforms are mutually consistent for every
module kind."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowdec_tpu.convert import (
    convert_ncsnpp_state_dict,
    expected_torch_keys,
    reference_module_layout,
)
from flowdec_tpu.nn import NCSNpp, NCSNppConfig

FLOWDEC_LIKE = NCSNppConfig(
    nf=8, ch_mult=(4, 4, 4, 2), num_res_blocks=1, attn_resolutions=(),
    bottleneck_attn=False, image_size=64, output_kernel_size=1, output_bias=False,
)
SGMSE_LIKE = NCSNppConfig(
    nf=8, ch_mult=(1, 1, 2), num_res_blocks=2, attn_resolutions=(16,),
    bottleneck_attn=True, image_size=64, output_kernel_size=3, output_bias=False,
)


def _conv_ti(w):  # HWIO → OIHW
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _reverse_map(params, cfg) -> dict:
    """Our flax tree → synthetic torch state dict ('backbone.' prefixed)."""
    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flax.traverse_util.flatten_dict(params["params"]).items()
    }
    sd = {}
    layout = reference_module_layout(cfg)
    for idx, (kind, scope) in enumerate(layout):
        base = f"backbone.all_modules.{idx}"
        sub = {k[len(scope) + 1:]: v for k, v in flat.items() if k.startswith(scope + "/")}
        if kind == "fourier":
            sd[f"{base}.W"] = sub["W"]
        elif kind == "linear":
            sd[f"{base}.weight"] = sub["kernel"].T
            sd[f"{base}.bias"] = sub["bias"]
        elif kind == "conv":
            sd[f"{base}.weight"] = _conv_ti(sub["Conv_0/kernel"])
            if "Conv_0/bias" in sub:
                sd[f"{base}.bias"] = sub["Conv_0/bias"]
        elif kind == "groupnorm":
            sd[f"{base}.weight"] = sub["scale"]
            sd[f"{base}.bias"] = sub["bias"]
        elif kind == "combine":
            sd[f"{base}.Conv_0.weight"] = _conv_ti(sub["Conv_0/Conv_0/kernel"])
            sd[f"{base}.Conv_0.bias"] = sub["Conv_0/Conv_0/bias"]
        elif kind == "attn":
            sd[f"{base}.GroupNorm_0.weight"] = sub["GroupNorm_0/scale"]
            sd[f"{base}.GroupNorm_0.bias"] = sub["GroupNorm_0/bias"]
            for i in range(4):
                sd[f"{base}.NIN_{i}.W"] = sub[f"NIN_{i}/W"]
                sd[f"{base}.NIN_{i}.b"] = sub[f"NIN_{i}/b"]
        elif kind == "resblock":
            sd[f"{base}.GroupNorm_0.weight"] = sub["GroupNorm_0/scale"]
            sd[f"{base}.GroupNorm_0.bias"] = sub["GroupNorm_0/bias"]
            sd[f"{base}.Conv_0.weight"] = _conv_ti(sub["Conv_0/Conv_0/kernel"])
            sd[f"{base}.Conv_0.bias"] = sub["Conv_0/Conv_0/bias"]
            if "Dense_0/Dense_0/kernel" in sub:
                sd[f"{base}.Dense_0.weight"] = sub["Dense_0/Dense_0/kernel"].T
                sd[f"{base}.Dense_0.bias"] = sub["Dense_0/Dense_0/bias"]
            sd[f"{base}.GroupNorm_1.weight"] = sub["GroupNorm_1/scale"]
            sd[f"{base}.GroupNorm_1.bias"] = sub["GroupNorm_1/bias"]
            sd[f"{base}.Conv_1.weight"] = _conv_ti(sub["Conv_1/Conv_0/kernel"])
            sd[f"{base}.Conv_1.bias"] = sub["Conv_1/Conv_0/bias"]
            if "Conv_2/Conv_0/kernel" in sub:
                sd[f"{base}.Conv_2.weight"] = _conv_ti(sub["Conv_2/Conv_0/kernel"])
                sd[f"{base}.Conv_2.bias"] = sub["Conv_2/Conv_0/bias"]
            if "NIN_0/W" in sub:
                sd[f"{base}.NIN_0.W"] = sub["NIN_0/W"]
                sd[f"{base}.NIN_0.b"] = sub["NIN_0/b"]
        elif kind == "resample":
            if "weight" in sub:
                sd[f"{base}.Conv2d_0.weight"] = _conv_ti(sub["weight"])
                sd[f"{base}.Conv2d_0.bias"] = sub["bias"]
            elif "Conv_0/Conv_0/kernel" in sub:
                sd[f"{base}.Conv_0.weight"] = _conv_ti(sub["Conv_0/Conv_0/kernel"])
                sd[f"{base}.Conv_0.bias"] = sub["Conv_0/Conv_0/bias"]

    if "output_layer/kernel" in flat:
        sd["backbone.output_layer.weight"] = _conv_ti(flat["output_layer/kernel"])
    if "output_layer/bias" in flat:
        sd["backbone.output_layer.bias"] = flat["output_layer/bias"]
    return sd


@pytest.mark.parametrize("cfg", [FLOWDEC_LIKE, SGMSE_LIKE], ids=["flowdec", "sgmse"])
def test_roundtrip_exact(cfg):
    model = NCSNpp(cfg)
    f = cfg.image_size
    t_frames = 2 ** len(cfg.ch_mult)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, f, t_frames, 2))
    params = model.init(jax.random.PRNGKey(1), x, x, jnp.zeros((1,)))

    sd = _reverse_map(params, cfg)
    restored = convert_ncsnpp_state_dict(sd, cfg)

    flat_a = flax.traverse_util.flatten_dict(params["params"])
    flat_b = flax.traverse_util.flatten_dict(restored["params"])
    assert set(flat_a) == set(flat_b), (
        f"missing: {set(flat_a) - set(flat_b)}; extra: {set(flat_b) - set(flat_a)}"
    )
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=str(k))

    # converted weights actually run
    out = model.apply(restored, x, x, jnp.zeros((1,)))
    ref = model.apply(params, x, x, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_module_count_mismatch_raises():
    sd = {"backbone.all_modules.0.W": np.zeros(8)}
    with pytest.raises(ValueError, match="mismatch"):
        convert_ncsnpp_state_dict(sd, FLOWDEC_LIKE)


def test_expected_keys_cover_layout():
    keys = expected_torch_keys(FLOWDEC_LIKE)
    layout = reference_module_layout(FLOWDEC_LIKE)
    # flowdec-final layout: fourier + 2 linear + conv_in + 4 down blocks +
    # 3 downsample resblocks + 3 combines + 2 mid + 8 up blocks +
    # 4 (GN + pyramid conv) + 3 upsample resblocks = 35 modules
    assert len(layout) == 35
    assert any("all_modules.0.W" in k for k in keys)
    idxs = {int(k.split(".")[1]) for k in keys}
    assert max(idxs) == len(layout) - 1
