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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# DAC → NDAC conversion
# ---------------------------------------------------------------------------


def _torch_dac(cfg):
    """Minimal torch replica of descript-audio-codec 1.0.0's module tree
    (same state-dict key names), used as the conversion oracle."""
    import math

    import torch
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    def WNConv1d(*a, **k):
        return weight_norm(tnn.Conv1d(*a, **k))

    def WNConvT1d(*a, **k):
        return weight_norm(tnn.ConvTranspose1d(*a, **k))

    class Snake1d(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            self.alpha = tnn.Parameter(torch.rand(1, ch, 1) + 0.5)

        def forward(self, x):
            return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x) ** 2

    class ResidualUnit(tnn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            pad = ((7 - 1) * dilation) // 2
            self.block = tnn.Sequential(
                Snake1d(dim),
                WNConv1d(dim, dim, 7, dilation=dilation, padding=pad),
                Snake1d(dim),
                WNConv1d(dim, dim, 1),
            )

        def forward(self, x):
            return x + self.block(x)

    class EncoderBlock(tnn.Module):
        def __init__(self, dim, stride):
            super().__init__()
            self.block = tnn.Sequential(
                ResidualUnit(dim // 2, 1),
                ResidualUnit(dim // 2, 3),
                ResidualUnit(dim // 2, 9),
                Snake1d(dim // 2),
                WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                         padding=math.ceil(stride / 2)),
            )

        def forward(self, x):
            return self.block(x)

    class DecoderBlock(tnn.Module):
        def __init__(self, in_dim, out_dim, stride):
            super().__init__()
            self.block = tnn.Sequential(
                Snake1d(in_dim),
                WNConvT1d(in_dim, out_dim, 2 * stride, stride=stride,
                          padding=math.ceil(stride / 2)),
                ResidualUnit(out_dim, 1),
                ResidualUnit(out_dim, 3),
                ResidualUnit(out_dim, 9),
            )

        def forward(self, x):
            return self.block(x)

    class Quantizer(tnn.Module):
        def __init__(self):
            super().__init__()
            mods = []
            for _ in range(cfg.n_codebooks):
                m = tnn.Module()
                m.in_proj = WNConv1d(cfg.latent_dim, cfg.codebook_dim, 1)
                m.out_proj = WNConv1d(cfg.codebook_dim, cfg.latent_dim, 1)
                m.codebook = tnn.Embedding(cfg.codebook_size, cfg.codebook_dim)
                mods.append(m)
            self.quantizers = tnn.ModuleList(mods)

        def from_codes(self, codes):
            z_q = 0.0
            for i in range(codes.shape[1]):
                z_p = self.quantizers[i].codebook(codes[:, i]).transpose(1, 2)
                z_q = z_q + self.quantizers[i].out_proj(z_p)
            return z_q

    class DAC(tnn.Module):
        def __init__(self):
            super().__init__()
            d = cfg.encoder_dim
            enc = [WNConv1d(1, d, 7, padding=3)]
            for s in cfg.encoder_rates:
                d *= 2
                enc.append(EncoderBlock(d, s))
            enc += [Snake1d(d), WNConv1d(d, cfg.latent_dim, 3, padding=1)]
            self.encoder = tnn.Module()
            self.encoder.block = tnn.Sequential(*enc)
            self.quantizer = Quantizer()
            d = cfg.decoder_dim
            dec = [WNConv1d(cfg.latent_dim, d, 7, padding=3)]
            for s in reversed(cfg.encoder_rates):
                dec.append(DecoderBlock(d, d // 2, s))
                d //= 2
            dec += [Snake1d(d), WNConv1d(d, 1, 7, padding=3), tnn.Tanh()]
            self.decoder = tnn.Module()
            self.decoder.model = tnn.Sequential(*dec)

    torch.manual_seed(0)
    return DAC()


def test_dac_converter_forward_parity():
    """Converted DAC weights reproduce torch's encoder, from_codes, and
    decoder outputs in NDAC (validates every layout transform incl. the
    ConvTranspose flip and weight-norm folding)."""
    import numpy as np
    import torch

    from flowdec_tpu.codec.ndac import NDAC, NDACConfig
    from flowdec_tpu.convert import convert_dac_state_dict, expected_dac_torch_keys

    cfg = NDACConfig(
        sampling_rate=16000, encoder_dim=4, encoder_rates=(2, 4),
        decoder_dim=16, latent_dim=12, n_codebooks=3,
        codebook_size=32, codebook_dim=4,
    )
    tm = _torch_dac(cfg)
    sd = tm.state_dict()
    assert set(sd.keys()) == set(expected_dac_torch_keys(cfg))
    params = convert_dac_state_dict(sd, cfg)

    model = NDAC(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64)).astype(np.float32) * 0.3

    with torch.no_grad():
        z_t = tm.encoder.block(torch.from_numpy(x[:, None, :])).numpy()
    z_j = model.apply(
        params, jnp.asarray(x), method=lambda m, a: m.encoder(m.preprocess(a))
    )
    np.testing.assert_allclose(
        np.asarray(z_j), np.transpose(z_t, (0, 2, 1)), atol=1e-4
    )

    codes = rng.integers(0, cfg.codebook_size, (2, cfg.n_codebooks, 8))
    with torch.no_grad():
        zq_t = tm.quantizer.from_codes(torch.from_numpy(codes)).numpy()
    zq_j = model.apply(params, jnp.asarray(codes), method=NDAC.from_codes)
    np.testing.assert_allclose(
        np.asarray(zq_j), np.transpose(zq_t, (0, 2, 1)), atol=1e-4
    )

    zq = rng.standard_normal((2, 8, cfg.latent_dim)).astype(np.float32)
    with torch.no_grad():
        wav_t = tm.decoder.model(torch.from_numpy(np.transpose(zq, (0, 2, 1)))).numpy()
    wav_j = model.apply(params, jnp.asarray(zq), method=NDAC.decode)
    np.testing.assert_allclose(np.asarray(wav_j), wav_t[:, 0, :], atol=1e-4)


def test_dac_keys_match_vendored_1_0_0_manifest():
    """expected_dac_torch_keys / convert_dac_state_dict pinned against the
    VENDORED dac 1.0.0 44 kHz key+shape manifest
    (tests/data/dac_1_0_0_44khz_state_dict_manifest.json, generated by
    scripts/vendor/dac_manifest_gen.py as a transcription of the published
    descript-audio-codec 1.0.0 module definitions) — an anchor independent
    of both the converter and the in-test torch replica, closing the
    replica↔converter circularity: a shared misread of the real DAC
    architecture would now fail here."""
    import json
    import os

    import jax
    import numpy as np

    from flowdec_tpu.codec.ndac import NDAC, NDACConfig
    from flowdec_tpu.convert import convert_dac_state_dict, expected_dac_torch_keys

    manifest_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "dac_1_0_0_44khz_state_dict_manifest.json")
    manifest = json.load(open(manifest_path))

    # the published 44 kHz DAC 1.0.0 geometry (dac/utils: DAC(encoder_dim=64,
    # encoder_rates=[2,4,8,8], latent_dim=1024, decoder_dim=1536,
    # n_codebooks=9, codebook_size=1024, codebook_dim=8))
    cfg = NDACConfig(
        sampling_rate=44100, encoder_dim=64, encoder_rates=(2, 4, 8, 8),
        decoder_dim=1536, latent_dim=1024, n_codebooks=9,
        codebook_size=1024, codebook_dim=8,
    )
    expected = expected_dac_torch_keys(cfg)
    assert len(expected) == len(set(expected))
    assert set(expected) == set(manifest), (
        sorted(set(expected) ^ set(manifest))[:10]
    )

    # shape fidelity: a state dict with the manifest's exact shapes must
    # convert into exactly the params tree NDAC initializes at this geometry
    sd = {k: np.full(shape, 0.1, np.float32) for k, shape in manifest.items()}
    params = convert_dac_state_dict(sd, cfg)

    model = NDAC(cfg)
    hop = cfg.hop_length
    ref = jax.eval_shape(
        lambda k, x: model.init(k, x, cfg.n_codebooks),
        jax.random.PRNGKey(0), jnp.zeros((1, 4 * hop), jnp.float32),
    )
    conv_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), params)
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref)
    assert conv_shapes == ref_shapes
