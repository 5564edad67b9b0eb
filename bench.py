"""Headline benchmark: FlowDec-75m postfilter real-time factor on one TPU chip.

Measures the full enhance pipeline — preprocess (compressed STFT), N=3
midpoint ODE (NFE=6, the paper's main operating point, demo.ipynb cell 4 /
enhance.py:28), postprocess (inverse STFT) — on a 10 s 48 kHz waveform,
steady-state (compile excluded, block_until_ready).

Prints one JSON line. vs_baseline is RTF / 50: BASELINE.json's north star is
>50× real time per chip (the reference publishes no RTF numbers; its harness
is enhance.py:120-136).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from flowdec_tpu.models import AmplitudeCompressedComplexSTFT, FlowModel
    from flowdec_tpu.models import sigma_models
    from flowdec_tpu.nn import FLOWDEC_FINAL_NO_ATTN, NCSNpp

    sr = 48000
    seconds = 10.0
    n_steps, solver = 3, "midpoint"  # NFE = 6

    model = FlowModel(
        backbone=NCSNpp(FLOWDEC_FINAL_NO_ATTN),
        feature_extractor=AmplitudeCompressedComplexSTFT(
            n_fft=1534, sampling_rate=sr, alpha=0.3, beta=0.33, n_hops=4
        ),
        sampling_rate=sr,
        sigma_y=jnp.asarray(
            sigma_models.from_file("flowdec_autoparams_75m.npy", kernel_bandwidth=3)
        ),
    )
    length = int(seconds * sr)
    frames = 1 + length // model.feature_extractor.complex_stft.stft_config.hop
    pad_frames = -(-frames // 64) * 64
    params = model.init_params(jax.random.PRNGKey(0), frames=pad_frames)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, length)) * 0.1, dtype=jnp.float32)

    @jax.jit
    def enhance(params, y, key):
        return model.enhance(params, key, y, n_steps=n_steps, solver=solver)

    key = jax.random.PRNGKey(1)
    # compile + warmup
    enhance(params, y, key).block_until_ready()

    iters = 10
    start = time.perf_counter()
    for i in range(iters):
        out = enhance(params, y, jax.random.fold_in(key, i))
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    rtf = seconds * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "flowdec75m_enhance_rtf_nfe6",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
