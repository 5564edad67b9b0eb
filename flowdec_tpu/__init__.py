"""FlowDec-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio-codec postfilter framework.

A from-scratch rebuild of the capabilities of facebookresearch/FlowDec
(ICLR 2025, https://openreview.net/forum?id=uxDFlPGRLX): a 48 kHz full-band
general-audio neural codec pipeline consisting of an underlying non-adversarial
codec (NDAC, a DAC-style residual-VQ codec) and a conditional-flow-matching
stochastic postfilter operating on amplitude-compressed complex STFT features.

Layout (idiomatic JAX, not a port):
  ops/       pure-function DSP: STFT/ISTFT, compression, upfirdn, resampling,
             overlap-add streaming
  nn/        Flax modules: NCSN++ U-Net backbone and its layers
  flow/      CFM bridges, SDE closed forms, scan-fused ODE/PC samplers
  models/    FlowModel / ScoreModel / RegressionModel tasks (train + enhance)
  codec/     NDAC codec (encoder, RVQ, decoder) in JAX
  data/      paired-audio dataset and WAV I/O
  train/     train state (params + EMA), pjit train loops, Orbax checkpoints
  eval/      SI-SXR, LogSpecMSE and host-side metric wrappers
  parallel/  device-mesh and sharding helpers
  losses/    auxiliary finetuning losses (multi-scale STFT / mel / CQT)
"""

__version__ = "0.1.0"

# Honor the user's JAX_PLATFORMS even when an accelerator plugin overrides
# it (observed: the env var alone is ignored and jax silently initializes
# the TPU backend — `JAX_PLATFORMS=cpu python ...` ran on the chip). The
# config update below is authoritative; no-op once a backend exists.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # already initialized or unknown platform string
        pass

# Persistent XLA compilation cache for every CLI/entry point (VERDICT r3 #3):
# relaunches after a tunnel hang recompile from disk in seconds instead of
# re-paying 15-25 min. See utils/compile_cache.py; FLOWDEC_NO_COMPILE_CACHE=1
# opts out.
from flowdec_tpu.utils.compile_cache import enable_compilation_cache as _ecc

_ecc()
del _ecc
