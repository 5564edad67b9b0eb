"""NDAC codec training step (non-adversarial).

The reference consumes NDAC as a pretrained external package; training it is
part of the pipeline's capability surface (the paper retrains DAC without
adversarial losses). One jitted step: multi-scale mel + multi-scale STFT +
waveform L1 reconstruction losses + RVQ commitment/codebook terms, Adam, EMA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowdec_tpu.losses import (
    ComplexSTFTLoss,
    MelSpectrogramLoss,
    MultiScaleSTFTLoss,
    SNRLoss,
    WaveformL1Loss,
)
from flowdec_tpu.parallel.mesh import DATA_AXIS
from flowdec_tpu.train.state import TrainState

__all__ = [
    "CodecLossWeights",
    "codec_optimizer",
    "make_codec_train_step",
    "create_codec_train_state",
    "load_codec",
]


def codec_optimizer(
    lr: float = 1e-4,
    *,
    grad_clip: Optional[float] = 1.0,
    lr2: Optional[float] = None,
    switch_step: Optional[int] = None,
) -> optax.GradientTransformation:
    """The codec training optimizer: AdamW(0.8, 0.99, wd=1e-2) behind
    global-norm gradient clipping (torch DAC trains with AdamW too; the
    decoupled decay counters Adam's scale-free magnitude random-walk on
    these un-weight-normed convs). Clipping is LOAD-BEARING: at init the RVQ
    commitment/codebook terms are huge (random codebooks vs a live encoder,
    ~1e3 on real 48 kHz audio) and grow geometrically for the first steps —
    unclipped, the first real campaign NaN'd by step 50. One builder shared
    by scripts/train_codec.py and load_codec; the training CLI records its
    (lr, grad_clip) in config.json so load_codec rebuilds the same opt_state
    tree structure.

    lr2/switch_step build a piecewise-constant schedule (lr until
    switch_step, then lr2): the measured v3→v4 codec recipe — alignment
    losses peak at lr 1e-4 then drift from RVQ codebook churn; a cold
    3e-5 refine recovers and surpasses the peak (CAMPAIGN.md r4 §2-3) —
    in ONE run and ONE compiled graph instead of two runs with a second
    10-15 min remote compile between them."""
    if lr2 is not None:
        if switch_step is None:
            raise ValueError("lr2 requires switch_step")
        lr = optax.join_schedules(
            [optax.constant_schedule(lr), optax.constant_schedule(lr2)],
            [switch_step],
        )
    adam = optax.adamw(lr, b1=0.8, b2=0.99, weight_decay=1e-2)
    if grad_clip is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(grad_clip), adam)


class CodecLossWeights:
    """Loss mix for non-adversarial codec training (DAC-paper-style weights
    minus the GAN terms)."""

    def __init__(
        self,
        mel: float = 15.0,
        stft: float = 1.0,
        waveform: float = 1.0,
        complex_stft: float = 1.0,
        snr: float = 0.0,
        commitment: float = 0.25,
        codebook: float = 1.0,
    ):
        self.mel = mel
        self.stft = stft
        self.waveform = waveform
        # phase-aware terms: magnitude-only training left the r3 codec at
        # SI-SDR −40 dB (phase never constrained). complex_stft penalizes
        # phase rotation per bin (losses.ComplexSTFTLoss); snr is the direct
        # time-domain alignment objective (losses.SNRLoss), self-normalizing
        # where waveform L1's gradient gets swamped by the spectral terms.
        self.complex_stft = complex_stft
        self.snr = snr
        self.commitment = commitment
        self.codebook = codebook

    def as_dict(self) -> dict:
        return dict(
            mel=self.mel, stft=self.stft, waveform=self.waveform,
            complex_stft=self.complex_stft, snr=self.snr,
            commitment=self.commitment, codebook=self.codebook,
        )


def create_codec_train_state(codec, key, optimizer, *, length: int = 8192) -> TrainState:
    params = codec.init(key, jnp.zeros((1, length)))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def load_codec(ckpt_dir: str, *, ema: bool = True, step: Optional[int] = None):
    """Config-free codec reload: (codec, params, config) from a
    scripts/train_codec.py checkpoint dir — the NDAC counterpart of
    checkpoints.load_model (the reference's `dac_utils.load_model(...)`,
    demo.ipynb cell 3, but against checkpoints this framework trains)."""
    from flowdec_tpu.codec.ndac import NDAC, NDACConfig
    from flowdec_tpu.train.checkpoints import CheckpointManager, load_config_json

    full_cfg = load_config_json(ckpt_dir)
    raw = dict(full_cfg["codec"])
    raw["encoder_rates"] = tuple(raw["encoder_rates"])  # JSON arrays → tuple
    cfg = NDACConfig(**raw)
    codec = NDAC(cfg)
    # Rebuild the optimizer from the RECORDED settings so the restore
    # template's opt_state tree matches what the checkpoint saved (a
    # --grad-clip 0 run saves a bare-adamw state; the default clip-wrapped
    # template would fail StandardRestore). Checkpoints from before the
    # settings were recorded fall back to the defaults they were trained with.
    opt_cfg = full_cfg.get("optimizer", {})
    optimizer = codec_optimizer(
        opt_cfg.get("lr", 1e-4),
        grad_clip=opt_cfg.get("grad_clip", 1.0),
        lr2=opt_cfg.get("lr2"),
        switch_step=opt_cfg.get("switch_step"),
    )
    state = create_codec_train_state(
        codec, jax.random.PRNGKey(0), optimizer, length=8 * cfg.hop_length
    )
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state, step=step)
    mgr.close()
    return codec, state.eval_params(ema=ema), cfg


def load_codec_archive(path: str):
    """Load a codec from a scripts/archive_ckpt.py .npz archive.

    The archive carries inference params only (raw tree by default — EMA is
    destructive for this codec family) and the NDACConfig; it exists so the
    trained-codec artifact can live IN the repo and survive scratch-disk
    loss (CAMPAIGN.md r4 §7). Returns (codec, params, config) like
    :func:`load_codec`.
    """
    from flowdec_tpu.codec.ndac import NDAC, NDACConfig
    from flowdec_tpu.utils.archive import load_archive

    params, config, _meta = load_archive(path)
    raw = dict(config["codec"])
    raw["encoder_rates"] = tuple(raw["encoder_rates"])
    cfg = NDACConfig(**raw)
    params = jax.tree.map(jnp.asarray, params)
    return NDAC(cfg), params, cfg


def make_codec_train_step(
    codec,
    optimizer: optax.GradientTransformation,
    *,
    weights: Optional[CodecLossWeights] = None,
    ema_decay: float = 0.999,
    n_quantizers_dropout: bool = True,
    nq_min: int = 1,
    mesh: Optional[Mesh] = None,
):
    """Jitted codec step: (state, x_batch, key) → (state, metrics).

    n_quantizers_dropout=True trains all bitrates jointly (the DAC quantizer-
    dropout recipe): each SAMPLE uses a random prefix length of codebooks,
    drawn inside the jitted step (per-sample masking, one compiled graph).
    nq_min raises the dropout's lower bound: ultra-low-bitrate samples
    (nq 1-3) can never waveform-align and dilute the phase/alignment
    gradient during an alignment-focused stage.
    """
    w = weights or CodecLossWeights()
    sr = codec.config.sampling_rate
    mel_loss = MelSpectrogramLoss(sampling_rate=sr)
    stft_loss = MultiScaleSTFTLoss()
    wav_loss = WaveformL1Loss()
    cstft_loss = ComplexSTFTLoss()
    snr_loss = SNRLoss()

    n_codebooks = codec.config.n_codebooks

    def step_fn(state: TrainState, x: jax.Array, key: jax.Array, n_quantizers=None):
        key, nq_key = jax.random.split(key)
        nq_per_sample = (
            jax.random.randint(nq_key, (x.shape[0],), nq_min, n_codebooks + 1)
            if n_quantizers_dropout and n_quantizers is None
            else None
        )

        def loss_fn(params):
            out = codec.apply(params, x, n_quantizers, nq_per_sample)
            recon = out["audio"]
            losses = {
                "loss/mel": mel_loss(recon, x),
                "loss/stft": stft_loss(recon, x),
                "loss/waveform": wav_loss(recon, x),
                "loss/complex_stft": cstft_loss(recon, x),
                "loss/snr": snr_loss(recon, x),
                "vq/commitment_loss": out["vq/commitment_loss"],
                "vq/codebook_loss": out["vq/codebook_loss"],
            }
            total = (
                w.mel * losses["loss/mel"]
                + w.stft * losses["loss/stft"]
                + w.waveform * losses["loss/waveform"]
                + w.complex_stft * losses["loss/complex_stft"]
                + w.snr * losses["loss/snr"]
                + w.commitment * losses["vq/commitment_loss"]
                + w.codebook * losses["vq/codebook_loss"]
            )
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, new_params,
        )
        state = state.replace(
            step=state.step + 1, params=new_params,
            ema_params=new_ema, opt_state=new_opt_state,
        )
        metrics = {"loss/total": total, **losses}
        return state, metrics

    static = ("n_quantizers",)
    if mesh is None:
        return jax.jit(step_fn, static_argnames=static, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        static_argnames=static,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
