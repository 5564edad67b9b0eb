"""Shared utilities: registries, logging, audio helpers, profiling, viz."""

from flowdec_tpu.utils.registry import Registry
from flowdec_tpu.utils.logging import get_logger, log
from flowdec_tpu.utils.audio import batch_broadcast, load48000, load_audio, mean_conf_int
from flowdec_tpu.utils.profiling import annotate, rtf_timer, trace
from flowdec_tpu.utils.summary import count_params, model_summary

__all__ = [
    "Registry",
    "count_params",
    "model_summary",
    "get_logger",
    "log",
    "batch_broadcast",
    "load48000",
    "load_audio",
    "mean_conf_int",
    "annotate",
    "rtf_timer",
    "trace",
]
