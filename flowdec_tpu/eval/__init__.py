"""Evaluation metrics and harnesses (L5b of the layer map)."""

from flowdec_tpu.eval.evaluate import evaluate_model
from flowdec_tpu.eval.metrics import (
    DNSMOS,
    ESTOI,
    FWSNRseg,
    LogSpecMSE,
    Metric,
    PESQ,
    SIGMOS,
    SISXR,
    SNRseg,
    ViSQOL,
    get_audiotype_from_basename,
    get_metrics_df,
    get_metrics_df_parallel,
    get_metrics_row,
    si_sxr_components,
)

__all__ = [
    "evaluate_model",
    "DNSMOS",
    "ESTOI",
    "FWSNRseg",
    "LogSpecMSE",
    "Metric",
    "PESQ",
    "SIGMOS",
    "SISXR",
    "SNRseg",
    "ViSQOL",
    "get_audiotype_from_basename",
    "get_metrics_df",
    "get_metrics_df_parallel",
    "get_metrics_row",
    "si_sxr_components",
]
