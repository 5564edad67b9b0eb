"""Model evaluation API: enhance a list of files and score them.

Capability parity with EnhancementModel.evaluate_model
(/root/reference/flowdec/model.py:306-348): iterate (x, y, basename) triples,
enhance y, compute the metric row per file (mismatched shapes are skipped with
a warning), and return (metrics DataFrame, output audios incl. estimates).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from flowdec_tpu.eval.metrics import get_metrics_row
from flowdec_tpu.utils.logging import log

__all__ = ["evaluate_model"]


def evaluate_model(
    model,
    params,
    audios: Sequence[Tuple[np.ndarray, np.ndarray, str]],
    metrics: Sequence,
    key: Optional[jax.Array] = None,
    **enhance_kwargs,
):
    """Returns (metrics DataFrame, list of {name, x_hat, x, y} dicts)."""
    import pandas as pd

    from flowdec_tpu.train.trainer import enhance_bucketed  # lazy: avoids cycle

    log.info(f"Running evaluation with enhance_kwargs: {enhance_kwargs}")
    key = key if key is not None else jax.random.PRNGKey(0)

    rows: List[Dict[str, Any]] = []
    output_audios: List[Dict[str, Any]] = []
    for i, (x, y, basename) in enumerate(audios):
        x_hat = enhance_bucketed(
            model, params, jax.random.fold_in(key, i), np.asarray(y).squeeze(),
            **enhance_kwargs,
        )
        if np.asarray(x).squeeze().shape == np.asarray(y).squeeze().shape:
            try:
                rows.append(get_metrics_row(metrics, basename, x_hat, x, y))
            except Exception:
                log.exception("Exception occurred when calculating metrics")
        else:
            log.warning(
                f"!!! Mismatched shapes between x {np.asarray(x).shape} and "
                f"y {np.asarray(y).shape}; ignoring {basename} for metrics!"
            )
        output_audios.append(dict(name=basename, x_hat=x_hat, x=x, y=y))
    return pd.DataFrame(rows), output_audios
