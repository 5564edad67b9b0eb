"""Model summary — parameter-count table for a params pytree.

Capability parity with the reference's `torchinfo.summary(model)` printed at
training startup (reference train.py:79): a per-top-level-module breakdown
plus totals, so a run's architecture/size is visible in the logs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

__all__ = ["model_summary", "count_params"]


def count_params(params: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def _group_counts(params: Any) -> Dict[str, Dict[str, int]]:
    groups: Dict[str, Dict[str, int]] = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        keys = [p.key for p in path if hasattr(p, "key")]
        # skip the flax 'params' collection wrapper; group by first real level
        while keys and keys[0] == "params":
            keys = keys[1:]
        name = keys[0] if keys else "(root)"
        g = groups.setdefault(str(name), {"params": 0, "tensors": 0})
        g["params"] += int(np.prod(leaf.shape))
        g["tensors"] += 1
    return groups


def model_summary(params: Any, title: str = "model") -> str:
    """Human-readable parameter table, one row per top-level module."""
    groups = _group_counts(params)
    total = sum(g["params"] for g in groups.values())
    n_tensors = sum(g["tensors"] for g in groups.values())
    name_w = max([len(k) for k in groups] + [len("module")])
    lines = [
        f"{title} summary: {total:,} params in {n_tensors} tensors "
        f"({total * 4 / 2**20:.1f} MB f32)",
        f"  {'module'.ljust(name_w)}  {'params':>12}  {'tensors':>7}",
    ]
    for name in sorted(groups, key=lambda k: -groups[k]["params"]):
        g = groups[name]
        lines.append(
            f"  {name.ljust(name_w)}  {g['params']:>12,}  {g['tensors']:>7}"
        )
    return "\n".join(lines)
