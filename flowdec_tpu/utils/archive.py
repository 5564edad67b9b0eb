"""Compact single-file parameter archives (.npz) for trained checkpoints.

Orbax checkpoint dirs carry params + EMA + optimizer state (~4x the
inference artifact) and live on scratch disk, which VM restarts delete
(CAMPAIGN.md r4 §7 lost the best codec that way). An archive stores just
one param tree — float params cast to a compact dtype — plus the module
config, small enough to commit to the repo. scripts/archive_ckpt.py is the
CLI; codec/training.py:load_codec_archive is the codec loader.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["flatten_tree", "unflatten_tree", "save_archive", "load_archive"]

SEP = "||"  # tree-path separator inside npz keys (module names may contain /)


def flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    else:
        out[prefix[: -len(SEP)]] = np.asarray(tree)
    return out


def unflatten_tree(flat):
    tree = {}
    for path, arr in flat.items():
        node = tree
        keys = path.split(SEP)
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr
    return tree


def save_archive(out_path, params, config: dict, *, dtype="float16",
                 meta: dict | None = None) -> int:
    """Write the archive; returns its on-disk size in bytes."""
    flat = flatten_tree(params)
    cast = {}
    for k, v in flat.items():
        if np.issubdtype(v.dtype, np.floating) and dtype:
            cast[k] = v.astype(dtype)
        else:
            cast[k] = v
    cast["__config__"] = np.frombuffer(
        json.dumps({"config": config, "meta": meta or {},
                    "dtype": dtype}).encode(), dtype=np.uint8)
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(out_path, **cast)
    return os.path.getsize(out_path)


def load_archive(path):
    """Returns (params_tree_f32, config_dict, meta_dict)."""
    with np.load(path) as z:
        cfg = json.loads(bytes(z["__config__"]).decode())
        flat = {}
        for k in z.files:
            if k == "__config__":
                continue
            v = z[k]
            if np.issubdtype(v.dtype, np.floating):
                v = v.astype(np.float32)
            flat[k] = v
    return unflatten_tree(flat), cfg["config"], cfg.get("meta", {})
