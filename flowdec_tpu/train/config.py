"""Composed-config system with object instantiation (the Hydra equivalent).

Capability parity with the reference's Hydra 1.3 usage (SURVEY.md §5 config):
  * YAML config groups composed via a `defaults` list (strings = same-dir
    files merged at root; {group: name} = group/name.yaml placed under that
    key; "override group: name" inside nested defaults),
  * `_target_` dotted-path object instantiation with `_partial_`,
  * `${path.to.key}` interpolation (e.g. the global sampling_rate shared by
    model and datamodule, global_defaults.yaml:17-23),
  * dotted command-line overrides (`model.lr=2e-4`),
  * the fully-resolved config is serializable (stored in checkpoints for
    config-free reload, like the reference's save_hyperparameters).
"""

from __future__ import annotations

import copy
import functools
import importlib
import os
import re
from typing import Any, Dict, Optional, Sequence

import yaml

__all__ = [
    "load_config",
    "instantiate",
    "merge",
    "apply_overrides",
    "resolve_interpolations",
    "DEFAULT_CONFIG_DIR",
]

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_INTERP_SUB_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def merge(base: Dict, extra: Dict) -> Dict:
    """Recursive dict merge; `extra` wins. Lists replace wholesale (Hydra
    semantics for config values)."""
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


class _Yaml12Loader(yaml.SafeLoader):
    """SafeLoader + YAML 1.2 float resolution.

    PyYAML implements YAML 1.1, where `1e-4` (no dot, no explicit sign-free
    exponent form) resolves to a STRING — so `eps: 1e-8` silently reached
    optax as "1e-8" and the first real train.py campaign crashed inside
    Adam's update (TypeError: Tracer + str). Hydra/OmegaConf parse YAML 1.2
    where these are floats; match that."""


_Yaml12Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |[-+]?\.[0-9_]+(?:[eE][-+]?[0-9]+)?
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        data = yaml.load(f, Loader=_Yaml12Loader)
    return data or {}


def _compose(path: str, config_dir: str) -> Dict:
    """Load a config file and resolve its `defaults` list recursively.

    defaults entries:
      - "name"             → merge config_dir/name.yaml at root
      - {"group": "name"}  → compose config_dir/group/name.yaml under cfg[group]
      - "override group: name" handled as {"group": "name"} (hydra syntax via
        dict form {"override group": "name"})
      - "_self_"           → ignored (own content always merges last)
    """
    raw = _load_yaml(path)
    if isinstance(raw, list):
        # list-valued group files (eval_variants, eval_metrics) have no defaults
        return raw
    defaults = raw.pop("defaults", [])
    here = os.path.dirname(path)

    cfg: Dict = {}
    for entry in defaults:
        if entry == "_self_":
            continue
        if isinstance(entry, str):
            cfg = merge(cfg, _compose(os.path.join(here, entry + ".yaml"), config_dir))
        elif isinstance(entry, dict):
            (group, name), = entry.items()
            group = group.removeprefix("override ").strip()
            if name is None:
                continue
            sub = _compose(os.path.join(here, group, name + ".yaml"), config_dir)
            cfg = merge(cfg, {group: sub})
        else:
            raise ValueError(f"Bad defaults entry {entry!r} in {path}")
    return merge(cfg, raw)


def _parse_value(text: str) -> Any:
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        # YAML 1.1 misses scientific floats without a dot ("2e-4")
        try:
            return float(value)
        except ValueError:
            return value
    return value


def apply_overrides(cfg: Dict, overrides: Sequence[str]) -> Dict:
    """Apply dotted `a.b.c=value` overrides (values YAML-parsed)."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override {ov!r} must look like key.path=value")
        key, _, raw_val = ov.partition("=")
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw_val)
    return cfg


def _lookup(cfg: Dict, dotted: str) -> Any:
    node: Any = cfg
    for p in dotted.split("."):
        node = node[p]
    return node


def resolve_interpolations(cfg: Dict) -> Dict:
    """Resolve ${dotted.path} string values against the config root."""

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str):
            m = _INTERP_RE.match(node)
            if m:  # whole-string: may resolve to any node type
                return walk(_lookup(cfg, m.group(1)))
            # embedded interpolation inside a longer string (OmegaConf
            # semantics, e.g. "${corpus_dir}/train_pairs.txt"): substitute
            # each reference's scalar value textually
            if "${" in node:
                return _INTERP_SUB_RE.sub(
                    lambda mm: str(walk(_lookup(cfg, mm.group(1)))), node
                )
            return node
        return node

    return walk(cfg)


def load_config(
    name: str,
    overrides: Sequence[str] = (),
    config_dir: Optional[str] = None,
) -> Dict:
    """Compose configs/<name>.yaml with its defaults tree + CLI overrides."""
    config_dir = config_dir or DEFAULT_CONFIG_DIR
    path = name if name.endswith(".yaml") else os.path.join(config_dir, name + ".yaml")
    cfg = _compose(path, config_dir)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return resolve_interpolations(cfg)


def _import_target(dotted: str):
    module_name, _, attr = dotted.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(node: Any, **extra_kwargs):
    """Recursively instantiate `_target_` nodes (Hydra-style).

    dicts with `_target_` become object calls; `_partial_: true` returns a
    functools.partial instead. Lists instantiate element-wise.
    """
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    if not isinstance(node, dict):
        return node
    if "_target_" not in node:
        return {k: instantiate(v) for k, v in node.items()}

    node = dict(node)
    target = _import_target(node.pop("_target_"))
    partial = bool(node.pop("_partial_", False))
    kwargs = {k: instantiate(v) for k, v in node.items()}
    kwargs.update(extra_kwargs)
    if partial:
        return functools.partial(target, **kwargs)
    return target(**kwargs)
