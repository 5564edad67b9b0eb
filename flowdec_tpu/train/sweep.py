"""Native hyperparameter sweeper: TPE sampling over config overrides.

Capability parity with the reference's Optuna integration
(requirements.txt pins hydra-optuna-sweeper==1.2.0; train.py:117-122 returns
`cfg.get('optimized_metric')` from the validation metrics as the sweep
objective). The reference delegates search to Optuna's TPE sampler via Hydra
multirun; this module implements the same workflow natively:

  * parameter space declared as distributions over dotted config overrides
    (`uniform` / `loguniform` / `quniform` / `choice`), the same vocabulary
    hydra-optuna-sweeper exposes;
  * Tree-structured Parzen Estimator sampling (Bergstra et al. 2011): after
    `n_startup` random trials, split observations at the γ-quantile into
    good/bad sets, model each with a Parzen (Gaussian-mixture) density, and
    pick the candidate maximizing l_good(x)/l_bad(x);
  * trials are arbitrary objective callables — the CLI (scripts/sweep.py)
    runs `train.py ... --optimized-metric <m>` per trial in a subprocess and
    parses the printed metric.

Results are appended to `trials.jsonl` in the sweep dir; `best.json` tracks
the incumbent. Resumable: existing trials are loaded and count toward
n_trials.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "Distribution",
    "Uniform",
    "LogUniform",
    "QUniform",
    "Choice",
    "parse_space",
    "TPESampler",
    "run_sweep",
]


# ---------------------------------------------------------------------------
# Parameter distributions
# ---------------------------------------------------------------------------


class Distribution:
    """A searchable parameter distribution over one dotted config key."""

    def sample(self, rng: np.random.Generator) -> Any:
        raise NotImplementedError

    # mapping to/from the real line for TPE density modelling
    def to_unit(self, value: Any) -> float:
        raise NotImplementedError

    def from_unit(self, u: float) -> Any:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Uniform(Distribution):
    low: float
    high: float

    def sample(self, rng):
        return float(rng.uniform(self.low, self.high))

    def to_unit(self, value):
        return (float(value) - self.low) / (self.high - self.low)

    def from_unit(self, u):
        return float(self.low + np.clip(u, 0.0, 1.0) * (self.high - self.low))


@dataclasses.dataclass(frozen=True)
class LogUniform(Distribution):
    low: float
    high: float

    def sample(self, rng):
        return float(np.exp(rng.uniform(np.log(self.low), np.log(self.high))))

    def to_unit(self, value):
        return (math.log(float(value)) - math.log(self.low)) / (
            math.log(self.high) - math.log(self.low)
        )

    def from_unit(self, u):
        lo, hi = math.log(self.low), math.log(self.high)
        return float(math.exp(lo + float(np.clip(u, 0.0, 1.0)) * (hi - lo)))


@dataclasses.dataclass(frozen=True)
class QUniform(Distribution):
    """Uniform quantized to multiples of q (integers when q == 1)."""

    low: float
    high: float
    q: float = 1.0

    def _quantize(self, v: float) -> Any:
        v = round(v / self.q) * self.q
        v = float(np.clip(v, self.low, self.high))
        return int(v) if float(self.q).is_integer() else v

    def sample(self, rng):
        return self._quantize(rng.uniform(self.low, self.high))

    def to_unit(self, value):
        return (float(value) - self.low) / (self.high - self.low)

    def from_unit(self, u):
        return self._quantize(self.low + float(np.clip(u, 0, 1)) * (self.high - self.low))


@dataclasses.dataclass(frozen=True)
class Choice(Distribution):
    options: Tuple[Any, ...]

    def sample(self, rng):
        return self.options[int(rng.integers(len(self.options)))]

    def to_unit(self, value):
        return float(self.options.index(value))

    def from_unit(self, u):
        return self.options[int(np.clip(round(u), 0, len(self.options) - 1))]


_SPEC_RE = re.compile(r"^(\w+)\((.*)\)$")


def _parse_scalar(token: str) -> Any:
    token = token.strip()
    for cast in (int, float):
        try:
            return cast(token)
        except ValueError:
            pass
    if token.lower() in ("true", "false"):
        return token.lower() == "true"
    return token.strip("'\"")


def parse_space(specs: Sequence[str]) -> Dict[str, Distribution]:
    """Parse `key=dist(args)` strings into {dotted_key: Distribution}.

    Supported: uniform(lo,hi), loguniform(lo,hi), quniform(lo,hi[,q]),
    choice(a,b,c,...), range(lo,hi[,step]) (= quniform), or a bare
    comma-list `key=a,b,c` (= choice, hydra multirun syntax).
    """
    space: Dict[str, Distribution] = {}
    for spec in specs:
        key, _, rhs = spec.partition("=")
        if not rhs:
            raise ValueError(f"malformed sweep param {spec!r} (expected key=dist(...))")
        m = _SPEC_RE.match(rhs.strip())
        if m:
            kind, argstr = m.group(1).lower(), m.group(2)
            args = [_parse_scalar(a) for a in argstr.split(",") if a.strip() != ""]
            if kind == "uniform":
                space[key] = Uniform(float(args[0]), float(args[1]))
            elif kind in ("loguniform", "log_uniform"):
                space[key] = LogUniform(float(args[0]), float(args[1]))
            elif kind in ("quniform", "range", "int"):
                q = float(args[2]) if len(args) > 2 else 1.0
                space[key] = QUniform(float(args[0]), float(args[1]), q)
            elif kind == "choice":
                space[key] = Choice(tuple(args))
            else:
                raise ValueError(f"unknown distribution {kind!r} in {spec!r}")
        else:
            space[key] = Choice(tuple(_parse_scalar(a) for a in rhs.split(",")))
    return space


# ---------------------------------------------------------------------------
# TPE sampler
# ---------------------------------------------------------------------------


class TPESampler:
    """Independent per-parameter Tree-structured Parzen Estimator.

    direction: 'minimize' or 'maximize'. gamma: good-set quantile.
    """

    def __init__(
        self,
        space: Dict[str, Distribution],
        *,
        direction: str = "minimize",
        n_startup: int = 10,
        gamma: float = 0.25,
        n_candidates: int = 24,
        seed: int = 0,
    ):
        assert direction in ("minimize", "maximize")
        self.space = space
        self.direction = direction
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.rng = np.random.default_rng(seed)
        self.trials: List[Tuple[Dict[str, Any], float]] = []

    def tell(self, params: Dict[str, Any], value: float) -> None:
        if np.isfinite(value):
            self.trials.append((params, float(value)))

    def _split(self) -> Tuple[List[Dict[str, Any]], List[Dict[str, Any]]]:
        sign = 1.0 if self.direction == "minimize" else -1.0
        ranked = sorted(self.trials, key=lambda pv: sign * pv[1])
        n_good = max(1, int(math.ceil(self.gamma * len(ranked))))
        return [p for p, _ in ranked[:n_good]], [p for p, _ in ranked[n_good:]]

    @staticmethod
    def _parzen_logpdf(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
        """log density of a Gaussian mixture centered on observations
        (unit-interval domain; Scott's-rule-ish bandwidth, floored)."""
        bw = max(1.0 / (1 + len(centers)), float(np.std(centers)) * len(centers) ** -0.2, 1e-3)
        d2 = (x[:, None] - centers[None, :]) ** 2
        comp = -0.5 * d2 / bw**2 - math.log(bw * math.sqrt(2 * math.pi))
        m = comp.max(axis=1, keepdims=True)
        return (m[:, 0] + np.log(np.exp(comp - m).sum(axis=1))) - math.log(len(centers))

    def ask(self) -> Dict[str, Any]:
        if len(self.trials) < self.n_startup:
            return {k: d.sample(self.rng) for k, d in self.space.items()}
        good, bad = self._split()
        out: Dict[str, Any] = {}
        for key, dist in self.space.items():
            if isinstance(dist, Choice):
                # categorical TPE: smoothed good-set counts over options
                counts = np.ones(len(dist.options))
                for p in good:
                    counts[dist.options.index(p[key])] += 1.0
                out[key] = dist.options[
                    int(self.rng.choice(len(dist.options), p=counts / counts.sum()))
                ]
                continue
            g = np.array([dist.to_unit(p[key]) for p in good])
            b = np.array([dist.to_unit(p[key]) for p in bad]) if bad else np.array([0.5])
            # candidates drawn from the good-set mixture + exploration
            cand = np.concatenate(
                [
                    g[self.rng.integers(len(g), size=self.n_candidates)]
                    + self.rng.normal(0, 0.1, self.n_candidates),
                    self.rng.uniform(0, 1, max(4, self.n_candidates // 4)),
                ]
            )
            cand = np.clip(cand, 0.0, 1.0)
            score = self._parzen_logpdf(cand, g) - self._parzen_logpdf(cand, b)
            out[key] = dist.from_unit(float(cand[int(np.argmax(score))]))
        return out


# ---------------------------------------------------------------------------
# Sweep loop
# ---------------------------------------------------------------------------


def run_sweep(
    objective: Callable[[Dict[str, Any]], float],
    space: Dict[str, Distribution],
    *,
    n_trials: int,
    direction: str = "minimize",
    seed: int = 0,
    sweep_dir: Optional[str] = None,
    n_startup: int = 10,
) -> Dict[str, Any]:
    """Run the ask/tell loop; returns {'best_params', 'best_value', 'trials'}.

    Failed trials (objective raises or returns NaN) are recorded but don't
    stop the sweep — matching Optuna's failed-trial semantics.
    """
    sampler = TPESampler(space, direction=direction, seed=seed, n_startup=n_startup)
    trials_path = best_path = None
    if sweep_dir is not None:
        os.makedirs(sweep_dir, exist_ok=True)
        trials_path = os.path.join(sweep_dir, "trials.jsonl")
        best_path = os.path.join(sweep_dir, "best.json")
        if os.path.exists(trials_path):  # resume
            with open(trials_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("value") is not None:
                        sampler.tell(rec["params"], rec["value"])

    records: List[Dict[str, Any]] = []
    sign = 1.0 if direction == "minimize" else -1.0
    while len(sampler.trials) + sum(r["value"] is None for r in records) < n_trials:
        params = sampler.ask()
        try:
            value = float(objective(params))
            if not np.isfinite(value):
                value = None
        except Exception as e:  # failed trial
            from flowdec_tpu.utils.logging import log

            log.warning(f"sweep trial failed for {params}: {e}")
            value = None
        rec = {"trial": len(records), "params": params, "value": value}
        records.append(rec)
        if value is not None:
            sampler.tell(params, value)
        if trials_path is not None:
            with open(trials_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if best_path is not None and sampler.trials:
            bp, bv = min(sampler.trials, key=lambda pv: sign * pv[1])
            with open(best_path, "w") as f:
                json.dump({"best_params": bp, "best_value": bv}, f, indent=2)

    if not sampler.trials:
        return {"best_params": None, "best_value": None, "trials": records}
    bp, bv = min(sampler.trials, key=lambda pv: sign * pv[1])
    return {"best_params": bp, "best_value": bv, "trials": records}
