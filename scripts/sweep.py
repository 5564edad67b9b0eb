"""Hyperparameter sweep CLI: TPE search over train.py config overrides.

Capability parity with the reference's hydra-optuna-sweeper workflow
(requirements.txt; reference train.py:117-122 returns `optimized_metric` as
the sweep objective). Each trial launches train.py in a subprocess with the
sampled overrides plus --optimized-metric, and parses the printed
`optimized_metric <name>=<value>` line.

Usage:
    python scripts/sweep.py --config-name flowdec_75m \
        --metric valid_loss --direction minimize --n-trials 20 \
        --param train.learning_rate='loguniform(1e-5,1e-3)' \
        --param model.cfm_sigma='choice(0.0,0.01,0.1)' \
        -- train.num_steps=2000            # fixed overrides after --
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-name", required=True)
    p.add_argument("--config-dir", default=None)
    p.add_argument("--metric", required=True, help="validation metric to optimize")
    p.add_argument("--direction", choices=["minimize", "maximize"], default="minimize")
    p.add_argument("--n-trials", type=int, default=20)
    p.add_argument("--n-startup", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sweep-dir", default="sweeps/default")
    p.add_argument(
        "--param", action="append", default=[],
        help="key=dist(...): uniform/loguniform/quniform/choice, repeatable",
    )
    p.add_argument("fixed", nargs="*", help="fixed dotted overrides for every trial")
    args = p.parse_args(argv)

    from flowdec_tpu.train.sweep import parse_space, run_sweep

    space = parse_space(args.param)
    if not space:
        p.error("at least one --param is required")

    pat = re.compile(rf"optimized_metric {re.escape(args.metric)}=([\-0-9.eE nan]+)")

    def objective(params):
        overrides = [f"{k}={v}" for k, v in params.items()] + list(args.fixed)
        trial_id = f"trial_{len(os.listdir(args.sweep_dir)) if os.path.isdir(args.sweep_dir) else 0}"
        cmd = [
            sys.executable, os.path.join(REPO, "train.py"),
            "--config-name", args.config_name,
            "--optimized-metric", args.metric,
            "--run-id", f"{os.path.basename(args.sweep_dir)}_{trial_id}",
            *(["--config-dir", args.config_dir] if args.config_dir else []),
            *overrides,
        ]
        print(f"[sweep] {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        m = pat.search(proc.stdout)
        if proc.returncode != 0 or not m:
            raise RuntimeError(
                f"trial failed (rc={proc.returncode}): {proc.stderr[-500:]}"
            )
        return float(m.group(1))

    result = run_sweep(
        objective, space,
        n_trials=args.n_trials, direction=args.direction, seed=args.seed,
        sweep_dir=args.sweep_dir, n_startup=args.n_startup,
    )
    print(json.dumps({k: result[k] for k in ("best_params", "best_value")}, indent=2))


if __name__ == "__main__":
    main()
