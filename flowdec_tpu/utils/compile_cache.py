"""Persistent XLA compilation cache for every entry point.

Compiles on this remote-device link take ~15-25 min (two of five round-3
attempts hung >25 min, killing a campaign chain); the persistent cache makes
every relaunch-after-hang and every resumed run compile in seconds. bench.py
proved the mechanism on this runtime; this module makes it framework-wide —
it is called at `flowdec_tpu` import time, so train.py, enhance.py and all
scripts/ CLIs get the cache with no per-entry-point code.

Override the location with JAX_COMPILATION_CACHE_DIR; disable with
FLOWDEC_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> bool:
    """Idempotently point jax at a persistent on-disk compilation cache.

    Returns True if the cache is (already) enabled. Safe to call before or
    after backend initialization — these are pure config values read at
    compile time.
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("FLOWDEC_NO_COMPILE_CACHE"):
        return False
    # CPU-only runs (tests, CPU drives) skip the persistent cache: CPU
    # compiles are seconds, and XLA:CPU AOT entries are machine-feature
    # pinned — reloading them across toolchain/host variations spams
    # cpu_aot_loader errors. The cache exists for the 15-25 min remote-TPU
    # compiles, where the platform is never plain "cpu".
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return False
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/flowdec_tpu_xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >10 s to compile (every real graph here)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        _enabled = True
    except Exception:
        return False
    return True
