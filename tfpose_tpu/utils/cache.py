"""Persistent XLA compilation cache.

The fused forward+decode program compiles in O(minutes) the first time
at full resolution; enabling JAX's persistent cache makes every later
process start in seconds. Called by the estimator, bench, and CLIs.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = os.environ.get(
        "TFPOSE_TPU_CACHE",
        os.path.expanduser("~/.cache/tfpose_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is best-effort
        pass
    _enabled = True
