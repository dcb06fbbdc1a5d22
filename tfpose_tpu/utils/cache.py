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

    # The axon TPU plugin's sitecustomize force-sets jax_platforms at
    # interpreter start; honour an explicit user platform choice here
    # (TFPOSE_PLATFORM=cpu runs everything on host, e.g. for services
    # on non-TPU machines).
    platform = os.environ.get("TFPOSE_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

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
