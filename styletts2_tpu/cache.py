"""Persistent XLA compilation cache.

Compiles over the tunneled TPU service take 30 s – 20 min and the service
is memory-fragile; the jax persistent cache (verified working through the
axon plugin) makes every executable a one-time cost per machine. Enabled by
every entry point (engine, bench, train_loop, graft entry).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")

_enabled = False


def enable_compilation_cache(cache_dir: str = "") -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = (cache_dir or os.environ.get("STYLETTS2_TPU_CACHE")
            or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    _enabled = True
