"""Persistent XLA compilation cache — partition/training programs are large
and recompile per cloud-size bucket; caching across processes makes CLI
restarts and bench runs start warm."""
from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache(path: str | None = None):
    global _ENABLED
    if _ENABLED:
        return
    import jax

    cache = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_spgt"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache sub-second compiles too: ~80 eager-op executables x ~0.5 s
        # each re-compiled per process under the default 1.0 s threshold
        # (tools/cache_diag_results.json)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _ENABLED = True
    except Exception:
        pass
