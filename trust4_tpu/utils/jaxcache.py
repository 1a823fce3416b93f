"""Persistent XLA compilation cache setup.

Device compiles are slow (minutes over remote-attached TPUs), so every
jitted kernel opts into the on-disk cache; repeat runs skip compilation.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import jax

        cache_dir = os.environ.get(
            "TRUST4_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "trust4_tpu_jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # HLO locations default to FULL Python tracebacks, so the cache key
        # changes with the outer call stack (CLI vs pytest vs notebook) and
        # every entry point recompiles from scratch.  Innermost locations
        # are stable and enough for debugging.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass
