"""Process-wide JAX configuration for device-path entry points.

The axon TPU relay compiles remotely and slowly (tens of seconds for
sort-heavy programs); the persistent compilation cache makes that a
one-time cost per program shape.  Every entry point that can touch a
device (CLI sketch backends, device index, bench, profilers) calls
:func:`enable_compile_cache` first — it is idempotent and cheap.
"""
from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    candidates = (
        [cache_dir]
        if cache_dir is not None
        else [
            os.environ.get("NTJOIN_TPU_CACHE_DIR"),
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                ".jax_cache",
            ),
            # read-only installs (system site-packages): per-user tempdir
            os.path.join(
                __import__("tempfile").gettempdir(), "ntjoin_tpu_jax_cache"
            ),
        ]
    )
    for cand in candidates:
        if not cand:
            continue
        try:
            os.makedirs(cand, exist_ok=True)
        except OSError:
            continue
        if not os.access(cand, os.W_OK):
            continue
        jax.config.update("jax_compilation_cache_dir", cand)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        break
    # no writable candidate: run without a persistent cache (slower
    # recompiles, never a crash)
    _DONE = True
