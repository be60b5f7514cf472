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

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _DONE = True
