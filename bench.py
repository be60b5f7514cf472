"""Benchmark: minimizer sketch throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gbp/s", "vs_baseline": N}

The headline metric is device sketch throughput (bases hashed + windowed +
selected per second) at the reference's default scale parameters (k=32,
w=1000).  ``vs_baseline`` compares against the host NumPy oracle — the
stand-in for the reference's native single-node sketcher (btllib indexlr),
which is not installable in this image.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache: first bench run pays compiles, later
    rounds reuse them (axon remote compiles are expensive at size)."""
    import jax

    cache_dir = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_device(codes_np, k, w, repeats=5):
    import jax
    import jax.numpy as jnp

    from ntjoin_tpu.ops.sketch_jax import _sketch_padded

    n = codes_np.shape[0]
    codes = jax.device_put(jnp.asarray(codes_np.astype(np.int32)))
    n_real = jnp.asarray(n, jnp.int32)

    def run():
        out = _sketch_padded(codes, n_real, k, w)
        jax.block_until_ready(out)
        return out

    run()  # compile + warm
    t0 = time.monotonic()
    for _ in range(repeats):
        run()
    dt = (time.monotonic() - t0) / repeats
    return n / dt  # bases per second


def bench_host(codes_np, k, w):
    from ntjoin_tpu.ops.nthash_np import sketch_codes

    t0 = time.monotonic()
    sketch_codes(codes_np, k, w)
    return codes_np.shape[0] / (time.monotonic() - t0)


def main():
    _enable_compile_cache()
    k, w = 32, 1000
    size = int(os.environ.get("BENCH_SIZE", 1 << 22))  # 4.2 Mbp
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=size).astype(np.uint8)

    device_bps = bench_device(codes, k, w)
    host_n = min(size, 1 << 23)
    host_bps = bench_host(codes[:host_n], k, w)

    print(
        json.dumps(
            {
                "metric": "minimizer_sketch_throughput",
                "value": round(device_bps / 1e9, 4),
                "unit": "Gbp/s",
                "vs_baseline": round(device_bps / host_bps, 2),
                "detail": {
                    "k": k,
                    "w": w,
                    "bases": size,
                    "host_oracle_gbps": round(host_bps / 1e9, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
