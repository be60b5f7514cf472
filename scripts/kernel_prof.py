"""Per-stage device timing of the sketch pipeline (run on one live chip).

Usage: python scripts/kernel_prof.py [size_log2=24]
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ntjoin_tpu.constants import CODE_INVALID
from ntjoin_tpu.ops.sketch_pallas import (
    _CHUNKS, _ROW_BLOCK, _SUB, _LANE, _MAXU, _ceil_to,
    _hash_chunked, _window_chunked, _sketch_fused,
)

def sync(x):
    """Force completion by fetching one element to host.

    jax.block_until_ready is a NO-OP over the axon TPU relay (returns
    before the program runs); a host fetch is the only reliable barrier.
    The fetch itself costs one tunnel round-trip (~25 ms) — subtract the
    measured latency floor when interpreting results.
    """
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, repeats=5):
    sync(fn())
    ts = []
    for _ in range(repeats):
        t0 = time.monotonic()
        sync(fn())
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << lg
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes_np = rng.integers(0, 4, size=n).astype(np.uint8)

    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = jax.device_put(jnp.asarray(buf))
    tiny = jax.device_put(jnp.ones(128, jnp.float32))
    g1 = jax.jit(lambda y: y + 1)
    lat = timeit(lambda: g1(tiny), 3)
    print(f"n={n} L={L} code_rows={code_rows} cap={cap} "
          f"sync-latency={lat*1e3:.1f}ms", flush=True)

    # full fused
    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap))
    print(f"fused total      : {dt*1e3:9.2f} ms  {n/dt/1e9:7.3f} Gbp/s", flush=True)

    # layout only (same prologue as _sketch_fused)
    @jax.jit
    def layout(codes_padded):
        codes = codes_padded.astype(jnp.int32)
        sections = -(-(L + halo) // L)
        blocks = [
            codes[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
            for s in range(sections)
        ]
        x = jnp.concatenate(blocks, axis=0)[: L + halo]
        x = jnp.pad(x, ((0, code_rows - L - halo), (0, 0)),
                    constant_values=CODE_INVALID)
        x = x.reshape(code_rows, _SUB, _LANE)
        x_lag = jnp.pad(x[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
                        constant_values=CODE_INVALID)
        return x, x_lag

    dt = timeit(lambda: layout(dev))
    print(f"layout           : {dt*1e3:9.2f} ms", flush=True)

    x, x_lag = layout(dev)
    sync((x, x_lag))

    dt = timeit(lambda: _hash_chunked(x, x_lag, k))
    gb = n / dt / 1e9
    print(f"hash kernel      : {dt*1e3:9.2f} ms  {gb:7.3f} Gbp/s", flush=True)

    h_lo, h_hi, val = _hash_chunked(x, x_lag, k)
    sync(h_lo)
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    h_lo2 = jnp.pad(h_lo[k - 1 : k - 1 + hash_rows],
                    ((0, rows_p - hash_rows), (0, 0), (0, 0)),
                    constant_values=_MAXU)
    h_hi2 = jnp.pad(h_hi[k - 1 : k - 1 + hash_rows],
                    ((0, rows_p - hash_rows), (0, 0), (0, 0)),
                    constant_values=_MAXU)
    gm_lo = h_lo2.transpose(1, 0, 2)
    gm_hi = h_hi2.transpose(1, 0, 2)
    sync((gm_lo, gm_hi))
    l_arr = jnp.full((1,), L, jnp.int32)

    dt = timeit(lambda: _window_chunked(gm_lo, gm_hi, l_arr, w))
    print(f"window kernel    : {dt*1e3:9.2f} ms  {n/dt/1e9:7.3f} Gbp/s "
          f"(rows_p={rows_p} nb={nb})", flush=True)


if __name__ == "__main__":
    main()
