"""Round-3 session E: incremental compile probe of the tr=w kernel, then
the full fused profile.  One TPU process; prints progress at every step so
a hang is identifiable; no external timeout (kill the exact PID if stuck).

Usage: python scripts/exp_r3e.py
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
    _CHUNKS, _ROW_BLOCK, _ceil_to, _pick_tr, _sketch_fused,
)

T0 = time.monotonic()


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, repeats=3):
    sync(fn())
    ts = []
    for _ in range(repeats):
        t0 = time.monotonic()
        sync(fn())
        ts.append(time.monotonic() - t0)
    return min(ts)


def p(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


def fused_at(lg, codes_all, k=32, w=1000):
    n = 1 << lg
    codes_np = codes_all[:n]
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = jax.device_put(buf)
    sync(dev)
    p(f"2^{lg}: uploaded (tr={_pick_tr(w)})")
    t0 = time.monotonic()
    out = _sketch_fused(dev, n, k, w, cap)
    cnt = int(out[3])
    p(f"2^{lg}: first call {time.monotonic()-t0:.1f} s cnt={cnt} "
      f"ok={bool(out[4])} slots_ok={bool(out[5])}")
    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3])
    p(f"2^{lg}: fused {dt*1e3:.1f} ms => {n/dt/1e9:.3f} Gbp/s")
    return dt


def main():
    rng = np.random.default_rng(42)
    codes_all = rng.integers(0, 4, size=1 << 27).astype(np.int8)

    tiny = jax.device_put(jnp.ones(128, jnp.float32))
    g1 = jax.jit(lambda y: y + 1)
    lat = timeit(lambda: g1(tiny), 3)
    p(f"sync-latency {lat*1e3:.1f} ms")

    # incremental compile probe: small shape first (same tr=w kernel
    # structure) so a compiler hang is caught cheaply
    fused_at(24, codes_all)
    fused_at(27, codes_all)
    p("DONE")


if __name__ == "__main__":
    main()
