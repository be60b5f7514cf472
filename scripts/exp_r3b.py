"""Round-3 device measurements: v3 slot kernel vs full-array path.

Usage: python scripts/exp_r3b.py [size_log2=27]
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
    _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused, _sketch_fused_general,
    _seg_cap, sketch_records_pallas,
)

T0 = time.monotonic()
BUDGET = float(os.environ.get("EXP_BUDGET_S", 1400))


def left():
    return BUDGET - (time.monotonic() - T0)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, repeats=3):
    sync(fn())
    ts = []
    for _ in range(repeats):
        t0 = time.monotonic()
        sync(fn())
        ts.append(time.monotonic() - t0)
    return min(ts), ts


def p(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    n = 1 << lg
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes_np = rng.integers(0, 4, size=n).astype(np.int8)

    tiny = jax.device_put(jnp.ones(128, jnp.float32))
    g1 = jax.jit(lambda y: y + 1)
    lat, _ = timeit(lambda: g1(tiny), 3)
    p(f"sync-latency {lat*1e3:.1f} ms")

    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = jax.device_put(buf)
    sync(dev)
    p("uploaded")

    t0 = time.monotonic()
    out = _sketch_fused(dev, n, k, w, cap, slots=True)
    cnt = int(out[3])
    p(f"fused v3 first call (compile): {time.monotonic()-t0:.1f} s cnt={cnt} "
      f"ok={bool(out[4])} slots_ok={bool(out[5])}")
    dt, ts = timeit(lambda: _sketch_fused(dev, n, k, w, cap, slots=True)[3])
    p(f"fused v3: {dt*1e3:.1f} ms {[f'{t*1e3:.0f}' for t in ts]} => {n/dt/1e9:.3f} Gbp/s")

    if left() < 900:
        p("budget low: skipping old-path compare")
    else:
        t0 = time.monotonic()
        out = _sketch_fused(dev, n, k, w, cap, slots=False)
        p(f"fused old first call: {time.monotonic()-t0:.1f} s cnt={int(out[3])}")
        dt, ts = timeit(lambda: _sketch_fused(dev, n, k, w, cap, slots=False)[3])
        p(f"fused old: {dt*1e3:.1f} ms {[f'{t*1e3:.0f}' for t in ts]} => {n/dt/1e9:.3f} Gbp/s")

    # output fetch
    out = _sketch_fused(dev, n, k, w, cap, slots=True)
    cnt = int(out[3])
    t0 = time.monotonic()
    _ = np.asarray(out[0][:cnt]); _ = np.asarray(out[1][:cnt]); _ = np.asarray(out[2][:cnt])
    p(f"v3 output fetch cnt={cnt}: {time.monotonic()-t0:.2f} s")

    if left() < 500:
        p("budget low: done")
        return

    # multi fast path (whole-assembly batched)
    recs = [codes_np[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    t0 = time.monotonic()
    sketch_records_pallas(recs, k, w)
    p(f"multi cold: {time.monotonic()-t0:.1f} s")
    t0 = time.monotonic()
    sketch_records_pallas(recs, k, w)
    p(f"multi warm: {time.monotonic()-t0:.2f} s => {n/(time.monotonic()-t0)/1e9:.3f} Gbp/s")

    if left() < 400:
        p("budget low: done")
        return

    # general N-rich
    codes_n = codes_np.copy()
    for s in rng.integers(0, n - 600, 100):
        codes_n[s:s + 500] = CODE_INVALID
    recs_n = [codes_n[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    t0 = time.monotonic()
    sketch_records_pallas(recs_n, k, w)
    p(f"general cold: {time.monotonic()-t0:.1f} s")
    t0 = time.monotonic()
    sketch_records_pallas(recs_n, k, w)
    p(f"general warm: {time.monotonic()-t0:.2f} s => {n/(time.monotonic()-t0)/1e9:.3f} Gbp/s")
    p("DONE")


if __name__ == "__main__":
    main()
