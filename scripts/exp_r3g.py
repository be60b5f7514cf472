"""Round-3 session G: measure the jitted int8-input fused pipeline.

Changes under test vs exp_r3f: _sketch_fused is now jitted (the product
paths were paying eager per-op dispatch over the relay) and the hash
kernel takes int8 codes (the i32 widen materialized 1.08 GB of HBM).

Batches every TPU measurement of this session into one process (axon
tunnel: one process at a time; session setup can take minutes).  Internal
wall budget; exits cleanly on its own.

Usage: python scripts/exp_r3g.py
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("NTJOIN_TPU_TIMERS", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ntjoin_tpu.constants import CODE_INVALID
import ntjoin_tpu.ops.sketch_pallas as sp
from ntjoin_tpu.ops.sketch_pallas import (
    _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused, sketch_records_pallas,
)

T0 = time.monotonic()
BUDGET = 1500.0  # s


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
    return min(ts)


def p(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


def main():
    n = 1 << 27
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes_np = rng.integers(0, 4, size=n).astype(np.int8)

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

    # 1. jitted fused path, device-resident sync (count fetch only)
    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3], repeats=5)
    p(f"fused(jit,int8) tr=default: {dt*1e3:.1f} ms => {n/dt/1e9:.3f} Gbp/s")
    out = _sketch_fused(dev, n, k, w, cap)
    cnt = int(out[3])
    assert bool(out[4]) and bool(out[5]) and 0 < cnt <= cap, (cnt, cap)
    p(f"count={cnt} ok")

    # 2. tr sensitivity under jit (40 was best eager; w was best loop-free)
    # NTJOIN_TPU_TR is read at trace time; the same (n, cap) signature
    # would reuse the cached trace, so vary cap by +i to force retraces
    # (capacity padding does not change the result).
    for i, tr in enumerate((40, 200), start=1):
        if left() < 500:
            p("skip tr sweep (budget)")
            break
        os.environ["NTJOIN_TPU_TR"] = str(tr)
        try:
            dt = timeit(
                lambda i=i: _sketch_fused(dev, n, k, w, cap + i)[3]
            )
            p(f"fused tr={tr}: {dt*1e3:.1f} ms => {n/dt/1e9:.3f} Gbp/s")
        finally:
            os.environ.pop("NTJOIN_TPU_TR", None)

    del dev
    if left() < 600:
        p("skip record paths (budget)")
        p("DONE")
        return

    # 3. whole-assembly batched path (the path every real run takes)
    recs = [codes_np[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    sketch_records_pallas(recs, k, w)  # warm
    walls = []
    for _ in range(3):
        sp._STAGES.clear()
        t0 = time.monotonic()
        sketch_records_pallas(recs, k, w)
        walls.append(time.monotonic() - t0)
        stages = dict(sp._STAGES)
    dt = min(walls)
    p(f"multi-record: {dt:.2f} s => {n/dt/1e9:.3f} Gbp/s; stages={stages}")

    # 4. N-rich general path (segmented fast path)
    codes_nn = codes_np.copy()
    for s in rng.integers(0, n - 600, 100):
        codes_nn[s:s + 500] = CODE_INVALID
    recs_n = [codes_nn[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    sketch_records_pallas(recs_n, k, w)
    walls = []
    for _ in range(3):
        sp._STAGES.clear()
        t0 = time.monotonic()
        sketch_records_pallas(recs_n, k, w)
        walls.append(time.monotonic() - t0)
        stages = dict(sp._STAGES)
    dt = min(walls)
    p(f"general N-rich: {dt:.2f} s => {n/dt/1e9:.3f} Gbp/s; stages={stages}")
    p("DONE")


if __name__ == "__main__":
    main()
