"""Round-3 session J: measure tr=40 default + int8 val + slot fast path.

Usage: python scripts/exp_r3j.py
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
from ntjoin_tpu.ops.nthash_np import sketch_codes
import ntjoin_tpu.ops.sketch_pallas as sp
from ntjoin_tpu.ops.sketch_pallas import (
    _CHUNKS, _ROW_BLOCK, _ceil_to, _pick_tr, _sketch_fused,
    sketch_codes_pallas, sketch_records_pallas,
)

T0 = time.monotonic()


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, repeats=5):
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
    p(f"tr default for w=1000: {_pick_tr(w)}")
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

    small = codes_np[: 1 << 20]
    got = sketch_codes_pallas(small, k, w)
    exp = sketch_codes(small, k, w)
    assert np.array_equal(got.positions, exp.positions), "pos mismatch"
    assert np.array_equal(got.hashes, exp.hashes), "hash mismatch"
    p("hardware parity OK (2^20 record)")

    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3])
    p(f"fused per-call: {dt*1e3:.1f} ms => {n/dt/1e9:.3f} Gbp/s")

    def pipe():
        outs = [_sketch_fused(dev, n, k, w, cap) for _ in range(5)]
        for o in outs:
            int(o[3])
    pipe()
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        pipe()
        ts.append((time.monotonic() - t0) / 5)
    dt = min(ts)
    p(f"fused pipelined: {dt*1e3:.1f} ms => {n/dt/1e9:.3f} Gbp/s")

    out = _sketch_fused(dev, n, k, w, cap)
    cnt = int(out[3])
    assert bool(out[4]) and bool(out[5]) and cnt == 269566, cnt
    p(f"count={cnt} ok")
    del dev, out

    # repeat-dense worst case: poly-A interior run forces the dense slot
    # branch + possible overflow fallback — verify exactness end to end
    rep = codes_np[: 1 << 22].copy()
    rep[100_000:100_200] = 0
    rep[2_000_000:2_000_300] = 2
    got = sketch_codes_pallas(rep, k, w)
    exp = sketch_codes(rep, k, w)
    assert np.array_equal(got.positions, exp.positions), "rep pos mismatch"
    assert np.array_equal(got.hashes, exp.hashes), "rep hash mismatch"
    p("repeat-dense parity OK (poly runs)")

    # multi-record + N-rich product paths
    recs = [codes_np[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    sketch_records_pallas(recs, k, w)
    walls = []
    for _ in range(3):
        sp._STAGES.clear()
        t0 = time.monotonic()
        sketch_records_pallas(recs, k, w)
        walls.append(time.monotonic() - t0)
        stages = dict(sp._STAGES)
    dt = min(walls)
    p(f"multi-record: {dt:.2f} s => {n/dt/1e9:.3f} Gbp/s; stages={ {s: round(v,3) for s, v in stages.items()} }")

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
    p(f"general N-rich: {dt:.2f} s => {n/dt/1e9:.3f} Gbp/s; stages={ {s: round(v,3) for s, v in stages.items()} }")
    p("DONE")


if __name__ == "__main__":
    main()
