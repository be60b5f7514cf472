"""Round-3 session K: equal-hash run compression on hardware.

Checks: (1) repeat-rich records now keep slots_ok=True (no full-array
fallback); (2) parity vs oracle on poly-run records; (3) fused perf
unchanged on random input.

Usage: python scripts/exp_r3k.py
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
from ntjoin_tpu.ops.nthash_np import sketch_codes
from ntjoin_tpu.ops.sketch_pallas import (
    _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused, sketch_codes_pallas,
    sketch_records_pallas,
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
    k, w = 32, 1000
    rng = np.random.default_rng(42)

    # 1. parity on a poly-run record via the product API
    rep = rng.integers(0, 4, size=1 << 22).astype(np.int8)
    rep[100_000:100_200] = 0        # poly-A, inside-run windows all-equal
    rep[2_000_000:2_001_500] = 2    # 1.5 kbp poly-G: slides in many blocks
    rep[3_000_000:3_000_100:2] = 0  # AT microsatellite
    rep[3_000_001:3_000_101:2] = 3
    got = sketch_codes_pallas(rep, k, w)
    exp = sketch_codes(rep, k, w)
    assert np.array_equal(got.positions, exp.positions), "rep pos mismatch"
    assert np.array_equal(got.hashes, exp.hashes), "rep hash mismatch"
    p("poly-run record parity OK (2^22)")

    # 2. slots_ok stays True on the repeat-rich record (compression holds;
    # before this change the 1.5 kbp run overflowed 15 slots per block and
    # forced the full-array fallback)
    n = rep.shape[0]
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = rep
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    out = _sketch_fused(jnp.asarray(buf), n, k, w, cap)
    assert bool(out[4]), "ok flag"
    p(f"slots_ok on repeat-rich record: {bool(out[5])} (want True)")

    # 3. fused perf on random @2^27 (regression check vs 49.1 ms)
    n = 1 << 27
    codes_np = rng.integers(0, 4, size=n).astype(np.int8)
    nk = n - k + 1
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = jax.device_put(buf)
    sync(dev)
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
    cnt_slots = int(out[3])
    out_full = _sketch_fused(dev, n, k, w, cap, slots=False)
    cnt_full = int(out_full[3])
    # NB this script's rng draws rep BEFORE codes_np, so codes_np differs
    # from exp_r3i/j's (269,566): compare slot path vs full-array path on
    # the SAME data instead (random input has no equal-hash slides)
    p(f"count slots={cnt_slots} full={cnt_full} (must agree)")
    assert cnt_slots == cnt_full, (cnt_slots, cnt_full)

    # 4. repeat-rich MULTI batch through the product path (fast path, no
    # fallback) — parity per record
    recs = [rep[i:i + (1 << 21)] for i in range(0, rep.shape[0], 1 << 21)]
    outs = sketch_records_pallas(recs, k, w)
    for i, (r, o) in enumerate(zip(recs, outs)):
        e = sketch_codes(r, k, w)
        assert np.array_equal(o.positions, e.positions), f"rec {i} pos"
        assert np.array_equal(o.hashes, e.hashes), f"rec {i} hash"
    p("repeat-rich multi-batch parity OK")
    p("DONE")


if __name__ == "__main__":
    main()
