"""One-shot device experiment: fused/general sketch timing by compaction mode.

Usage: NTJOIN_TPU_COMPACT=<topk|bsearch> python scripts/exp_compact.py [lg=24]

Prints one JSON line with compile + steady-state timings.  Run ONE process
at a time (axon tunnel serializes TPU processes); sync = host fetch of the
count scalar (jax.block_until_ready is a no-op over the relay).
"""
import json
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
import ntjoin_tpu.ops.sketch_pallas as sp


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << lg
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=n).astype(np.int8)
    res = {"lg": lg, "mode": sp._COMPACT_MODE}

    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // sp._CHUNKS)
    code_rows = sp._ceil_to(L + halo, sp._ROW_BLOCK)
    cap = max(5 * (nk // w + 1) // 2, 4096) + sp._CHUNKS
    buf = np.full(sp._CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes
    dev = jnp.asarray(buf)

    t0 = time.monotonic()
    out = sp._sketch_fused(dev, n, k, w, cap)
    cnt = int(out[3])
    res["fused_first_s"] = round(time.monotonic() - t0, 2)
    assert bool(out[4]) and 0 < cnt <= cap, (cnt, cap)
    res["fused_count"] = cnt
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        out = sp._sketch_fused(dev, n, k, w, cap)
        cnt = int(out[3])
        ts.append(time.monotonic() - t0)
    res["fused_ms"] = round(min(ts) * 1e3, 1)
    res["fused_gbps"] = round(n / min(ts) / 1e9, 3)

    # N-rich general path (single record, 100 interior N runs)
    codes_n = codes.copy()
    for s in rng.integers(0, n - 600, 100):
        codes_n[s : s + 500] = CODE_INVALID
    buf[:n] = codes_n
    devn = jnp.asarray(buf)
    cseg = sp._seg_cap(codes_n)
    res["cap_seg"] = cseg
    offs = jnp.zeros(1, jnp.int32)
    t0 = time.monotonic()
    g = sp._sketch_fused_general(devn, offs, n, k, w, cap, cap_seg=cseg)
    cnt = int(g[3])
    res["gen_first_s"] = round(time.monotonic() - t0, 2)
    res["gen_count"] = cnt
    res["gen_segs"] = int(g[5])
    assert int(g[5]) <= cseg
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        g = sp._sketch_fused_general(devn, offs, n, k, w, cap, cap_seg=cseg)
        cnt = int(g[3])
        ts.append(time.monotonic() - t0)
    res["gen_ms"] = round(min(ts) * 1e3, 1)
    res["gen_gbps"] = round(n / min(ts) / 1e9, 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
