"""Round-3 measurement: where do the multi/general sketch seconds go?

Run on one live chip (single process!).  Prints one labelled line per
measurement as it goes; self-limits wall time so it always exits cleanly
(a timeout-killed TPU process wedges the chip — CLAUDE.md).

Usage: python scripts/exp_r3.py [size_log2=27]
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
    _CHUNKS, _ROW_BLOCK, _ceil_to, _seg_cap, _sketch_fused,
    _sketch_fused_general, sketch_records_pallas,
)

T0 = time.monotonic()
BUDGET = float(os.environ.get("EXP_BUDGET_S", 900))


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

    # -- upload bandwidth: int8 full vs packed u8 quarter --
    def up(buf_np):
        d = jax.device_put(buf_np)
        sync(d)
        return d

    t0 = time.monotonic()
    up(codes_np)
    p(f"upload int8 {n>>20} MiB: {time.monotonic()-t0:.2f} s (warm path)")
    t0 = time.monotonic()
    up(codes_np)
    p(f"upload int8 again: {time.monotonic()-t0:.2f} s")
    packed = (
        codes_np[0::4] | (codes_np[1::4] << 2)
        | (codes_np[2::4] << 4) | (codes_np[3::4] << 6)
    ).astype(np.uint8)
    t0 = time.monotonic()
    up(packed)
    p(f"upload packed {n>>22} MiB: {time.monotonic()-t0:.2f} s")
    t0 = time.monotonic()
    up(packed)
    p(f"upload packed again: {time.monotonic()-t0:.2f} s")

    # -- host packing cost of the 2-bit pack itself --
    t0 = time.monotonic()
    _ = (
        codes_np[0::4] | (codes_np[1::4] << 2)
        | (codes_np[2::4] << 4) | (codes_np[3::4] << 6)
    )
    p(f"host 2-bit pack: {time.monotonic()-t0:.2f} s")

    # -- fused single record @ n --
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = up(buf)
    if left() < 600:
        p("budget low, skipping rest")
        return
    dt, ts = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3])
    p(f"fused total: {dt*1e3:.1f} ms trials={[f'{t*1e3:.0f}' for t in ts]} "
      f"=> {n/dt/1e9:.3f} Gbp/s (cap={cap})")

    # output fetch cost (pos/lo/hi cap-sized)
    out = _sketch_fused(dev, n, k, w, cap)
    cnt = int(out[3])
    t0 = time.monotonic()
    _ = np.asarray(out[0][:cnt]); _ = np.asarray(out[1][:cnt]); _ = np.asarray(out[2][:cnt])
    p(f"fused output fetch cnt={cnt}: {time.monotonic()-t0:.2f} s")

    # -- multi path wall, instrumented inline --
    recs = [codes_np[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    p(f"multi: {len(recs)} records of 2 Mbp")
    t0 = time.monotonic()
    sketch_records_pallas(recs, k, w)
    p(f"multi cold: {time.monotonic()-t0:.2f} s")
    t0 = time.monotonic()
    sketch_records_pallas(recs, k, w)
    p(f"multi warm total: {time.monotonic()-t0:.2f} s")

    # stage replication of what sketch_records_pallas does
    sep = k - 1
    total = sum(len(c) + sep for c in recs)
    t0 = time.monotonic()
    clean = [not (np.asarray(c) >= CODE_INVALID).any() for c in recs]
    p(f"  clean-check: {time.monotonic()-t0:.2f} s")
    offsets = np.zeros(len(recs), dtype=np.int32)
    t0 = time.monotonic()
    flat = np.full(total, CODE_INVALID, dtype=np.int8)
    cursor = 0
    for r, c in enumerate(recs):
        offsets[r] = cursor
        flat[cursor : cursor + c.shape[0]] = c
        cursor += c.shape[0] + sep
    p(f"  flat build: {time.monotonic()-t0:.2f} s")
    nk2 = total - k + 1
    L2 = -(-nk2 // _CHUNKS)
    code_rows2 = _ceil_to(L2 + halo, _ROW_BLOCK)
    t0 = time.monotonic()
    buf2 = np.full(_CHUNKS * L2 + code_rows2, CODE_INVALID, dtype=np.int8)
    buf2[:total] = flat
    p(f"  buf build: {time.monotonic()-t0:.2f} s")
    t0 = time.monotonic()
    dev2 = up(buf2)
    p(f"  upload: {time.monotonic()-t0:.2f} s")
    r_bucket = 8
    while r_bucket < len(recs):
        r_bucket *= 2
    cap2 = max(5 * (nk2 // w + 1) // 2, 4096) + _CHUNKS + 2 * r_bucket
    dt, ts = timeit(lambda: _sketch_fused(dev2, total, k, w, cap2, multi=True)[3])
    p(f"  multi device: {dt*1e3:.1f} ms trials={[f'{t*1e3:.0f}' for t in ts]}")
    out = _sketch_fused(dev2, total, k, w, cap2, multi=True)
    cnt = int(out[3])
    t0 = time.monotonic()
    pos = np.asarray(out[0][:cnt]); lo = np.asarray(out[1][:cnt]); hi = np.asarray(out[2][:cnt])
    p(f"  multi output fetch cnt={cnt}: {time.monotonic()-t0:.2f} s")

    if left() < 200:
        p("budget low, skipping general")
        return

    # -- general N-rich path --
    codes_n = codes_np.copy()
    for s in rng.integers(0, n - 600, 100):
        codes_n[s:s + 500] = CODE_INVALID
    recs_n = [codes_n[i:i + 2_000_000] for i in range(0, n, 2_000_000)]
    t0 = time.monotonic()
    sketch_records_pallas(recs_n, k, w)
    p(f"general cold: {time.monotonic()-t0:.2f} s")
    t0 = time.monotonic()
    sketch_records_pallas(recs_n, k, w)
    p(f"general warm total: {time.monotonic()-t0:.2f} s")
    # device-only portion
    flatn = np.full(total, CODE_INVALID, dtype=np.int8)
    cursor = 0
    offs = np.zeros(len(recs_n), np.int32)
    for r, c in enumerate(recs_n):
        offs[r] = cursor
        flatn[cursor : cursor + c.shape[0]] = c
        cursor += c.shape[0] + sep
    bufn = np.full(_CHUNKS * L2 + code_rows2, CODE_INVALID, dtype=np.int8)
    bufn[:total] = flatn
    devn = up(bufn)
    offs_p = np.full(r_bucket, total, np.int32)
    offs_p[:len(recs_n)] = offs
    offs_dev = jax.device_put(offs_p)
    t0 = time.monotonic()
    cseg = _seg_cap(flatn)
    p(f"  _seg_cap host scan: {time.monotonic()-t0:.2f} s (cseg={cseg})")
    dt, ts = timeit(
        lambda: _sketch_fused_general(
            devn, offs_dev, total, k, w, cap2, cap_seg=cseg, multi=True
        )[3],
    )
    p(f"  general device: {dt*1e3:.1f} ms trials={[f'{t*1e3:.0f}' for t in ts]}")
    p("DONE")


if __name__ == "__main__":
    main()
