"""Round-3 session D: per-stage profile of the v3 fused path @ 2^27.

Usage: python scripts/exp_r3d.py [size_log2=27]
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
    _CHUNKS, _LANE, _MAXU, _ROW_BLOCK, _SUB, _ceil_to, _compact_slots,
    _hash_chunked, _pick_tr, _sketch_fused, _window_emit_chunked,
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


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    n = 1 << lg
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes_np = rng.integers(0, 4, size=n).astype(np.int8)

    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    nw = nk - w + 1
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = jax.device_put(buf)
    sync(dev)
    p(f"uploaded; tr={_pick_tr(w)}")

    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3])
    p(f"fused v3 total: {dt*1e3:.1f} ms => {n/dt/1e9:.3f} Gbp/s")

    # stage: layout + widen + lag
    @jax.jit
    def layout(cp):
        sections = -(-(L + halo) // L)
        blocks = [
            cp[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
            for s in range(sections)
        ]
        x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
        x8 = jnp.pad(x8, ((0, code_rows - L - halo), (0, 0)),
                     constant_values=CODE_INVALID)
        x8 = x8.reshape(code_rows, _SUB, _LANE)
        x = x8.astype(jnp.int32)
        x_lag = jnp.pad(
            x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
            constant_values=CODE_INVALID,
        ).astype(jnp.int32)
        return x, x_lag

    dt = timeit(lambda: layout(dev))
    p(f"layout+widen+lag: {dt*1e3:.1f} ms")
    x, x_lag = layout(dev)
    sync(x)

    dt = timeit(lambda: _hash_chunked(x, x_lag, k))
    p(f"hash kernel: {dt*1e3:.1f} ms => {n/dt/1e9:.1f} Gbp/s")
    h_lo, h_hi, val = _hash_chunked(x, x_lag, k)
    sync(h_lo)

    @jax.jit
    def prep(h_lo, h_hi):
        a = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
        b = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
        pad_rows = rows_p - hash_rows
        a = jnp.pad(a, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        b = jnp.pad(b, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        return a.transpose(1, 0, 2), b.transpose(1, 0, 2)

    dt = timeit(lambda: prep(h_lo, h_hi))
    p(f"slice+pad+transpose: {dt*1e3:.1f} ms")
    gm_lo, gm_hi = prep(h_lo, h_hi)
    sync(gm_lo)

    scal = jnp.stack([jnp.asarray(L, jnp.int32), jnp.asarray(nw, jnp.int32)])
    dt = timeit(lambda: _window_emit_chunked(gm_lo, gm_hi, scal, w))
    p(f"window-emit kernel: {dt*1e3:.1f} ms => {n/dt/1e9:.2f} Gbp/s")
    oix, olo, ohi = _window_emit_chunked(gm_lo, gm_hi, scal, w)
    sync(oix)

    compact = jax.jit(lambda a, b, c: _compact_slots(a, b, c, cap)[3])
    dt = timeit(lambda: compact(oix, olo, ohi))
    p(f"compact_slots: {dt*1e3:.1f} ms")

    @jax.jit
    def okred(val):
        return jnp.sum(val, dtype=jnp.int32)

    dt = timeit(lambda: okred(val))
    p(f"ok reduce: {dt*1e3:.1f} ms")
    p("DONE")


if __name__ == "__main__":
    main()
