"""Round-3 session F: bisect the fused-program overhead.

The stage-by-stage profile sums to ~52 ms while the composed program runs
~128 ms @ 2^27 — time cumulative prefixes of the pipeline as single jits
to find where the composition loses time.  Each prefix ends in cheap
reductions so XLA can't fold the unmeasured tail away.

Usage: python scripts/exp_r3f.py
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
    _hash_chunked, _sketch_fused, _window_emit_chunked,
)

T0 = time.monotonic()
_I32 = jnp.int32


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
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    nw = nk - w + 1
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes_np
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS
    dev = jax.device_put(buf)
    sync(dev)
    p("uploaded")

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
        x = x8.astype(_I32)
        x_lag = jnp.pad(
            x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
            constant_values=CODE_INVALID,
        ).astype(_I32)
        return x, x_lag

    def upto_hash(cp):
        x, x_lag = layout(cp)
        h_lo, h_hi, val = _hash_chunked.__wrapped__(x, x_lag, k)
        return (jnp.sum(val, dtype=_I32),
                jnp.sum(h_lo.astype(_I32), dtype=_I32))

    def prep(cp):
        x, x_lag = layout(cp)
        h_lo, h_hi, val = _hash_chunked.__wrapped__(x, x_lag, k)
        a = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
        b = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
        pad_rows = rows_p - hash_rows
        a = jnp.pad(a, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        b = jnp.pad(b, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        gl = a.transpose(1, 0, 2)
        gh = b.transpose(1, 0, 2)
        ok = jnp.sum(val, dtype=_I32)
        return gl, gh, ok

    def upto_prep(cp):
        gl, gh, ok = prep(cp)
        return (ok, jnp.sum(gl.astype(_I32), dtype=_I32),
                jnp.sum(gh.astype(_I32), dtype=_I32))

    def upto_window(cp):
        gl, gh, ok = prep(cp)
        scal = jnp.stack([jnp.asarray(L, _I32), jnp.asarray(nw, _I32)])
        oix, olo, ohi, orun = _window_emit_chunked.__wrapped__(gl, gh, scal, w)
        return ok, jnp.sum(oix[:, :, 15, :]), oix[0, 0, 0, 0]

    def full(cp):
        gl, gh, ok = prep(cp)
        scal = jnp.stack([jnp.asarray(L, _I32), jnp.asarray(nw, _I32)])
        oix, olo, ohi, orun = _window_emit_chunked.__wrapped__(gl, gh, scal, w)
        pos, lo, hi, run, count, slots_ok = _compact_slots(oix, olo, ohi, orun, cap)
        return count

    for name, fn in [
        ("layout-sums", jax.jit(lambda cp: tuple(jnp.sum(v, dtype=_I32) for v in layout(cp)))),
        ("upto-hash", jax.jit(upto_hash)),
        ("upto-prep", jax.jit(upto_prep)),
        ("upto-window", jax.jit(upto_window)),
        ("full-composed", jax.jit(full)),
    ]:
        t0 = time.monotonic()
        dt = timeit(lambda fn=fn: fn(dev))
        p(f"{name}: {dt*1e3:.1f} ms (first+trials took {time.monotonic()-t0:.0f} s)")

    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3])
    p(f"_sketch_fused: {dt*1e3:.1f} ms")
    p("DONE")


if __name__ == "__main__":
    main()
