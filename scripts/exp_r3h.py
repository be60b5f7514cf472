"""Round-3 session H: bisect _compact_slots (~78 ms of the 151 ms fused path).

exp_r3f showed upto-window = 71.8 ms with the compaction DCE'd, while the
real pipeline (count depends on every output) runs 151 ms: the slot
compaction dominates despite its 2M-element input.  Time each sub-step
under its own jit, then variants of the suspect steps.

Usage: python scripts/exp_r3h.py
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
    _CHUNKS, _I32, _LANE, _MAXU, _NSLOT, _ROW_BLOCK, _SUB, _ceil_to,
    _hash_chunked, _sketch_fused, _window_emit_chunked,
)

T0 = time.monotonic()
BUDGET = 1500.0


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

    dt = timeit(lambda: _sketch_fused(dev, n, k, w, cap)[3])
    p(f"fused full: {dt*1e3:.1f} ms")

    # materialize the slot arrays once (device-resident input for sub-steps)
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    nw = nk - w + 1

    @jax.jit
    def window_out(cp):
        sections = -(-(L + halo) // L)
        blocks = [
            cp[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
            for s in range(sections)
        ]
        x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
        x8 = jnp.pad(x8, ((0, code_rows - L - halo), (0, 0)),
                     constant_values=CODE_INVALID)
        x8 = x8.reshape(code_rows, _SUB, _LANE)
        x_lag = jnp.pad(
            x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
            constant_values=CODE_INVALID,
        )
        h_lo, h_hi, val = _hash_chunked.__wrapped__(x8, x_lag, k)
        a = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
        b = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
        pad_rows = rows_p - hash_rows
        a = jnp.pad(a, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        b = jnp.pad(b, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        scal = jnp.stack([jnp.asarray(L, _I32), jnp.asarray(nw, _I32)])
        return _window_emit_chunked.__wrapped__(
            a.transpose(1, 0, 2), b.transpose(1, 0, 2), scal, w
        )

    oix, olo, ohi, orun = jax.tree_util.tree_map(
        jnp.copy, window_out(dev)
    )
    sync(oix)
    p(f"slot arrays ready: {oix.shape}")

    groups, nbm1, _, lanes = oix.shape
    nl = groups * lanes
    rows = nbm1 * _NSLOT

    def pre(oix, olo, ohi):
        tix = oix[:, :, :_NSLOT, :].transpose(0, 3, 1, 2)
        tlo = olo[:, :, :_NSLOT, :].transpose(0, 3, 1, 2)
        thi = ohi[:, :, :_NSLOT, :].transpose(0, 3, 1, 2)
        fix = tix.reshape(nl, rows).T
        flo = tlo.reshape(nl, rows).T
        fhi = thi.reshape(nl, rows).T
        return fix, flo, fhi

    def cums(fix):
        live = fix >= 0
        within = jnp.cumsum(live.astype(_I32), axis=0)
        lane_cum = jnp.cumsum(within[-1])
        return within, lane_cum

    # s1: counts + total only
    s1 = jax.jit(lambda: jnp.sum(oix[:, :, _NSLOT, :]))
    p(f"s1 counts/total: {timeit(s1)*1e3:.1f} ms")

    # s2: + transposes / reshapes
    s2 = jax.jit(lambda: tuple(jnp.sum(v) for v in pre(oix, olo, ohi)))
    p(f"s2 +transposes: {timeit(s2)*1e3:.1f} ms")

    # s3: + cumsums
    def _s3():
        fix, flo, fhi = pre(oix, olo, ohi)
        within, lane_cum = cums(fix)
        return jnp.sum(within), lane_cum[-1], jnp.sum(flo), jnp.sum(fhi)
    s3 = jax.jit(_s3)
    p(f"s3 +cumsums: {timeit(s3)*1e3:.1f} ms")

    # s4: + lane assignment (broadcast compare over (cap, nl))
    def _s4():
        fix, flo, fhi = pre(oix, olo, ohi)
        within, lane_cum = cums(fix)
        q = jax.lax.optimization_barrier(
            jax.lax.broadcasted_iota(_I32, (cap, 1), 0)
        )[:, 0]
        lane = jnp.clip(
            jnp.sum((lane_cum[None, :] <= q[:, None]).astype(_I32), axis=1),
            0, nl - 1,
        ).astype(_I32)
        return jnp.sum(lane), jnp.sum(flo), jnp.sum(fhi)
    s4 = jax.jit(_s4)
    p(f"s4 +lane-compare: {timeit(s4)*1e3:.1f} ms")

    # s5: + radix descent
    def _s5():
        fix, flo, fhi = pre(oix, olo, ohi)
        within, lane_cum = cums(fix)
        q = jax.lax.optimization_barrier(
            jax.lax.broadcasted_iota(_I32, (cap, 1), 0)
        )[:, 0]
        lane = jnp.clip(
            jnp.sum((lane_cum[None, :] <= q[:, None]).astype(_I32), axis=1),
            0, nl - 1,
        ).astype(_I32)
        flat = within.reshape(-1)
        base = jnp.where(lane > 0, lane_cum[jnp.maximum(lane - 1, 0)], 0)
        tgt = q - base + 1
        span = 1
        while span * 8 < rows:
            span *= 8
        r = jnp.zeros_like(q)
        j7 = jnp.arange(1, 8, dtype=jnp.int32)
        while span >= 1:
            cand = r[:, None] + j7[None, :] * span
            probe = flat[(jnp.minimum(cand, rows) - 1) * nl + lane[:, None]]
            ok = (cand <= rows) & (probe < tgt[:, None])
            r = r + span * jnp.sum(ok.astype(_I32), axis=1)
            span //= 8
        r = jnp.minimum(r, rows - 1)
        src = r * nl + lane
        return jnp.sum(src), jnp.sum(flo), jnp.sum(fhi)
    s5 = jax.jit(_s5)
    p(f"s5 +descent: {timeit(s5)*1e3:.1f} ms")

    # s6: full _compact_slots
    from ntjoin_tpu.ops.sketch_pallas import _compact_slots
    s6 = jax.jit(lambda: _compact_slots(oix, olo, ohi, orun, cap)[4])
    p(f"s6 full compact: {timeit(s6)*1e3:.1f} ms")

    if time.monotonic() - T0 < BUDGET - 300:
        # variant: lane via per-rank descent on the 1024-entry lane_cum
        def _v1():
            fix, flo, fhi = pre(oix, olo, ohi)
            within, lane_cum = cums(fix)
            q = jax.lax.optimization_barrier(
                jax.lax.broadcasted_iota(_I32, (cap, 1), 0)
            )[:, 0]
            span = 512
            lane = jnp.zeros_like(q)
            j7 = jnp.arange(1, 8, dtype=jnp.int32)
            while span >= 1:
                cand = lane[:, None] + j7[None, :] * span
                probe = lane_cum[jnp.minimum(cand, nl) - 1]
                ok = (cand <= nl) & (probe <= q[:, None])
                lane = lane + span * jnp.sum(ok.astype(_I32), axis=1)
                span //= 8
            lane = jnp.clip(lane, 0, nl - 1)
            return jnp.sum(lane), jnp.sum(flo), jnp.sum(fhi)
        p(f"v1 lane-descent: {timeit(jax.jit(_v1))*1e3:.1f} ms")
    p("DONE")


if __name__ == "__main__":
    main()
