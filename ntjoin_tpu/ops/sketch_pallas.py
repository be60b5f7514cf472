"""Pallas TPU kernels for the minimizer sketch — the flagship compute path.

Design (TPU-first, constant compile time via grids; see pallas guide):

* **Lane-chunked rolling hash.**  The sequence is cut into 1024 chunks laid
  out as the (8, 128) VPU tile; each lane owns one chunk and advances the
  ntHash2 recurrence sequentially down the rows while all 1024 lanes run in
  parallel.  The k-term "outgoing" correction uses a k-row ring buffer in
  VMEM scratch; invalid (non-ACGT) bases carry seed 0 so the rolling state
  stays consistent through N runs, and a per-lane ``last_bad`` row tracks
  k-mer validity.  Grid steps stream row blocks HBM->VMEM with the carry
  (hash state, ring buffer) persisting in scratch across the sequential
  grid.

* **Van Herk / Gil-Werman sliding-window argmin.**  Per lane, window minima
  over w consecutive rows cost ~3 lexicographic compares per element: blocks
  of w rows get a backward suffix scan stored in ping-pong scratch, and the
  next grid step emits windows by combining the stored suffix with a running
  forward prefix.  Ordering is (hash, position) lexicographic so ties pick
  the leftmost position, exactly like btllib's scan.

Chunks overlap by (w + k - 2) rows so every window is computed exactly at
seams (the same halo algebra as the mesh sharding).  Emission dedupe and the
nte1 output transform stay on host.  Bit-parity with the NumPy oracle is
enforced by ``tests/test_sketch_pallas.py``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ntjoin_tpu.constants import CODE_INVALID, SEEDS, srol_n
from ntjoin_tpu.ops import u64
from ntjoin_tpu.ops.nthash_np import Sketch, canonical_hashes, derive_hash

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
_I32 = jnp.int32
_MAXU = np.uint32(0xFFFFFFFF)

# Sublanes per row tile of the chunk layout.  The hash recurrence is
# ISSUE-bound (~66 tiny vector instructions per row advance all chunks one
# base), so more chunks per row = more data per instruction = fewer
# instructions per base: _SUB=16 (2048 chunks) measured ~1.5x faster hash
# than _SUB=8 on a v5e @2^27, at ~2% extra halo work.  Env-overridable for
# sweeps; _ROW_BLOCK shrinks with _SUB to hold the hash kernel's VMEM
# working set (in/out blocks, double-buffered) roughly constant.
_SUB = int(os.environ.get("NTJOIN_TPU_SUB", 16))
_LANE = 128
_CHUNKS = _SUB * _LANE

_ROW_BLOCK = max(64, 2048 // _SUB)  # rows per grid step in the hash kernel


def _split64(v: int) -> tuple[np.uint32, np.uint32]:
    return np.uint32(v & 0xFFFFFFFF), np.uint32((v >> 32) & 0xFFFFFFFF)


def _tables(k: int):
    """The four 4-entry constant tables the recurrences select from.

    The reverse-strand outgoing table is pre-rotated by srol^-1: rotation
    distributes over xor (it is a bit permutation), so
    ``sror1(r ^ seed[rc(out)]) = sror1(r) ^ sror1(seed)[out]`` — which
    turns BOTH recurrences into ``state = rot1(state) ^ m`` with ``m``
    independent of the carried state (all four table selects batch
    per-tile outside the sequential chain).
    """
    seed_in = [_split64(SEEDS[c]) for c in range(4)]
    seed_out = [_split64(srol_n(SEEDS[c], k)) for c in range(4)]
    seed_rc_out_rot = [
        _split64(srol_n(SEEDS[3 - c], 33 * 31 - 1)) for c in range(4)
    ]
    seed_rc_in = [_split64(srol_n(SEEDS[3 - c], k - 1)) for c in range(4)]
    return seed_in, seed_out, seed_rc_out_rot, seed_rc_in


def _sel(code, tab):
    """4-way constant select by base code; invalid codes map to 0."""
    zero = _U32(0)
    lo = jnp.where(
        code == 0, tab[0][0],
        jnp.where(code == 1, tab[1][0],
                  jnp.where(code == 2, tab[2][0],
                            jnp.where(code == 3, tab[3][0], zero))),
    )
    hi = jnp.where(
        code == 0, tab[0][1],
        jnp.where(code == 1, tab[1][1],
                  jnp.where(code == 2, tab[2][1],
                            jnp.where(code == 3, tab[3][1], zero))),
    )
    return lo, hi


# recurrence rows advanced per loop iteration (env-overridable for sweeps;
# must divide _ROW_BLOCK)
_UNROLL = int(os.environ.get("NTJOIN_TPU_UNROLL", 8))


def _hash_kernel(k, x_ref, xlag_ref, lo_ref, hi_ref, val_ref,
                 fwd_lo, fwd_hi, rev_lo, rev_hi, last_bad):
    t_in, t_out, t_rc_out, t_rc_in = _tables(k)
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        zeros = jnp.zeros(fwd_lo.shape, _U32)
        fwd_lo[...] = zeros
        fwd_hi[...] = zeros
        rev_lo[...] = zeros
        rev_hi[...] = zeros
        last_bad[...] = jnp.full(last_bad.shape, -1, _I32)

    rb = x_ref.shape[0]

    def body(t8, _):
        base = t8 * _UNROLL
        # codes may arrive int8 (4x less HBM traffic than pre-widened i32);
        # the widen happens here, once per VMEM tile
        tile = x_ref[pl.ds(base, _UNROLL)].astype(_I32)  # (_UNROLL, SUB, LANE)
        lag = xlag_ref[pl.ds(base, _UNROLL)].astype(_I32)
        # batched seed terms: independent of the carried state, so all four
        # table selects run as whole-tile ops OUTSIDE the sequential chain
        # (the chain per row is just rot1 + xor per strand)
        mf = u64.xor(_sel(lag, t_out), _sel(tile, t_in))
        mr = u64.xor(_sel(lag, t_rc_out), _sel(tile, t_rc_in))
        f = (fwd_lo[0], fwd_hi[0])
        r = (rev_lo[0], rev_hi[0])
        lb = last_bad[0]
        out_lo, out_hi, out_val = [], [], []
        for u in range(_UNROLL):  # static unroll: one dynamic slice per tile
            i = g * rb + base + u
            row = tile[u]
            # fwd_i = srol(fwd) ^ (srol^k(seed[out]) ^ seed[in])
            f = u64.xor(u64.srol1(f), (mf[0][u], mf[1][u]))
            # rev_i = srol^{-1}(rev) ^ (srol^{-1}(seed[rc(out)])
            #         ^ srol^{k-1}(seed[rc(in)]))
            r = u64.xor(u64.sror1(r), (mr[0][u], mr[1][u]))
            lb = jnp.where(row >= CODE_INVALID, i, lb)
            canon = u64.add(f, r)
            out_lo.append(canon[0])
            out_hi.append(canon[1])
            out_val.append(((i - lb) >= k).astype(jnp.int8))
        fwd_lo[0], fwd_hi[0] = f
        rev_lo[0], rev_hi[0] = r
        last_bad[0] = lb
        lo_ref[pl.ds(base, _UNROLL)] = jnp.stack(out_lo)
        hi_ref[pl.ds(base, _UNROLL)] = jnp.stack(out_hi)
        val_ref[pl.ds(base, _UNROLL)] = jnp.stack(out_val)
        return 0

    jax.lax.fori_loop(0, rb // _UNROLL, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _hash_chunked(x, x_lag, k: int, interpret: bool = False):
    """x: (rows, SUB, LANE) int8/int32 codes -> (lo, hi, valid) same shape.

    ``x_lag`` is ``x`` delayed by k rows (INVALID before row k): the
    outgoing-base stream of the rolling recurrences.  Row r of output =
    canonical hash of the k-mer *ending* at row r (valid from row k-1 on);
    callers shift by k-1 to get start-indexed hashes.
    """
    rows = x.shape[0]
    grid = rows // _ROW_BLOCK
    spec = pl.BlockSpec(
        (_ROW_BLOCK, _SUB, _LANE), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_hash_kernel, k),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _SUB, _LANE), _U32),
            jax.ShapeDtypeStruct((rows, _SUB, _LANE), _U32),
            jax.ShapeDtypeStruct((rows, _SUB, _LANE), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, _SUB, _LANE), _U32),  # fwd lo
            pltpu.VMEM((1, _SUB, _LANE), _U32),  # fwd hi
            pltpu.VMEM((1, _SUB, _LANE), _U32),  # rev lo
            pltpu.VMEM((1, _SUB, _LANE), _U32),  # rev hi
            pltpu.VMEM((1, _SUB, _LANE), _I32),  # last invalid row
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, x_lag)


# -- windowed argmin ---------------------------------------------------------


def _lexmin3(a, b):
    a_lo, a_hi, a_ix = a
    b_lo, b_hi, b_ix = b
    a_sm = u64.less((a_lo, a_hi), (b_lo, b_hi)) | (
        (a_lo == b_lo) & (a_hi == b_hi) & (a_ix <= b_ix)
    )
    return (
        jnp.where(a_sm, a_lo, b_lo),
        jnp.where(a_sm, a_hi, b_hi),
        jnp.where(a_sm, a_ix, b_ix),
    )


def _min3_first(a, b):
    """min of two (lo, hi, ix) triples, ties -> ``a``.

    When ``a`` covers the earlier stream rows, preferring it on value ties
    IS the leftmost-tie argmin (each operand's own ties were resolved the
    same way recursively), so the 3-word lexicographic compare of
    ``_lexmin3`` collapses to a 2-word compare — ~40% fewer VPU ops on the
    scan hot path."""
    b_sm = u64.less((b[0], b[1]), (a[0], a[1]))
    return (
        jnp.where(b_sm, b[0], a[0]),
        jnp.where(b_sm, b[1], a[1]),
        jnp.where(b_sm, b[2], a[2]),
    )


def _min3_second(a, b):
    """min of two (lo, hi, ix) triples, ties -> ``b`` (the earlier rows)."""
    a_sm = u64.less((a[0], a[1]), (b[0], b[1]))
    return (
        jnp.where(a_sm, a[0], b[0]),
        jnp.where(a_sm, a[1], b[1]),
        jnp.where(a_sm, a[2], b[2]),
    )


def _window_kernel(w, l_ref, lo_ref, hi_ref, out_ix, s_lo, s_hi, s_ix):
    g = pl.program_id(0)
    b = pl.program_id(1)
    prev = ((b + 1) % 2) * w  # ping-pong scratch row offsets
    cur = (b % 2) * w
    maxu = jnp.full((1, _LANE), _MAXU, _U32)
    maxi = jnp.full((1, _LANE), np.int32(2**31 - 1), _I32)
    # stream index of row t in this block: chunk_of_lane * L + (b*w + t);
    # monotone per lane, so (hash, ix) lex order = leftmost-in-stream ties
    chunk = g * _LANE + jax.lax.broadcasted_iota(_I32, (1, _LANE), 1)
    ix_base = chunk * l_ref[0] + b * w

    def row(ref, t):
        return ref[0, pl.ds(t, 1), :]

    def srow(ref, off, t):
        return ref[pl.ds(off + t, 1), :]

    # forward: emit windows of block b-1 combining stored suffix with the
    # running prefix over this block's first t rows
    def fwd(t, p):
        @pl.when(b > 0)
        def _():
            res = _lexmin3(
                (srow(s_lo, prev, t), srow(s_hi, prev, t), srow(s_ix, prev, t)), p
            )
            # only the argmin's stream index is written: the winning hash is
            # re-gathered by position afterwards (1/3 the output traffic)
            out_ix[0, pl.ds(t, 1), :] = res[2]

        return _lexmin3(p, (row(lo_ref, t), row(hi_ref, t), ix_base + t))

    jax.lax.fori_loop(0, w, fwd, (maxu, maxu, maxi))

    # backward: fill this block's suffix scan
    def bwd(j, s):
        t = w - 1 - j
        s = _lexmin3(s, (row(lo_ref, t), row(hi_ref, t), ix_base + t))
        s_lo[pl.ds(cur + t, 1), :] = s[0]
        s_hi[pl.ds(cur + t, 1), :] = s[1]
        s_ix[pl.ds(cur + t, 1), :] = s[2]
        return s

    jax.lax.fori_loop(0, w, bwd, (maxu, maxu, maxi))


def _shift_down(x, s, fill):
    """Rows r >= s get row r-s; rows < s get ``fill`` rows (static s)."""
    return jnp.concatenate([fill[:s], x[:-s]], axis=0)


def _shift_up(x, s, fill):
    return jnp.concatenate([x[s:], fill[:s]], axis=0)


def _tile_scan3(vals, shift, fill3):
    """Inclusive lexmin scan over the 8-row sublane axis (3 log steps)."""
    for s in (1, 2, 4):
        shifted = tuple(shift(v, s, f) for v, f in zip(vals, fill3))
        vals = _lexmin3(vals, shifted)
    return vals


def _window_kernel_v2(w, l_ref, lo_ref, hi_ref, out_ix, s_lo, s_hi, s_ix):
    """Sublane-tiled Van Herk: 8 window rows per loop iteration.

    Requires w % 8 == 0 (the wrapper falls back to the row-sequential kernel
    otherwise).  Per tile: in-tile lexmin scans along sublanes (3 shifted
    combines) plus a running carry replace 8 sequential row steps.
    """
    g = pl.program_id(0)
    b = pl.program_id(1)
    prev = ((b + 1) % 2) * w
    cur = (b % 2) * w
    nt = w // 8
    maxu = jnp.full((8, _LANE), _MAXU, _U32)
    maxi = jnp.full((8, _LANE), np.int32(2**31 - 1), _I32)
    fills = (maxu, maxu, maxi)
    chunk = g * _LANE + jax.lax.broadcasted_iota(_I32, (8, _LANE), 1)
    row_in_tile = jax.lax.broadcasted_iota(_I32, (8, _LANE), 0)

    def tile(ref, t8):
        return ref[0, pl.ds(t8 * 8, 8), :]

    def ix_tile(t8):
        return chunk * l_ref[0] + (b * w + t8 * 8) + row_in_tile

    # forward: emit 8 windows of block b-1 per tile; carry = inclusive prefix
    def fwd(t8, carry):
        vals = (tile(lo_ref, t8), tile(hi_ref, t8), ix_tile(t8))
        incl = _tile_scan3(vals, _shift_down, fills)
        carry_b = tuple(jnp.broadcast_to(c, (8, _LANE)) for c in carry)
        incl = _lexmin3(incl, carry_b)
        # exclusive prefix per row: shift down by one, row 0 <- carry
        excl = tuple(
            _shift_down(i, 1, c) for i, c in zip(incl, carry_b)
        )

        @pl.when(b > 0)
        def _():
            sp = (
                s_lo[pl.ds(prev + t8 * 8, 8), :],
                s_hi[pl.ds(prev + t8 * 8, 8), :],
                s_ix[pl.ds(prev + t8 * 8, 8), :],
            )
            res = _lexmin3(sp, excl)
            out_ix[0, pl.ds(t8 * 8, 8), :] = res[2]

        return tuple(i[7:8] for i in incl)  # (1, LANE) carries

    init = (maxu[:1], maxu[:1], maxi[:1])
    jax.lax.fori_loop(0, nt, fwd, init)

    # backward: fill this block's suffix scan, 8 rows per step
    def bwd(j, carry):
        t8 = nt - 1 - j
        vals = (tile(lo_ref, t8), tile(hi_ref, t8), ix_tile(t8))
        incl = _tile_scan3(vals, _shift_up, fills)
        carry_b = tuple(jnp.broadcast_to(c, (8, _LANE)) for c in carry)
        incl = _lexmin3(incl, carry_b)
        s_lo[pl.ds(cur + t8 * 8, 8), :] = incl[0]
        s_hi[pl.ds(cur + t8 * 8, 8), :] = incl[1]
        s_ix[pl.ds(cur + t8 * 8, 8), :] = incl[2]
        return tuple(i[:1] for i in incl)

    jax.lax.fori_loop(0, nt, bwd, init)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _window_chunked(lo, hi, l_per_chunk, w: int, interpret: bool = False):
    """Per-window (length w, along rows) lexicographic argmin, per lane.

    Inputs (GROUPS, rows, LANE) group-major; rows must be a multiple of w
    with one final all-max block so the last real windows flush.  Output row
    t of block b is the argmin of the window starting at row b*w + t; the
    emitted index is the global stream index chunk*L + row.
    """
    groups, rows, _ = lo.shape
    nb = rows // w

    in_spec = pl.BlockSpec(
        (1, w, _LANE), lambda g, b: (g, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, w, _LANE),
        lambda g, b: (g, jnp.maximum(b, 1) - 1, 0),
        memory_space=pltpu.VMEM,
    )
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = _window_kernel_v2 if w % 8 == 0 else _window_kernel
    return pl.pallas_call(
        functools.partial(kernel, w),
        grid=(groups, nb),
        in_specs=[scalar_spec, in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((groups, rows - w, _LANE), _I32),
        scratch_shapes=[
            pltpu.VMEM((2 * w, _LANE), _U32),
            pltpu.VMEM((2 * w, _LANE), _U32),
            pltpu.VMEM((2 * w, _LANE), _I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(l_per_chunk, lo, hi)


# -- windowed argmin + in-kernel emission compaction (v3) --------------------

# Output rows per (group, block): 0.._NSLOT-1 = emission slots, last = raw
# fresh-emission count (overflow detection)
# count.  Emissions per (lane, w-window block) are ~Poisson(2) regardless of
# w (argmin moves twice per window span on average), so 15 slots put the
# per-block overflow probability near 4e-10; overflow falls back to the
# full-array compaction path.
_SLOTS = 32  # 31 data slots + the count row: repeat-run BOUNDARIES burst
# ~8 distinct-hash fresh emissions each (measured on a 1.5 kbp poly run:
# 7 before + 8 after the head in one w-block), so 15 was one short for a
# block holding both edges of a run; 31 tolerates several bursts
_NSLOT = _SLOTS - 1
# Slot-assembly fast-tier bound.  The tier decision is per BLOCK via a max
# over its 128 lanes, so the bound must sit far out on the per-lane tail:
# raw emissions per (lane, w-window block) are ~Poisson(2), giving
# P(lane > 4) ~ 5% -> with 128 lanes nearly every block would go dense,
# while P(lane > 8) ~ 2e-4 keeps the dense tier (the full _NSLOT assembly
# + run compression) to ~2% of blocks.  Measured v5e @2^27 w=1000:
# FAST_SLOTS=4 left ~100% of blocks on the 31-slot dense path (~250 VPU
# ops/elem of slot reductions; fused 60.7 ms); 8 measured 48.1 ms vs 12's
# 49.1 and 16's 50.2.
_FAST_SLOTS = 8


def _pick_tr(w: int) -> int:
    """Rows per scan tile.

    Whole-block tiles (tr = w) make both Van Herk passes loop-free — one
    log2(w)-step shifted-lexmin scan over (w, LANE) vectors per pass, no
    sequential carry chain — which is the latency-friendly shape on a
    single sequential TensorCore.  Very large w falls back to the largest
    convenient divisor (bounded VMEM registers per op).
    """
    env = os.environ.get("NTJOIN_TPU_TR")
    if env:
        tr = int(env)
        if tr > 0 and w % tr == 0:
            return tr
    if w <= 64:
        return w
    # total scan work per block is ~w*log2(tr) elements (the doubling runs
    # within tiles), while per-tile loop/carry overhead grows as w/tr:
    # divisors near 40 measure fastest on a v5e (139.6 ms vs 151.6 at
    # tr=w for w=1000 @2^27)
    best = None
    for cand in range(8, min(w, 1024) + 1, 8):
        if w % cand == 0:
            if best is None or abs(cand - 40) < abs(best - 40):
                best = cand
    if best is not None:
        return best
    if w <= 1024:
        return w  # no mult-of-8 divisor: whole-block tiles
    return 0  # 0 = no v3 kernel for this w


def _bk_scan(vals, comb, fills, down: bool):
    """Brent-Kung-flavoured inclusive scan along axis 0 of (R, LANE) arrays.

    The naive shifted-combine scan costs log2(R) full-array passes; this
    does 3 sublane-local passes inside each native (8, LANE) vreg group
    (free-reshape to (R/8, 8, LANE), shifts never cross vreg boundaries),
    a log2(R/8)-pass coarse scan over the 1/8-size group totals, and one
    broadcast combine — ~4.1 passes/element instead of ~log2(R).

    ``comb(a, b)`` must treat operand ``b`` as covering the rows closer to
    the scan origin (earlier rows for ``down``, later rows for up) — the
    same convention as the shifted combines it replaces.  Requires R % 8
    == 0 (callers fall back to the naive scan otherwise).
    """
    R = vals[0].shape[0]
    lane = vals[0].shape[-1]
    nt8 = R // 8
    v = tuple(x.reshape(nt8, 8, lane) for x in vals)
    f3 = tuple(jnp.full((nt8, 8, lane), f, x.dtype) for f, x in zip(fills, vals))

    def shift_sub(x, s, fill):  # along the in-group (sublane) axis
        if down:
            return jnp.concatenate([fill[:, :s], x[:, : 8 - s]], axis=1)
        return jnp.concatenate([x[:, s:], fill[:, :s]], axis=1)

    def shift_grp(x, s, fill):  # along the group axis
        if down:
            return jnp.concatenate([fill[:s], x[:-s]], axis=0)
        return jnp.concatenate([x[s:], fill[:s]], axis=0)

    for s in (1, 2, 4):
        v = comb(v, tuple(shift_sub(x, s, f) for x, f in zip(v, f3)))
    # coarse scan over each group's inclusive total (the origin-far row)
    tot = tuple(x[:, 7:8, :] if down else x[:, 0:1, :] for x in v)
    fc = tuple(f[:, :1, :] for f in f3)
    s = 1
    while s < nt8:
        tot = comb(tot, tuple(shift_grp(x, s, f) for x, f in zip(tot, fc)))
        s *= 2
    excl = tuple(shift_grp(x, 1, f) for x, f in zip(tot, fc))
    v = comb(v, tuple(jnp.broadcast_to(x, (nt8, 8, lane)) for x in excl))
    return tuple(x.reshape(R, lane) for x in v)


def _scan_add(x, w, zf, bk: bool):
    """Inclusive sum scan down the rows of an (w, LANE) i32 array."""
    if bk and w % 8 == 0:
        return _bk_scan(
            (x,), lambda a, b: (a[0] + b[0],), (0,), down=True
        )[0]
    s = 1
    while s < w:
        x = x + _shift_down(x, s, zf)
        s *= 2
    return x


def _scan_propagate(pv, w, zf, bk: bool):
    """Last-nonzero propagate scan down the rows (packed stride words)."""
    if bk and w % 8 == 0:
        return _bk_scan(
            (pv,),
            lambda a, b: (jnp.where(a[0] != 0, a[0], b[0]),),
            (0,),
            down=True,
        )[0]
    s = 1
    while s < w:
        pv = jnp.where(pv != 0, pv, _shift_down(pv, s, zf))
        s *= 2
    return pv


def _window_emit_kernel(w, tr, has_flags, runs_on, scal_ref, *refs):
    """Van Herk windowed argmin with in-kernel emission compaction.

    Emissions of block b-1 are computed during block b (stored suffix +
    running prefix, as in ``_window_kernel_v2``) but instead of writing the
    full per-window argmin array, window results land in VMEM scratch and a
    per-block assembly pass compacts the emitted windows (argmin moved vs
    the previous window, btllib semantics) into ``_NSLOT`` slots per
    (lane, block); the raw per-lane count lands in the last slot row so the
    caller can detect overflow and fall back to the full-array path.

    **Equal-hash runs are stored compressed.**  Inside a repeat whose k-mer
    hash dominates the window, the leftmost-tie argmin advances by the
    repeat period (1 for homopolymers and reverse-complement-symmetric
    repeats like AT/CG, p for period-p microsatellites with distinct phase
    hashes — those emit only every p-th window) and the uncompressed
    emission stream would blow any slot bound (btllib emits every such
    position — the reference TSV artifact requires them).  An emission
    whose argmin advanced by the SAME stride as the previous emission with
    the min VALUE unchanged is a run continuation ("slide"): it increments
    the open slot's packed (count, stride) run word instead of taking a
    slot.  The previous emission's position and hash ride on the previous
    window row (argmin and win-value are constant between emissions); its
    stride comes from a packed last-nonzero propagate scan, so slides need
    NOT be consecutive windows.  The host expands slot (pos, hash, count,
    stride) to pos + j*stride — bit-equal to the uncompressed stream, so
    slot overflow needs > _NSLOT DISTINCT minima per w windows, which is
    density-pathological rather than repeat-content-dependent.

    scal_ref: SMEM (3,) i32 = [L (stream rows per chunk), n_windows, off].
    ``off`` lets the kernel consume END-indexed hash rows straight from
    the hash kernel (row r = hash of the k-mer ending at r): the lane's
    owned windows live at rows [off, off + L) with global position
    chunk*L + row - off, so the k-1 start-index slice+pad copy of both
    1 GB-class hash arrays disappears (callers subtract ``off`` from the
    emitted indices instead).  With ``has_flags`` an extra per-window
    input carries bit0 = window valid, bit1 = force-emit (record starts
    in the multi paths).

    Layout: inputs are 2-D (rows, CHUNKS) with column j = chunk j (the
    free reshape of the hash kernel's (rows, SUB, LANE) output — NO
    transpose); grid axis 0 walks 128-column groups via the BlockSpec, so
    ``chunk = g * LANE + lane`` exactly as before.

    The emission phase is two-tier ON THE RAW COUNT: blocks whose raw
    per-lane emission count fits ``_FAST_SLOTS`` (the overwhelmingly
    common case — ~2 emissions per w windows) skip the run-compression
    machinery entirely (no propagate scan, no slide tests) and assemble
    uncompressed; only repeat-dense blocks pay for compression + the full
    ``_NSLOT`` assembly.
    """
    if has_flags:
        (lo_ref, hi_ref, flg_ref, oix_ref, olo_ref, ohi_ref, orun_ref,
         s_lo, s_hi, s_ix, r_lo, r_hi, r_ix, pcar) = refs
    else:
        (lo_ref, hi_ref, oix_ref, olo_ref, ohi_ref, orun_ref,
         s_lo, s_hi, s_ix, r_lo, r_hi, r_ix, pcar) = refs
        flg_ref = None
    g = pl.program_id(0)
    b = pl.program_id(1)
    prev = ((b + 1) % 2) * w  # ping-pong scratch row offsets
    cur = (b % 2) * w
    nt = w // tr
    maxu = jnp.full((tr, _LANE), _MAXU, _U32)
    maxi = jnp.full((tr, _LANE), np.int32(2**31 - 1), _I32)
    fills = (maxu, maxu, maxi)
    L = scal_ref[0]
    nwin = scal_ref[1]
    off = scal_ref[2]
    lane = jax.lax.broadcasted_iota(_I32, (tr, _LANE), 1)
    chunk = g * _LANE + lane
    row_in_tile = jax.lax.broadcasted_iota(_I32, (tr, _LANE), 0)

    @pl.when(b == 0)
    def _init():
        pcar[...] = jnp.full(pcar.shape, -1, _I32)

    def tile(ref, t):
        return ref[pl.ds(t * tr, tr), :]

    bk = os.environ.get("NTJOIN_TPU_SCAN", "v3") == "bk"

    def tile_scan(vals, shift, comb):
        # ``comb`` prefers the operand covering the earlier rows on value
        # ties (leftmost-tie argmin without a 3rd compare word): the
        # down-shift feeds earlier rows as the SECOND operand, the
        # up-shift feeds later rows as the second operand.
        if bk and tr % 8 == 0:
            return _bk_scan(
                vals, comb, (_MAXU, _MAXU, np.int32(2**31 - 1)),
                down=shift is _shift_down,
            )
        s = 1
        while s < tr:
            shifted = tuple(shift(v, s, f) for v, f in zip(vals, fills))
            vals = comb(vals, shifted)
            s *= 2
        return vals

    # forward: window results of block b-1 -> result scratch
    def fwd(t, carry):
        ixt = chunk * L + (b * w + t * tr) + row_in_tile
        vals = (tile(lo_ref, t), tile(hi_ref, t), ixt)
        incl = tile_scan(vals, _shift_down, _min3_second)
        carry_b = tuple(jnp.broadcast_to(c, (tr, _LANE)) for c in carry)
        incl = _min3_second(incl, carry_b)  # carry covers earlier rows
        excl = tuple(_shift_down(i, 1, c) for i, c in zip(incl, carry_b))
        sp = (
            s_lo[pl.ds(prev + t * tr, tr), :],
            s_hi[pl.ds(prev + t * tr, tr), :],
            s_ix[pl.ds(prev + t * tr, tr), :],
        )
        res = _min3_first(sp, excl)  # suffix rows precede the prefix rows
        r_lo[pl.ds(t * tr, tr), :] = res[0]
        r_hi[pl.ds(t * tr, tr), :] = res[1]
        r_ix[pl.ds(t * tr, tr), :] = res[2]
        return tuple(i[tr - 1 : tr] for i in incl)

    init = (maxu[:1], maxu[:1], maxi[:1])
    jax.lax.fori_loop(0, nt, fwd, init)

    # emission + slot assembly over the whole block (runs for b > 0; the
    # b == 0 write lands in the same out block as b == 1 and is overwritten
    # by the sequential grid)
    win_row = (
        (b - 1) * w
        + jax.lax.broadcasted_iota(_I32, (w, _LANE), 0)
    )
    lane_w = jax.lax.broadcasted_iota(_I32, (w, _LANE), 1)
    chunk_w = g * _LANE + lane_w
    valid = (
        (win_row >= off)
        & (win_row < off + L)
        & (chunk_w * L + win_row - off < nwin)
    )
    first = win_row == off  # the lane's first VALID window force-emits
    # (its prev-row argmin is a warmup/junk window's and may alias it)
    if has_flags:
        f = flg_ref[...]
        valid &= (f & 1) == 1
        first |= (f & 2) != 0
    rix = r_ix[pl.ds(0, w), :]
    rlo = jax.lax.bitcast_convert_type(r_lo[pl.ds(0, w), :], _I32)
    rhi = jax.lax.bitcast_convert_type(r_hi[pl.ds(0, w), :], _I32)
    prev_ix = jnp.concatenate([pcar[0:1, :], rix[: w - 1]], axis=0)
    emiti = (valid & (first | (rix != prev_ix))).astype(_I32)
    zf = jnp.zeros((w, _LANE), _I32)

    # inclusive scan of RAW emissions: slot positions for the fast tier +
    # the branch condition for the dense tier
    rcum = _scan_add(emiti, w, zf, bk)
    cnt_raw = rcum[w - 1 : w]
    mc_raw = jnp.max(cnt_raw)

    def assemble(fresh, slot, cnt, ns, slide_d=None):
        # each live slot costs ~4 full-block reductions; typical blocks
        # emit ~2/lane, so the dense tail runs only when a lane actually
        # filled past the fast bound.  Mosaic has no unsigned reductions:
        # hash words ride as bitcast i32 and select-by-SUM (at most one
        # fresh row matches a slot, fill 0 -> the sum IS the value; the
        # index rides +1 so the empty-slot sum 0 decodes to the -1 pad).
        out_ix_rows, out_lo_rows, out_hi_rows, out_run_rows = [], [], [], []
        fr = fresh == 1
        for c in range(ns):
            selc = slot == c
            sel = fr & selc
            vix = jnp.sum(jnp.where(sel, rix + 1, 0), axis=0, keepdims=True) - 1
            out_ix_rows.append(vix)
            out_lo_rows.append(
                jnp.sum(jnp.where(sel, rlo, 0), axis=0, keepdims=True)
            )
            out_hi_rows.append(
                jnp.sum(jnp.where(sel, rhi, 0), axis=0, keepdims=True)
            )
            if slide_d is None:
                # uncompressed tier: every live slot is a count-1 run
                out_run_rows.append(jnp.where(vix >= 0, 1, 0))
            else:
                slide_i, d = slide_d
                runc = jnp.sum(jnp.where(selc, emiti, 0), axis=0, keepdims=True)
                # all slides of a run share one stride (the slide test
                # enforces d == prev_d along the chain): max extracts it
                strd = jnp.max(
                    jnp.where((slide_i == 1) & selc, d, 0),
                    axis=0, keepdims=True,
                )
                out_run_rows.append(runc | (strd << 16))  # packed
        pad = _NSLOT - ns
        if pad:
            out_ix_rows.append(jnp.full((pad, _LANE), -1, _I32))
            out_lo_rows.append(jnp.zeros((pad, _LANE), _I32))
            out_hi_rows.append(jnp.zeros((pad, _LANE), _I32))
            out_run_rows.append(jnp.zeros((pad, _LANE), _I32))
        oix_ref[0] = jnp.concatenate(out_ix_rows + [cnt], axis=0)
        olo_ref[0] = jnp.concatenate(
            out_lo_rows + [jnp.zeros((1, _LANE), _I32)], axis=0
        )
        ohi_ref[0] = jnp.concatenate(
            out_hi_rows + [jnp.zeros((1, _LANE), _I32)], axis=0
        )
        orun_ref[0] = jnp.concatenate(
            out_run_rows + [jnp.zeros((1, _LANE), _I32)], axis=0
        )

    # fast tier (the common case): raw emissions fit the fast slots, so no
    # compression is needed at all — uncompressed slots expand identically
    @pl.when(mc_raw <= _FAST_SLOTS)
    def _fast():
        assemble(emiti, rcum - 1, cnt_raw, _FAST_SLOTS)

    # dense tier: repeat-dense blocks.  Run continuation ("slide"): argmin
    # advanced by the SAME stride as the previous emission with the min
    # value unchanged.  Between emissions the window argmin — and therefore
    # the window-min VALUE — is constant, so the previous ROW already
    # carries the last emission's position (its stride is
    # d = rix - prev_ix) and hash (prev_lo/prev_hi); only the PREVIOUS
    # emission's own stride needs history, supplied by one packed
    # last-nonzero propagate scan of (d<<1 | 1) words.  The stride test,
    # not just +1, is what compresses PERIODIC repeats: a period-p
    # microsatellite with distinct phase hashes emits every p-th window
    # with argmin stride p (non-consecutive emissions — the phases are
    # distinct k-mers, but the winning phase's hash is constant), so a run
    # costs 2 fresh entries (the entering jump + the stride-defining step)
    # and slides for the rest.  The first in-block emission has no
    # in-block predecessor (the scan starts empty), so runs never span
    # blocks — a seam just opens a new run entry, which expands to the
    # same stream.  Mask algebra stays in i32 — Mosaic cannot relayout i1
    # vregs ("Invalid vector register cast" on bool concatenate).
    @pl.when(mc_raw > _FAST_SLOTS)
    def _dense():
        if runs_on:
            prev_lo = jnp.concatenate([rlo[:1], rlo[: w - 1]], axis=0)
            prev_hi = jnp.concatenate([rhi[:1], rhi[: w - 1]], axis=0)
            d = rix - prev_ix
            # propagate the last emission's packed stride word down the
            # rows (d <= w < 2^15 for real strides; a block-leading
            # emission's d can be a huge entering jump, still < 2^30 so
            # the pack is safe and — compared against strides <= w — inert)
            pv = _scan_propagate(((d << 1) | 1) * emiti, w, zf, bk)
            prev_pv = _shift_down(pv, 1, zf)  # last emission strictly above
            slide_i = (
                emiti
                * (prev_pv & 1)
                * (1 - first.astype(_I32))
                * (d == (prev_pv >> 1)).astype(_I32)
                * (rlo == prev_lo).astype(_I32)
                * (rhi == prev_hi).astype(_I32)
            )
            fresh = emiti - slide_i
            ecum = _scan_add(fresh, w, zf, bk)
            assemble(fresh, ecum - 1, ecum[w - 1 : w], _NSLOT, (slide_i, d))
        else:
            # stream-compacted callers: rank+1 is NOT genomic position+1,
            # so runs cannot expand arithmetically — emit uncompressed
            assemble(emiti, rcum - 1, cnt_raw, _NSLOT)

    pcar[...] = rix[w - 1 : w]

    # backward: fill this block's suffix scan
    def bwd(j, carry):
        t = nt - 1 - j
        ixt = chunk * L + (b * w + t * tr) + row_in_tile
        vals = (tile(lo_ref, t), tile(hi_ref, t), ixt)
        incl = tile_scan(vals, _shift_up, _min3_first)
        carry_b = tuple(jnp.broadcast_to(c, (tr, _LANE)) for c in carry)
        incl = _min3_first(incl, carry_b)  # carry covers later rows
        s_lo[pl.ds(cur + t * tr, tr), :] = incl[0]
        s_hi[pl.ds(cur + t * tr, tr), :] = incl[1]
        s_ix[pl.ds(cur + t * tr, tr), :] = incl[2]
        return tuple(i[:1] for i in incl)

    jax.lax.fori_loop(0, nt, bwd, init)


@functools.partial(
    jax.jit, static_argnames=("w", "runs", "nb", "interpret")
)
def _window_emit_chunked(lo, hi, scal, w: int, flags=None, runs: bool = True,
                         nb: int | None = None, interpret: bool = False):
    """Slot-compacted per-window emissions, per lane (kernel v3).

    Inputs (rows, NL) 2-D with column j = chunk j (the FREE reshape of the
    hash stage's (rows, SUB, LANE) output — no transpose copy); rows a
    multiple of w with one final flush block; ``scal`` = i32[2]
    (L, n_windows).  ``flags`` ((rows - w, NL), indexed by window row)
    carries bit0 = window-valid / bit1 = force-emit when given.  Returns
    (ix, lo, hi, run) of shape (nb-1, _SLOTS, NL): rows 0.._NSLOT-1 =
    emitted window argmin stream index / winning hash words / equal-hash
    run word, in window order, -1/0 padded; row _NSLOT of ix = the raw
    per-lane emission count for overflow detection.
    """
    rows, nl = lo.shape
    groups = nl // _LANE
    if nb is None:
        nb = rows // w
    assert nb * w <= rows
    tr = _pick_tr(w)
    if tr == 0:
        raise ValueError(f"no v3 scan tiling for w={w}")
    # run words pack (count, stride) 16/16; stride <= w must stay clear of
    # the packed sign bit (a stride >= 2^15 would sign-extend on the host's
    # int64 view and corrupt the expansion), hence the 2^15 gate
    runs = runs and w < (1 << 15)
    in_spec = pl.BlockSpec(
        (w, _LANE), lambda g, b: (b, g), memory_space=pltpu.VMEM
    )
    flg_spec = pl.BlockSpec(
        (w, _LANE),
        lambda g, b: (jnp.maximum(b, 1) - 1, g),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, _SLOTS, _LANE),
        lambda g, b: (jnp.maximum(b, 1) - 1, 0, g),
        memory_space=pltpu.VMEM,
    )
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    has_flags = flags is not None
    in_specs = [scal_spec, in_spec, in_spec] + ([flg_spec] if has_flags else [])
    args = (scal, lo, hi) + ((flags,) if has_flags else ())
    out_sh = (nb - 1, _SLOTS, nl)
    return pl.pallas_call(
        functools.partial(_window_emit_kernel, w, tr, has_flags, runs),
        grid=(groups, nb),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(  # hash words ride as bitcast i32 (no unsigned reductions)
            jax.ShapeDtypeStruct(out_sh, _I32),
            jax.ShapeDtypeStruct(out_sh, _I32),
            jax.ShapeDtypeStruct(out_sh, _I32),
            jax.ShapeDtypeStruct(out_sh, _I32),  # run lengths
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * w, _LANE), _U32),  # suffix lo
            pltpu.VMEM((2 * w, _LANE), _U32),  # suffix hi
            pltpu.VMEM((2 * w, _LANE), _I32),  # suffix ix
            pltpu.VMEM((w, _LANE), _U32),  # window results lo
            pltpu.VMEM((w, _LANE), _U32),  # window results hi
            pltpu.VMEM((w, _LANE), _I32),  # window results ix
            pltpu.VMEM((1, _LANE), _I32),  # prev-window argmin carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


def _compact_slots(oix, olo, ohi, orun, cap: int):
    """Global-order compaction of the slotted kernel outputs.

    (nbm1, _SLOTS, NL) -> cap-bounded (pos, lo, hi) in ascending
    stream order plus (count, slots_ok).

    Rank decode in ONE scatter + cummax forward fill: output ranks are
    lane-major, block order within lane, slot order within block, and the
    kernel fills slots 0..cnt-1 contiguously — so "rank -> (lane, block,
    slot)" is the inverse of a monotone step function over (lane, block)
    start ranks.  Every (lane, block) max-marks its global start rank
    with its combined lane-major key (ties from empty lanes/blocks
    resolve to the true owner because the key is monotone in rank order);
    cummax fills the gaps; slot = rank - owner's start (same
    scatter+fill).  O(cap) traffic, no per-rank compare tables — the old
    (cap, nl) broadcast compare measured ~16 ms at 2^27 via slope
    timing; small `.at[].max` scatters are ~free.  The single remaining
    gather round fetches all four payload planes batched.
    """
    nbm1, _, nl = oix.shape
    counts_raw = oix[:, _NSLOT, :]  # (nbm1, nl) raw emit counts
    total = jnp.sum(counts_raw)
    # per-lane capacity bound: worst legit density is ~4 emissions per w
    # windows (vs ~2 typical); a lane past cap_pl flips slots_ok and the
    # caller falls back to the exact full-array path, same contract as
    # slot overflow.  (The bound keeps pathological rank ranges out of
    # the clip below; the decode itself no longer pads per lane.)
    cap_pl = min(nbm1 * _NSLOT, max(4 * nbm1, 64))
    cap_pl = _ceil_to(cap_pl, 8)
    c = jnp.minimum(counts_raw, _NSLOT)  # (nbm1, nl) written slots
    cb = c.T  # lane-major (nl, blocks); lane == chunk in the 2-D layout
    bcum = jnp.cumsum(cb, axis=1)  # inclusive per-lane block cumsum
    per_lane = bcum[:, -1]  # (nl,)
    lane_cum = jnp.cumsum(per_lane)  # (nl,) inclusive
    slots_ok = jnp.all(counts_raw <= _NSLOT) & jnp.all(per_lane <= cap_pl)

    # global start rank of every (lane, block) + its lane-major key
    lane_start = lane_cum - per_lane  # exclusive cumsum (nl,)
    bstart = bcum - cb  # exclusive per-lane block cumsum (nl, nbm1)
    starts2d = lane_start[:, None] + bstart  # (nl, nbm1) global starts
    li2 = jax.lax.broadcasted_iota(_I32, (nl, nbm1), 0)
    bi2 = jax.lax.broadcasted_iota(_I32, (nl, nbm1), 1)
    key2d = li2 * nbm1 + bi2

    q = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (cap, 1), 0)
    )[:, 0]
    owner = jax.lax.cummax(
        jnp.zeros(cap, _I32).at[starts2d].max(key2d, mode="drop")
    )
    start_r = jax.lax.cummax(
        jnp.zeros(cap, _I32).at[starts2d].max(starts2d, mode="drop")
    )
    lane = owner // nbm1
    blk = owner - lane * nbm1
    slot = jnp.clip(q - start_r, 0, _NSLOT - 1)
    # flat index into the kernel's (nbm1, _SLOTS, nl) layout
    src = (blk * _SLOTS + slot) * nl + lane
    alive = q < total
    # one batched payload gather round: the four slot planes stack into a
    # single (4, nbm1*_SLOTS*nl) array so the fetches share one gather
    payload = jnp.stack(
        [oix.reshape(-1), olo.reshape(-1), ohi.reshape(-1), orun.reshape(-1)]
    )[:, src]
    out_pos = jnp.where(alive, payload[0], 0)
    out_lo = jax.lax.bitcast_convert_type(
        jnp.where(alive, payload[1], 0), _U32
    )
    out_hi = jax.lax.bitcast_convert_type(
        jnp.where(alive, payload[2], 0), _U32
    )
    out_run = jnp.where(alive, payload[3], 0)
    return out_pos, out_lo, out_hi, out_run, total, slots_ok


# -- fused device pipeline ---------------------------------------------------


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.jit
def _prep_codes(packed, starts, ends):
    """2-bit packed upload -> painted int8 code buffer, on device.

    The tunnel moves ~45 MB/s (measured), so shipping 4 bases/byte is a 4x
    upload win; 2-bit can't encode invalid bases, so the (few) invalid RUNS
    — record separators, N runs, the buffer tail — ride along as (start,
    end) index lists and are painted with ONE diff-scatter + cumsum
    (scatter cost on a v5e is ~80 ms fixed regardless of update count).
    ``starts``/``ends`` are padded with the sentinel ``4*len(packed)``
    (dropped by the scatter).
    """
    shifts = jnp.arange(0, 8, 2, dtype=jnp.uint8)
    codes = (
        (packed[:, None] >> shifts[None, :]) & jnp.uint8(3)
    ).astype(jnp.int8).reshape(-1)
    m = codes.shape[0]
    idx = jnp.concatenate([starts, ends])
    upd = jnp.concatenate(
        [jnp.ones_like(starts), jnp.full_like(ends, -1)]
    )
    delta = jnp.zeros(m, _I32).at[idx].add(upd, mode="drop")
    inside = jnp.cumsum(delta) > 0
    return jnp.where(inside, jnp.int8(CODE_INVALID), codes)


def _pack2_host(codes: np.ndarray, out: np.ndarray, byte_off: int) -> None:
    """Pack int8 codes (0..3; invalid bits ignored) into ``out`` starting at
    ``byte_off`` (codes laid at base offset ``4*byte_off``).  Uses the C++
    packer when available."""
    from ntjoin_tpu.io.native import available, pack2_native

    if available() and pack2_native(codes, out, byte_off):
        return
    n = codes.shape[0]
    nfull = n // 4
    c = (codes[: nfull * 4].astype(np.uint8) & 3).reshape(-1, 4)
    out[byte_off : byte_off + nfull] = (
        c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4) | (c[:, 3] << 6)
    )
    if n % 4:
        tail = np.uint8(0)
        for j in range(n % 4):
            tail |= np.uint8((int(codes[nfull * 4 + j]) & 3) << (2 * j))
        out[byte_off + nfull] = tail


def _invalid_runs(codes: np.ndarray, base: int) -> list[tuple[int, int]]:
    """(start, end) runs of invalid bases in ``codes``, offset by ``base``."""
    inv = np.asarray(codes) >= CODE_INVALID
    if not inv.any():
        return []
    d = np.diff(inv.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if inv[0]:
        starts = np.concatenate([[0], starts])
    if inv[-1]:
        ends = np.concatenate([ends, [inv.shape[0]]])
    return [(base + int(s), base + int(e)) for s, e in zip(starts, ends)]


_RUN_CAP = 1 << 18  # beyond this many invalid runs, plain int8 upload wins
# Junction (patch) windows are host work; past this many the old device
# stream-compaction path wins (also scaled by record length, see caller).
_PATCH_WORK_MIN = 1 << 20

# Stage wall-clock accumulators (populated when NTJOIN_TPU_TIMERS is set;
# bench.py resets/reads them for its per-stage detail).
_STAGES: dict[str, float] = {}

# Observed effective rates (Gbp/s) of the device batch path and the host
# native sketcher, kept across calls in this process: they size the
# host/device split of the next whole-assembly call.
_RATE_STATE: dict[str, float | None] = {"dev_gbps": None, "host_gbps": None}


def _stage(name: str, t0: float) -> None:
    import time

    if os.environ.get("NTJOIN_TPU_TIMERS"):
        _STAGES[name] = _STAGES.get(name, 0.0) + (time.monotonic() - t0)


def _invert_ranks(within_flat, lane_cum, ranks, rows: int):
    """Flat (row*NL + lane) index of the (rank+1)-th set flag, per rank.

    ``within_flat``: (rows, NL) per-lane inclusive cumsum of a flag array in
    (row, lane) layout; ``lane_cum``: (NL,) inclusive cumsum of the per-lane
    totals in lane order.  Monotone-inverse by radix descent: gathers of
    ``ranks``-sized batches are near-free while random scatters are the
    chip's slowest primitive, and round LATENCY (dependent probes), not
    probe count, dominates — so 7 independent probes per round (one wide
    gather) over log8(rows) rounds beat the log2(rows) one-probe rounds of
    plain bisection (measured ~4 ms/round for 340K ranks on a v5e).
    """
    nl = within_flat.shape[1]
    flat = within_flat.reshape(-1)
    # lane: first l with lane_cum[l] > rank (ranks outside clamp to the end).
    # One broadcast compare over the (ranks, nl) plane beats searchsorted
    # ~15x on a v5e (VPU-friendly vs gather-per-step bisection).
    lane = jnp.clip(
        jnp.sum((lane_cum[None, :] <= ranks[:, None]).astype(_I32), axis=1),
        0, nl - 1,
    ).astype(_I32)
    base = jnp.where(lane > 0, lane_cum[jnp.maximum(lane - 1, 0)], 0)
    tgt = ranks - base + 1
    # row: lower bound of tgt in within_flat[:, lane].  Radix-8: r stays the
    # largest span-multiple lower bound; passing candidates are a prefix of
    # j by monotonicity, so advancing by their count is exact.
    span = 1
    while span * 8 < rows:
        span *= 8
    r = jnp.zeros_like(ranks)
    j7 = jnp.arange(1, 8, dtype=jnp.int32)
    while span >= 1:
        cand = r[:, None] + j7[None, :] * span  # (ranks, 7)
        probe = flat[(jnp.minimum(cand, rows) - 1) * nl + lane[:, None]]
        ok = (cand <= rows) & (probe < tgt[:, None])
        r = r + span * jnp.sum(ok.astype(_I32), axis=1)
        span //= 8
    r = jnp.minimum(r, rows - 1)
    return r * nl + lane


def _expand_runs(pos, lo, hi, runs):
    """Expand compressed equal-hash runs into per-position emissions.

    ``runs`` words pack (count, stride) as low/high 16 bits: entry
    (p, h, count, stride) becomes positions p, p+stride, ...,
    p+(count-1)*stride, each with hash words h — exactly the uncompressed
    emission stream (every slide's argmin advanced by the run's stride
    with the window-min value unchanged; stride 1 = homopolymer, stride
    p = period-p microsatellite).  ``runs is None`` means the stream is
    already uncompressed.
    """
    if runs is None:
        return pos, lo, hi
    runs = np.asarray(runs, dtype=np.int64)
    if runs.size == 0:
        return pos, lo, hi
    counts = runs & 0xFFFF
    if int(counts.max(initial=1)) <= 1:
        return pos, lo, hi
    strides = (runs >> 16) & 0x7FFF  # defensive: kernel gates w < 2^15
    idx = np.repeat(np.arange(runs.shape[0]), counts)
    starts = np.cumsum(counts) - counts
    off = (
        np.arange(idx.shape[0], dtype=np.int64) - starts[idx]
    ) * np.maximum(strides[idx], 1)
    return pos[idx] + off, lo[idx], hi[idx]


_COMPACT_MODE = os.environ.get("NTJOIN_TPU_COMPACT", "bsearch")


def _compact_emissions(emit, order, cap: int, vals, mode: str | None = None):
    """Rank-compact ``vals`` where ``emit`` is set, in ascending ``order``.

    emit: (rows, SUB, LANE) bool; order: same-shape i32, unique among
    emitted elements and ascending in (chunk, row) order; vals: tuple of
    same-shape arrays.  Returns (count, [v[emit] padded to cap]).

    Two scatter-free strategies (scatters are the chip's slowest primitive):

    * ``bsearch`` (default): per-lane cumsum + monotone-inverse binary
      search (_invert_ranks) + gather.
    * ``topk``: one ``lax.top_k`` over ``-order`` keyed elements —
      descending -order = ascending order, non-emitted keyed INT32_MIN sort
      last; values gathered at the returned flat indices.  Measured on a
      v5e @ 2^24 (cap 43K over 16.7M elements) this LOST to bsearch 82 ms
      vs 37 ms — XLA TopK cost grows with k, so it only pays for small-k
      selections; kept selectable via ``NTJOIN_TPU_COMPACT=topk``.
    """
    count = jnp.sum(emit.astype(_I32))
    if (mode or _COMPACT_MODE) == "topk":
        key = jnp.where(emit, -order, jnp.int32(-(2**31)))
        k_eff = min(cap, emit.size)
        _, ki = jax.lax.top_k(key.reshape(-1), k_eff)
        if k_eff < cap:
            ki = jnp.pad(ki, (0, cap - k_eff))
        o = jax.lax.optimization_barrier(
            jax.lax.broadcasted_iota(_I32, (cap, 1), 0)
        )[:, 0]
        live = o < count
        outs = tuple(
            jnp.where(live, v.reshape(-1)[ki], jnp.zeros((), v.dtype))
            for v in vals
        )
        return count, outs
    rows = emit.shape[0]
    nl = _SUB * _LANE
    within = jnp.cumsum(emit.astype(_I32), axis=0).reshape(rows, nl)
    lane_cum = jnp.cumsum(within[-1])
    o = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (cap, 1), 0)
    )[:, 0]
    src = _invert_ranks(within, lane_cum, o, rows)
    live = o < count
    outs = tuple(
        jnp.where(live, v.reshape(-1)[src], jnp.zeros((), v.dtype))
        for v in vals
    )
    return count, outs


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "k", "w", "cap", "multi", "interpret", "mode", "slots",
        "stop_after", "pre_layout",
    ),
)
def _sketch_fused(codes_padded, n: int, k: int, w: int, cap: int,
                  multi: bool = False, interpret: bool = False,
                  mode: str = "bsearch", slots: bool = True,
                  stop_after: str | None = None, pre_layout: bool = False):
    """Whole sketch on device: layout -> hash -> window -> compacted result.

    Device-resident end to end; the only host transfers are the int8 code
    upload and the cap-bounded compacted outputs.  Exact when every k-mer is
    valid (the returned ``ok`` flag is False otherwise and callers fall back
    to the compacting general/host paths).

    codes_padded: int8[CHUNKS*L + code_rows] with CODE_INVALID padding.
    Returns (pos, lo, hi, count, ok, slots_ok): emissions in global window
    order with chunk-seam duplicates still present (host drops consecutive
    equal positions).

    With ``slots=True`` (default) the window stage is the v3 kernel with
    in-kernel emission compaction: no full-size argmin output, no
    full-array rank inversion, no hash masking passes (invalid windows are
    geometry-/flag-masked inside the kernel and their values never emit).
    ``slots_ok`` False means some (lane, block) emitted more than the
    ``_NSLOT`` slots — the caller retries with ``slots=False`` (the
    full-array compaction path, always exact).

    With ``multi=True``, the flat array holds whole N-free records joined
    by k-1 invalid separator bases (the caller pre-verifies cleanliness).
    Record boundaries then need no lookup tables at all: the k-mer
    validity bit IS the in-record mask (the only invalid k-mers are the
    separator-crossing ones), a window is alive iff all w of its k-mers
    are valid (a cumsum row-shift in the chunk layout — windows never
    leave their lane's row range), and each record's first window is
    exactly a false->true edge of that window-valid mask.  No stream
    compaction, no scatters, no per-element searchsorted.
    """
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    nw = nk - w + 1
    use_slots = slots and _pick_tr(w) > 0
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    if use_slots:
        # the slot path feeds END-indexed hash rows straight to the window
        # kernel: its nb_raw w-blocks (incl. the flush block) must exist in
        # the buffer (rows past L+halo hold invalid-code padding hashes
        # that only reach geometry-masked windows)
        code_rows = _ceil_to(
            max(L + halo, (-(-(L + halo) // w) + 1) * w), _ROW_BLOCK
        )

    # chunk layout rows [s*L, (s+1)*L) come from the flat array shifted by
    # s*L (chunk c row i = flat[c*L + i]); stacking shifted reshapes covers
    # halos longer than L.  Everything through the hash kernel stays int8
    # (1 B/base of HBM traffic); the kernel widens per-tile in VMEM.
    if pre_layout:
        # measurement path: codes arrive already in the chunked layout —
        # isolates the transpose's in-context cost for kernel_prof
        x8 = codes_padded.reshape(code_rows, _SUB, _LANE)
    else:
        sections = -(-(L + halo) // L)
        blocks = [
            codes_padded[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
            for s in range(sections)
        ]
        x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
        x8 = jnp.pad(
            x8, ((0, code_rows - L - halo), (0, 0)),
            constant_values=CODE_INVALID,
        )
        x8 = x8.reshape(code_rows, _SUB, _LANE)
    x = x8  # int8 straight into the kernel (widened per-tile in VMEM)
    x_lag = jnp.pad(
        x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)), constant_values=CODE_INVALID
    )

    h_lo, h_hi, val = _hash_chunked.__wrapped__(x, x_lag, k, interpret=interpret)

    if stop_after == "hash":
        # kernel_prof ablation: in-context cost of layout + hash alone
        # (consume via cheap reductions so nothing is DCE'd)
        return (
            jnp.sum(h_lo, dtype=_U32)
            ^ jnp.sum(h_hi, dtype=_U32)
            ^ jnp.sum(val, dtype=jnp.int8).astype(_U32)
        )

    if use_slots:
        # END-indexed rows go STRAIGHT into the window kernel (row r =
        # hash of the k-mer ending at r; windows live at rows
        # [off, off + L) with off = k - 1): no k-1 slice + pad copy of the
        # two GB-class hash arrays.  The sizing above guarantees
        # code_rows >= nb_raw * w, so the kernel's nb_raw blocks (incl.
        # the flush block) read real buffer rows; rows past the valid
        # range hold warmup/padding hashes that only ever reach
        # geometry-masked windows.
        off = k - 1
        nb_raw = -(-(L + halo) // w) + 1
        # N-detection without materialized iotas: for an N-free record the
        # number of valid k-mer slots in the layout (halo duplicates
        # included) is a closed form of the static shapes
        if multi:
            ok = jnp.asarray(True)
        else:
            # per chunk: valid k-mer ends live at raw rows
            # [off, off + min(hash_rows, nk - c*L)) — rows past L + halo
            # hold invalid-code padding and contribute nothing
            expected = sum(
                max(0, min(hash_rows, nk - c * L)) for c in range(_CHUNKS)
            )
            # i32 sum is exact: val.size < 2^31 (the callers' i32 guard)
            ok = jnp.sum(val, dtype=_I32) == expected

        flags = None
        if multi:
            # window-valid = all w k-mers valid (cumsum + two shifts);
            # record-first = false->true edge of window-valid
            rows_out = (nb_raw - 1) * w
            vcum = jnp.cumsum(
                jax.lax.slice_in_dim(val, 0, rows_out + w), axis=0,
                dtype=_I32,
            )
            upper = jax.lax.slice_in_dim(vcum, w - 1, w - 1 + rows_out)
            lower = jnp.concatenate(
                [jnp.zeros((1, _SUB, _LANE), vcum.dtype), vcum[: rows_out - 1]],
                axis=0,
            )
            win_valid = (upper - lower) == w
            prev_valid = jnp.concatenate(
                [jnp.zeros((1, _SUB, _LANE), bool), win_valid[:-1]], axis=0
            )
            first_w = win_valid & ~prev_valid
            flags = (
                win_valid.astype(_I32) | (first_w.astype(_I32) << 1)
            ).reshape(rows_out, _CHUNKS)

        # FREE reshape: (rows, SUB, LANE) column j = chunk j — the window
        # kernel's column BlockSpec replaces the old 1 GB-class transpose
        gm_lo = h_lo.reshape(code_rows, _CHUNKS)
        gm_hi = h_hi.reshape(code_rows, _CHUNKS)
        scal = jnp.stack([
            jnp.asarray(L, _I32), jnp.asarray(nw, _I32),
            jnp.asarray(off, _I32),
        ])
        oix, olo, ohi, orun = _window_emit_chunked.__wrapped__(
            gm_lo, gm_hi, scal, w, flags=flags, nb=nb_raw,
            interpret=interpret,
        )
        if stop_after == "window":
            # kernel_prof ablation: layout + hash + window/slot kernel,
            # compaction skipped
            return jnp.sum(oix) + jnp.sum(olo) + jnp.sum(ohi) + jnp.sum(orun)
        out_pos, out_lo, out_hi, out_run, count, slots_ok = _compact_slots(
            oix, olo, ohi, orun, cap
        )
        # emitted indices are raw-row based: shift to stream positions
        return out_pos - off, out_lo, out_hi, count, ok, slots_ok, out_run

    # start-indexed hash rows for the (exact full-array) window stage
    h_lo = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
    h_hi = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
    val = jax.lax.slice_in_dim(val, k - 1, k - 1 + hash_rows)
    pad_rows = rows_p - hash_rows

    row_iota = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (hash_rows, _SUB, _LANE), 0)
    )
    chunk_iota = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (hash_rows, _SUB, _LANE), 1) * _LANE
        + jax.lax.broadcasted_iota(_I32, (hash_rows, _SUB, _LANE), 2)
    )
    gpos = chunk_iota * L + row_iota
    oob = gpos >= nk
    in_range = ~oob
    if multi:
        # caller pre-verified every record is N-free, so val==1 is exactly
        # "k-mer lies inside a record" (separator-crossing k-mers are the
        # only invalid ones)
        ok = jnp.asarray(True)
        in_range &= val == 1
    else:
        ok = jnp.all((val == 1) | oob)

    mask = jnp.where(in_range, _U32(0), _U32(0xFFFFFFFF))
    h_lo = h_lo | mask
    h_hi = h_hi | mask

    h_lo = jnp.pad(h_lo, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
    h_hi = jnp.pad(h_hi, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)

    gm_lo = h_lo.transpose(1, 0, 2)  # (SUB groups, rows, LANE)
    gm_hi = h_hi.transpose(1, 0, 2)
    l_arr = jnp.full((1,), L, _I32)
    w_ix = _window_chunked.__wrapped__(gm_lo, gm_hi, l_arr, w, interpret=interpret)
    w_ix = w_ix.transpose(1, 0, 2)  # back to row-major (rows_out, SUB, LANE)
    rows_out = w_ix.shape[0]

    row_io = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (rows_out, _SUB, _LANE), 0)
    )
    chunk_io = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (rows_out, _SUB, _LANE), 1) * _LANE
        + jax.lax.broadcasted_iota(_I32, (rows_out, _SUB, _LANE), 2)
    )
    g_window = chunk_io * L + row_io
    own = (row_io < L) & (g_window < nw)
    first_win = row_io == 0  # chunk seams: host dedupes the duplicate
    if multi:
        # a window is alive iff all w of its k-mers are valid (it fits one
        # record); windows stay inside their lane's rows, so this is a
        # cumsum + two row-shifted slices — no per-element lookups
        val_p = jnp.pad(val, ((0, pad_rows), (0, 0), (0, 0)))
        vcum = jnp.cumsum(val_p, axis=0, dtype=_I32)  # val is int8
        upper = jax.lax.slice_in_dim(vcum, w - 1, w - 1 + rows_out)
        lower = jnp.concatenate(
            [jnp.zeros((1, _SUB, _LANE), vcum.dtype), vcum[: rows_out - 1]],
            axis=0,
        )
        win_valid = (upper - lower) == w
        own &= win_valid
        # each record's first window = false->true edge of win_valid; it
        # force-emits (the preceding masked windows' argmin may alias it
        # and poison the change detection)
        prev_valid = jnp.concatenate(
            [jnp.zeros((1, _SUB, _LANE), bool), win_valid[:-1]], axis=0
        )
        first_win |= win_valid & ~prev_valid
    prev_ix = jnp.concatenate(
        [jnp.full((1, _SUB, _LANE), -1, _I32), w_ix[:-1]], axis=0
    )
    emit = own & (first_win | (w_ix != prev_ix))

    count, (out_pos,) = _compact_emissions(emit, g_window, cap, (w_ix,), mode)
    # winning hash re-gathered by its position (pos = chunk*L + row in the
    # start-indexed hash layout) — the window kernel only emits indices
    h_row = out_pos % L
    h_chunk = out_pos // L
    h_flat = h_row * (_SUB * _LANE) + h_chunk
    out_lo = h_lo.reshape(-1)[h_flat]
    out_hi = h_hi.reshape(-1)[h_flat]
    return out_pos, out_lo, out_hi, count, ok, jnp.asarray(True), None


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "k", "w", "cap", "cap_seg", "multi", "interpret", "mode", "slots"
    ),
)
def _sketch_fused_general(codes_padded, offsets, n: int, k: int, w: int,
                          cap: int, cap_seg: int = 4096,
                          multi: bool = False, interpret: bool = False,
                          mode: str = "bsearch", slots: bool = True):
    """Fused sketch with device-resident valid-k-mer compaction (N-safe).

    Generalises ``_sketch_fused``: after hashing, owned valid k-mers are
    ranked with a cumsum, gathered into a re-chunked stream layout (owned
    copy plus the previous chunk's halo copy) via per-segment inverse maps,
    and the window stage runs on the compacted stream — windows slide over
    valid k-mers exactly like the oracle.  ``cap_seg`` statically bounds the
    owned-run (segment) count; callers derive it from a host-side count of
    invalid-base runs and must verify the returned ``seg_count <= cap_seg``
    (an overflow means the stream layout is incomplete — fall back).
    Returns (pos, lo, hi, count, stream_count, seg_count, slots_ok):
    emissions in stream order with chunk-seam duplicates still present.
    ``slots=True`` uses the v3 in-kernel emission compaction (see
    ``_sketch_fused``); ``slots_ok`` False means slot overflow — retry with
    ``slots=False``.

    With ``multi=True``, ``offsets`` holds each record's start in the flat
    concatenation (records separated by k-1 invalid bases): per-record
    stream boundaries are derived on device and windows crossing a record
    boundary are masked, so one device call sketches a whole multi-record
    assembly with exact per-record semantics.
    """
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)

    sections = -(-(L + halo) // L)
    blocks = [
        codes_padded[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
        for s in range(sections)
    ]
    x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
    x8 = jnp.pad(x8, ((0, code_rows - L - halo), (0, 0)), constant_values=CODE_INVALID)
    x8 = x8.reshape(code_rows, _SUB, _LANE)
    x = x8  # int8 straight into the kernel (widened per-tile in VMEM)
    x_lag = jnp.pad(
        x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)), constant_values=CODE_INVALID
    )
    h_lo, h_hi, val = _hash_chunked.__wrapped__(x, x_lag, k, interpret=interpret)

    # owned valid k-mers (halo copies excluded) ranked in genomic order
    own_rows = L
    h_lo = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + own_rows)
    h_hi = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + own_rows)
    val = jax.lax.slice_in_dim(val, k - 1, k - 1 + own_rows)
    row_iota = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (own_rows, _SUB, _LANE), 0)
    )
    chunk_iota = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (own_rows, _SUB, _LANE), 1) * _LANE
        + jax.lax.broadcasted_iota(_I32, (own_rows, _SUB, _LANE), 2)
    )
    gpos = chunk_iota * L + row_iota
    owned = (val == 1) & (gpos < nk)

    within = jnp.cumsum(owned.astype(_I32), axis=0)
    per_lane = within[-1]  # (SUB, LANE), lane order == chunk order
    offs = jnp.concatenate(
        [jnp.zeros(1, _I32), jnp.cumsum(per_lane.reshape(-1))[:-1]]
    ).reshape(_SUB, _LANE)
    rank = offs[None] + within - 1  # global stream rank where owned
    stream_count = jnp.sum(owned.astype(_I32))

    if multi:
        # stream rank of each record's first k-mer = #owned before its
        # offset — a handful of gathers into the per-lane cumsum, not a
        # 100M-element searchsorted
        nl_ = _SUB * _LANE
        within_f = within.reshape(own_rows, nl_)
        offs_f = offs.reshape(-1)
        p = jnp.minimum(offsets.astype(_I32), _I32(max(nk - 1, 0)))
        pc = p // L
        pr = p % L
        before = offs_f[pc] + jnp.where(
            pr > 0, within_f[jnp.maximum(pr - 1, 0), pc], 0
        )
        bounds = jnp.where(offsets >= nk, stream_count, before)

    # re-chunk the compacted stream WITHOUT full-size scatters.  A "segment"
    # is a maximal run of owned k-mers within one chunk's rows: inside it,
    # stream ranks and source rows advance in lockstep, so the inverse map
    # rank -> (source row, source chunk) is (s + d, c) with (d, c) constant
    # per segment.  Segments are few (<= #invalid-runs + #chunks + 1, host-
    # counted into the static ``cap_seg``): compact their descriptors, paint
    # (d, c) over rank space with two tiny diff-scatters + carried cumsums,
    # then ONE gather per hash word builds the stream layout.  This replaces
    # the two owned-size scatters of the first design — measured ~2.4 s at
    # 2^27 on a v5e (scatter = 80 ms fixed + ~4 ns/elem) vs ~1 ms/1M-index
    # gathers.
    L2 = L  # static upper bound on per-chunk stream span
    nb2 = -(-(L2 + w - 1) // w) + 1
    rows_p2 = nb2 * w
    own_sz = L2 * _CHUNKS
    if L2 < w - 1:  # a window would span >2 chunks' streams
        raise ValueError("fused-general layout needs L >= w - 1 rows/chunk")
    hw = rows_p2 - L2  # halo rows per chunk (w - 1 rounded up to blocks)
    take = min(hw, L2)  # rows past 2*L2 are never read by an owned window

    nl = _SUB * _LANE
    prev_owned = jnp.concatenate(
        [jnp.zeros((1, _SUB, _LANE), bool), owned[:-1]], axis=0
    )
    seg_start = owned & ~prev_owned  # row resets split runs at chunk seams
    seg_count, (seg_rank, seg_d, seg_c) = _compact_emissions(
        seg_start, rank, cap_seg, (rank, row_iota - rank, chunk_iota), mode
    )
    live_seg = (
        jax.lax.optimization_barrier(
            jax.lax.broadcasted_iota(_I32, (cap_seg, 1), 0)
        )[:, 0]
        < seg_count
    )
    # rank s lives at dest slot [s % L2, s // L2] of the (L2, CHUNKS)
    # layout; s-order there = per-column cumsum + carried column bases.
    # All painted sections (d diffs, c diffs, multi record-start flags)
    # ride ONE scatter over a concatenated index space — an XLA scatter
    # costs ~80 ms FIXED on a v5e regardless of update count, so op count,
    # not payload, is what matters.
    nsec = 3 if multi else 2
    # clamp: nsec*own_sz can pass 2^31 for ~1 Gbp N-containing records; any
    # index >= nsec*own_sz is dropped by mode="drop" either way
    oob = _I32(min(nsec * own_sz, 2**31 - 1))  # dropped by mode="drop"
    dest = (seg_rank % L2) * _CHUNKS + seg_rank // L2

    def _diff(vals):
        prev = jnp.concatenate([jnp.zeros(1, _I32), vals[:-1]])
        return vals - prev

    idxs = [
        jnp.where(live_seg, dest, oob),
        jnp.where(live_seg, own_sz + dest, oob),
    ]
    upds = [_diff(seg_d), _diff(seg_c)]
    if multi:
        bc = bounds // L2
        br = bounds % L2
        idxs.append(
            jnp.where(
                bounds < stream_count, 2 * own_sz + br * _CHUNKS + bc, oob
            )
        )
        upds.append(jnp.ones_like(bounds, _I32))
    painted = jnp.zeros(nsec * own_sz, _I32).at[jnp.concatenate(idxs)].set(
        jnp.concatenate(upds), mode="drop"
    )

    def _colcum(a2d):
        cs = jnp.cumsum(a2d, axis=0)
        base = jnp.concatenate(
            [jnp.zeros(1, _I32), jnp.cumsum(cs[-1])[:-1]]
        )
        return cs + base[None, :]

    d_arr = _colcum(painted[:own_sz].reshape(L2, _CHUNKS))  # src_row(s) - s
    c_arr = _colcum(
        painted[own_sz : 2 * own_sz].reshape(L2, _CHUNKS)
    )  # source chunk of rank s
    r_io2 = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (L2, _CHUNKS), 0)
    )
    c_io2 = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (L2, _CHUNKS), 1)
    )
    s_arr = c_io2 * L2 + r_io2
    live_s = s_arr < stream_count
    src_flat = (s_arr + d_arr) * nl + c_arr  # dead slots masked below

    def _stream(h):
        own = jnp.where(live_s, h.reshape(-1)[src_flat], _MAXU)
        halo = jnp.concatenate(
            [own[:take, 1:], jnp.full((take, 1), _MAXU, _U32)], axis=1
        )
        if hw > take:
            halo = jnp.concatenate(
                [halo, jnp.full((hw - take, _CHUNKS), _MAXU, _U32)], axis=0
            )
        return jnp.concatenate([own, halo], axis=0)  # (rows_p2, CHUNKS)

    s_lo = _stream(h_lo)
    s_hi = _stream(h_hi)

    if multi:
        # record-start flags in the stream layout (painted by the combined
        # scatter above + the same halo shift), so window/record masking
        # below is row arithmetic
        bb = painted[2 * own_sz :].reshape(L2, _CHUNKS)
        bhalo = jnp.concatenate(
            [bb[:take, 1:], jnp.zeros((take, 1), _I32)], axis=1
        )
        if hw > take:
            bhalo = jnp.concatenate(
                [bhalo, jnp.zeros((hw - take, _CHUNKS), _I32)], axis=0
            )
        bflag = jnp.concatenate([bb, bhalo], axis=0)
        bcum = jnp.cumsum(bflag, axis=0)

    if slots and _pick_tr(w) > 0:
        flags = None
        rows_out2 = rows_p2 - w
        if multi:
            upper_b = jax.lax.slice_in_dim(bcum, w - 1, w - 1 + rows_out2)
            base_b = jax.lax.slice_in_dim(bcum, 0, rows_out2)
            wvalid = (upper_b - base_b) == 0
            wfirst = jax.lax.slice_in_dim(bflag, 0, rows_out2) == 1
            flags = wvalid.astype(_I32) | (wfirst.astype(_I32) << 1)
        scal = jnp.stack([
            jnp.asarray(L2, _I32), (stream_count - w + 1).astype(_I32),
            jnp.asarray(0, _I32),  # stream layout is already start-indexed
        ])
        oix, olo, ohi, orun = _window_emit_chunked.__wrapped__(
            s_lo, s_hi, scal, w, flags=flags, runs=False,
            interpret=interpret,
        )
        out_rank, out_lo, out_hi, _run1, count, slots_ok = _compact_slots(
            oix, olo, ohi, orun, cap
        )
        s_row = out_rank % L2
        s_chunk = out_rank // L2
        j = s_row * _CHUNKS + s_chunk
        out_pos = c_arr.reshape(-1)[j] * L + out_rank + d_arr.reshape(-1)[j]
        return (
            out_pos, out_lo, out_hi, count, stream_count, seg_count, slots_ok
        )

    w_ix = _window_chunked.__wrapped__(
        s_lo.reshape(rows_p2, _SUB, _LANE).transpose(1, 0, 2),
        s_hi.reshape(rows_p2, _SUB, _LANE).transpose(1, 0, 2),
        jnp.full((1,), L2, _I32),
        w,
        interpret=interpret,
    )
    w_ix = w_ix.transpose(1, 0, 2)
    rows_out = w_ix.shape[0]

    row_io = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (rows_out, _SUB, _LANE), 0)
    )
    chunk_io = jax.lax.optimization_barrier(
        jax.lax.broadcasted_iota(_I32, (rows_out, _SUB, _LANE), 1) * _LANE
        + jax.lax.broadcasted_iota(_I32, (rows_out, _SUB, _LANE), 2)
    )
    g_window = chunk_io * L2 + row_io
    own_win = (row_io < L2) & (g_window < (stream_count - w + 1))
    first_win = row_io == 0  # chunk seams: host dedupes the duplicate
    if multi:
        # window [s, s+w) must lie inside one record's stream segment —
        # i.e. no record-start flag in ranks (s, s+w): two row-shifted
        # slices of the boundary cumsum
        upper_b = jax.lax.slice_in_dim(bcum, w - 1, w - 1 + rows_out)
        base_b = jax.lax.slice_in_dim(bcum, 0, rows_out)
        own_win &= ((upper_b - base_b) == 0).reshape(rows_out, _SUB, _LANE)
        # each record's first real window always emits (the preceding
        # stream windows are masked cross-record ones whose argmin may
        # alias it and poison the change-detection chain)
        first_win |= (
            jax.lax.slice_in_dim(bflag, 0, rows_out) == 1
        ).reshape(rows_out, _SUB, _LANE)
    prev_ix = jnp.concatenate(
        [jnp.full((1, _SUB, _LANE), -1, _I32), w_ix[:-1]], axis=0
    )
    emit = own_win & (first_win | (w_ix != prev_ix))

    count, (out_rank,) = _compact_emissions(emit, g_window, cap, (w_ix,), mode)
    # winning hash re-gathered from the stream layout at the emitted rank
    s_row = out_rank % L2
    s_chunk = out_rank // L2
    s_flat = s_row * nl + s_chunk
    out_lo = s_lo.reshape(-1)[s_flat]
    out_hi = s_hi.reshape(-1)[s_flat]
    # decode stream rank -> genomic position via the painted (d, c) maps:
    # gpos = c*L + src_row = c*L + rank + d (two cap-sized gathers replacing
    # a second full binary-search inversion of the owned-flag cumsum)
    j = s_row * _CHUNKS + s_chunk
    out_pos = c_arr.reshape(-1)[j] * L + out_rank + d_arr.reshape(-1)[j]
    return (
        out_pos, out_lo, out_hi, count, stream_count, seg_count,
        jnp.asarray(True),
    )


def _seg_cap(flat: np.ndarray) -> int:
    """Static segment bound for the general path's re-chunk.

    Owned-run (segment) count is at most #invalid-base-runs + #chunks + 1
    (each invalid run kills one contiguous k-mer block; chunk seams split
    runs).  Bucketed to powers of two so run-count jitter between inputs
    doesn't force recompiles of the jitted pipeline.
    """
    inv = np.asarray(flat) >= CODE_INVALID
    runs = 0
    if inv.size:
        runs = int(inv[0]) + int(np.count_nonzero(inv[1:] & ~inv[:-1]))
    need = runs + _CHUNKS + 64
    cap = 4096
    while cap < need:
        cap *= 2
    return cap


def _host_sketch(codes: np.ndarray, k: int, w: int) -> Sketch:
    """Fast host path for records below the device threshold."""
    from ntjoin_tpu.io.native import available, sketch_codes_native

    if available():
        return sketch_codes_native(codes, k, w)
    from ntjoin_tpu.ops.nthash_np import sketch_codes

    return sketch_codes(codes, k, w)


def sketch_codes_pallas(
    codes: np.ndarray, k: int, w: int, interpret: bool = False
) -> Sketch:
    """Minimizer sketch via the Pallas kernels (bit-identical to the oracle).

    Device-resident end to end: the N-free fast path skips compaction; the
    general path ranks and re-chunks the valid-k-mer stream on device.
    Small inputs fall back to the host oracle — the chunked layout needs
    enough rows per lane to amortise its (w + k - 2)-row halo.
    """
    empty = Sketch(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    n = int(codes.shape[0])
    if k > n or w > n - k + 1:
        return empty
    if n >= (1 << 31) - (1 << 22):
        # i32 device guard: the margin covers DERIVED lengths too —
        # buflen = CHUNKS*L + code_rows exceeds n by up to ~L + halo +
        # flush padding (~1.1M at default shapes), which overflowed int32
        # buffer literals under the old 2^20 margin (round-5 review)
        return _host_sketch(codes, k, w)
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)  # positions owned per chunk
    if (L < 4 * halo and not interpret) or L < w:
        # L < w would let a window span more than two chunks' streams
        return _host_sketch(codes, k, w)

    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buflen = _CHUNKS * L + code_rows
    runs = _invalid_runs(codes, 0)
    if runs:
        # N-containing record: the batched path segments it into clean
        # pseudo-records + host junction patches (or the device
        # stream-compaction path for pathological N densities)
        return sketch_records_pallas([codes], k, w, interpret)[0]
    # N-free record: 2-bit packed upload (4x less tunnel traffic); only
    # the buffer-tail run is painted on device by _prep_codes (records
    # WITH invalid runs took the batched path above — the _RUN_CAP gate
    # for pathological run counts lives in _start_batch)
    nbytes = -(-buflen // 4)
    pb = np.zeros(nbytes, dtype=np.uint8)
    _pack2_host(codes, pb, 0)
    runs.append((n, 4 * nbytes))  # buffer tail padding
    rcap = 1024
    while rcap < len(runs):
        rcap *= 2
    starts = np.full(rcap, 4 * nbytes, dtype=np.int32)
    ends = np.full(rcap, 4 * nbytes, dtype=np.int32)
    for i, (s, e) in enumerate(runs):
        starts[i] = s
        ends[i] = e
    dev = _prep_codes(pb, starts, ends)  # jit transfers its own args
    # escalating emission caps: tight first (binary-search compaction cost
    # scales with cap), a 4x retry for repeat-dense inputs, host for the
    # truly pathological (emission density near 1/window)
    cmode = _COMPACT_MODE  # read at call time so overrides retrace
    cseg = None
    try:
        for mult in (5, 20):
            cap = max(mult * (nk // w + 1) // 2, 4096) + _CHUNKS
            pos, lo, hi, count, ok, slots_ok, run = _sketch_fused(
                dev, n, k, w, cap, interpret=interpret, mode=cmode
            )
            if bool(ok) and not bool(slots_ok):
                # some (lane, block) emitted past the slot bound: the
                # full-array compaction path is exact for any density
                pos, lo, hi, count, ok, _, run = _sketch_fused(
                    dev, n, k, w, cap, interpret=interpret, mode=cmode,
                    slots=False,
                )
            if not bool(ok):
                # N-containing record: device-side stream compaction path
                run = None  # general-path emissions are uncompressed
                if cseg is None:  # hoisted: codes don't change across retries
                    cseg = _seg_cap(codes)
                pos, lo, hi, count, stream_count, seg_count, g_slots_ok = (
                    _sketch_fused_general(
                        dev, jnp.zeros(1, jnp.int32), n, k, w, cap,
                        cap_seg=cseg, interpret=interpret, mode=cmode,
                    )
                )
                if not bool(g_slots_ok):  # slot overflow: exact fallback
                    pos, lo, hi, count, stream_count, seg_count, _ = (
                        _sketch_fused_general(
                            dev, jnp.zeros(1, jnp.int32), n, k, w, cap,
                            cap_seg=cseg, interpret=interpret, mode=cmode,
                            slots=False,
                        )
                    )
                if int(seg_count) > cseg:  # stream layout incomplete
                    return _host_sketch(codes, k, w)
                if int(stream_count) < w:
                    return empty
            cnt = int(count)
            if cnt <= cap:
                break
        else:  # pathological emission density; the host path is exact
            return _host_sketch(codes, k, w)
    except Exception:
        if interpret:  # interpret mode = tests: never mask real bugs
            raise
        # device failure (HBM pressure, tunnel loss, ...): host is exact
        return _host_sketch(codes, k, w)
    if cnt == 0:
        return empty
    pos = np.asarray(pos[:cnt]).astype(np.int64)
    lo_np = np.asarray(lo[:cnt])
    hi_np = np.asarray(hi[:cnt])
    runs_np = None if run is None else np.asarray(run[:cnt])
    pos, lo_np, hi_np = _expand_runs(pos, lo_np, hi_np, runs_np)
    cnt = pos.shape[0]
    keep = np.empty(cnt, dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]  # chunk-seam dedupe
    sel = np.flatnonzero(keep)
    canon = lo_np[sel].astype(np.uint64) | (
        hi_np[sel].astype(np.uint64) << np.uint64(32)
    )
    return Sketch(positions=pos[sel], hashes=derive_hash(canon, k))




# -- segmented sketch of N-containing records --------------------------------
#
# The minimizer sketch equals the set of DISTINCT window argmins (argmin
# positions are non-decreasing as the window slides, so the emission rule
# "first window or argmin moved" emits each distinct argmin exactly once,
# in ascending position order).  For a record with interior N runs the
# windows split into (a) windows fully inside one maximal clean segment —
# sketched on device via the fast multi path with segments as
# pseudo-records — and (b) windows spanning segment junctions (at most
# ~2(w-1) per junction) — computed on host from the junction
# neighbourhoods' hashes.  The union, merged by position, is the exact
# sketch.  This replaces the device stream-compaction path for realistic
# N densities (the old general path remains for pathological inputs where
# the junction work would rival the whole record).


def _segments_of(n: int, runs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Maximal valid-base intervals = complement of the invalid runs."""
    segs = []
    prev = 0
    for s, e in runs:
        if s > prev:
            segs.append((prev, s))
        prev = e
    if prev < n:
        segs.append((prev, n))
    return segs


def _patch_plan(n: int, runs: list[tuple[int, int]], k: int, w: int):
    """(segments, long_flags, patch window-start intervals, patch_work).

    Stream rank space = valid k-mers in order; a window is device-covered
    iff it lies fully inside one long (>= w+k-1 bases) segment; the patch
    intervals are the complement within [0, N_s - w].
    """
    segs = _segments_of(n, runs)
    nks = [max(0, (e - s) - k + 1) for s, e in segs]
    offs = np.concatenate([[0], np.cumsum(nks)]).astype(np.int64)
    n_stream = int(offs[-1])
    long_flags = [(e - s) >= (w + k - 1) for s, e in segs]
    if n_stream < w:
        return segs, nks, offs, [], 0
    inside = [
        (int(offs[i]), int(offs[i]) + nks[i] - w)
        for i in range(len(segs))
        if long_flags[i]
    ]
    patch_ivs = []
    cur = 0
    last = n_stream - w
    for a, b in inside:  # disjoint, ascending
        if a > cur:
            patch_ivs.append((cur, a - 1))
        cur = max(cur, b + 1)
    if cur <= last:
        patch_ivs.append((cur, last))
    work = sum(b - a + w for a, b in patch_ivs)
    return segs, nks, offs, patch_ivs, work


def _stream_slice(codes, k, segs, nks, offs, lo: int, hi: int):
    """Canonical hashes + genomic positions of stream ranks [lo, hi]."""
    hs, ps = [], []
    for i, (s, e) in enumerate(segs):
        if nks[i] == 0:
            continue
        a = max(lo, int(offs[i]))
        b = min(hi, int(offs[i]) + nks[i] - 1)
        if a > b:
            continue
        la = a - int(offs[i])
        sl = np.asarray(codes[s + la : s + (b - int(offs[i])) + k])
        canon, _ = canonical_hashes(sl, k)
        hs.append(canon)
        ps.append(np.arange(s + la, s + la + canon.shape[0], dtype=np.int64))
    if not hs:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return np.concatenate(hs), np.concatenate(ps)


def _patch_emissions(codes, k: int, w: int, segs, nks, offs, patch_ivs):
    """Distinct argmins (positions, canonical hashes) of the patch windows."""
    from ntjoin_tpu.ops.nthash_np import _window_lexmin

    out_pos, out_canon = [], []
    for a, b in patch_ivs:
        h, pos = _stream_slice(codes, k, segs, nks, offs, a, b + w - 1)
        arg = np.unique(_window_lexmin(h, w))
        out_pos.append(pos[arg])
        out_canon.append(h[arg])
    if not out_pos:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    return np.concatenate(out_pos), np.concatenate(out_canon)


def _batch_i32_safe() -> int:
    """Batch-size ceiling, the tightest of three limits: (a) device
    positions are i32 (2^31 flat bases); (b) the fused pipeline keeps
    ~50 B of intermediates per base live, so one batch must fit HBM
    (v5e: 16 GB -> ~200 Mbp per call); (c) the upload is the bottleneck
    over the relay and batches pipeline (all dispatches precede any
    sync), so mid-size batches hide compute + fetch inside the next
    batch's upload — 64 MB measured best on a 134 Mbp assembly (1.00 s
    vs 1.28 s single-batch; 16-32 MB drown in per-batch fixed costs)."""
    return min(
        (1 << 31) - (1 << 22),  # margin covers derived buffer slack too
        int(os.environ.get("NTJOIN_TPU_BATCH_BASES", 64 * 2**20)),
    )


def _start_batch(batch: list[np.ndarray], k: int, w: int, use_fast: bool,
                 interpret: bool):
    """Upload one record batch (2-bit packed) and dispatch the fused sketch.

    Everything here is asynchronous — device_put and the jitted call queue
    on the device stream, so the NEXT batch's host packing and upload
    overlap this batch's compute.  Returns an opaque state consumed by
    ``_resolve_batch``/``_post_batch``; ``None`` means the batch must take
    the host path.
    """
    import time

    t0 = time.monotonic()
    sep = k - 1
    halo = w + k - 2
    n_rec = len(batch)

    # layout plan: record starts aligned to 4 bases (so each record packs
    # byte-aligned), separator runs of >= k-1 invalid bases between records
    offsets = np.zeros(n_rec, dtype=np.int64)
    run_list: list[tuple[int, int]] = []
    cursor = 0
    for r, c in enumerate(batch):
        offsets[r] = cursor
        end = cursor + int(c.shape[0])
        if not use_fast:
            run_list.extend(_invalid_runs(c, cursor))
        cursor = -(-(end + sep) // 4) * 4
        run_list.append((end, cursor))
    total = cursor
    nk = max(total - k + 1, 0)
    L = -(-max(nk, 1) // _CHUNKS)
    if (L < 4 * halo and not interpret) or L < w or len(run_list) > _RUN_CAP:
        return None
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buflen = _CHUNKS * L + code_rows

    nbytes = -(-buflen // 4)
    pb = np.zeros(nbytes, dtype=np.uint8)
    for r, c in enumerate(batch):
        _pack2_host(c, pb, int(offsets[r]) // 4)
    run_list.append((total, 4 * nbytes))  # buffer tail padding
    rcap = 1024
    while rcap < len(run_list):
        rcap *= 2
    starts = np.full(rcap, 4 * nbytes, dtype=np.int32)
    ends = np.full(rcap, 4 * nbytes, dtype=np.int32)
    for i, (s, e) in enumerate(run_list):
        starts[i] = s
        ends[i] = e

    r_bucket = 8
    while r_bucket < n_rec:
        r_bucket *= 2
    offsets_p = np.full(r_bucket, total, dtype=np.int32)
    offsets_p[:n_rec] = offsets

    cmode = _COMPACT_MODE
    cseg = None
    if not use_fast:
        need = len(run_list) + _CHUNKS + 64
        cseg = 4096
        while cseg < need:
            cseg *= 2
    _stage("pack", t0)
    t0 = time.monotonic()
    try:
        # numpy args go straight into the jitted calls: the jit performs
        # the host->device transfers itself, so each batch costs exactly
        # two python dispatches (prep + fused) — every extra eager
        # device_put used to add a tunnel round-trip per call
        dev = _prep_codes(pb, starts, ends)
        offs_dev = None if use_fast else jnp.asarray(offsets_p)
        cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS + 2 * r_bucket
        if use_fast:
            out = _sketch_fused(
                dev, total, k, w, cap, multi=True, interpret=interpret,
                mode=cmode,
            )
        else:
            out = _sketch_fused_general(
                dev, offs_dev, total, k, w, cap, cap_seg=cseg,
                multi=True, interpret=interpret, mode=cmode,
            )
    except Exception:
        if interpret:  # interpret mode = tests: never mask real bugs
            raise
        return None
    _stage("dispatch", t0)
    return {
        "out": out, "dev": dev, "offs_dev": offs_dev, "offsets": offsets,
        "total": total, "nk": nk, "cap": cap, "cseg": cseg,
        "r_bucket": r_bucket, "cmode": cmode, "use_fast": use_fast,
    }


def _batch_meta_one(st) -> np.ndarray | None:
    """One stacked fetch of a dispatched batch's sync scalars:
    (count, ok-flag, seg_count, max run count).

    Separate ``bool(flag)`` / ``int(count)`` fetches would each pay a
    tunnel round-trip; one 4-wide stack syncs the batch in one.  The max
    run count lets ``_resolve_batch`` skip fetching the run column
    entirely when no equal-hash run compressed (the common case — 25%
    less result download).
    """
    import time

    if st is None:
        return None
    t0 = time.monotonic()
    o = st["out"]
    if st["use_fast"]:
        count, flag = o[3], o[5]
        seg = jnp.zeros((), _I32)
        # run is None when the fused sketch took its exact non-slot path
        # (w with no viable scan tile, _pick_tr(w)==0): emissions are
        # uncompressed, so the max run count is trivially <= 1
        runmax = (
            jnp.max(o[6] & _I32(0xFFFF)) if o[6] is not None
            else jnp.zeros((), _I32)
        )
    else:
        count, seg, flag = o[3], o[5], o[6]
        runmax = jnp.zeros((), _I32)
    meta = np.asarray(
        jnp.stack([
            count.astype(_I32), flag.astype(_I32), seg.astype(_I32), runmax,
        ])
    )
    _stage("sync", t0)
    return meta


def _resolve_batch(st, batch: list[np.ndarray], k: int, w: int,
                   use_fast: bool, interpret: bool, meta):
    """Run the (rare) retries for one dispatched batch and DISPATCH its
    cnt-sliced result stack (asynchronous — the blocking fetch happens in
    ``_post_batch``, after every batch's stack is on the stream).

    Returns ("host", None) for host fallback, ("empty", None), or
    ("dev", state) with the stacked device array.
    """
    import time

    if st is None or meta is None:
        return ("host", None)
    t0 = time.monotonic()
    dev, offs_dev = st["dev"], st["offs_dev"]
    total, nk, cseg = st["total"], st["nk"], st["cseg"]
    r_bucket, cmode = st["r_bucket"], st["cmode"]
    out = st["out"]
    cap = st["cap"]
    cnt, flag, seg = int(meta[0]), int(meta[1]), int(meta[2])
    run_needed = int(meta[3]) > 1  # any compressed run to expand?
    try:
        for attempt in range(2):
            if use_fast:
                pos, lo, hi, count, ok, slots_ok, run = out
                if not run_needed:
                    run = None  # all run words are count<=1: skip the fetch
                if not flag:  # slot overflow: exact fallback
                    pos, lo, hi, count, ok, _, run = _sketch_fused(
                        dev, total, k, w, cap, multi=True,
                        interpret=interpret, mode=cmode, slots=False,
                    )
                    cnt = int(count)
            else:
                run = None  # general-path emissions are uncompressed
                pos, lo, hi, count, _, seg_count, g_slots_ok = out
                if not flag:  # slot overflow: exact fallback
                    pos, lo, hi, count, _, seg_count, _ = (
                        _sketch_fused_general(
                            dev, offs_dev, total, k, w, cap, cap_seg=cseg,
                            multi=True, interpret=interpret, mode=cmode,
                            slots=False,
                        )
                    )
                    cnt, seg = int(count), int(seg_count)
                if seg > cseg:  # stream layout incomplete
                    return ("host", None)
            if cnt <= cap:
                break
            # cap overflow: escalate 4x and re-run (device buffer reused)
            cap = max(20 * (nk // w + 1) // 2, 4096) + _CHUNKS + 2 * r_bucket
            flag = 1
            run_needed = True  # the truncated run stats can't be trusted
            if use_fast:
                out = _sketch_fused(
                    dev, total, k, w, cap, multi=True, interpret=interpret,
                    mode=cmode,
                )
                cnt = int(out[3])
                flag = int(jnp.asarray(out[5]).astype(_I32))
            else:
                out = _sketch_fused_general(
                    dev, offs_dev, total, k, w, cap, cap_seg=cseg,
                    multi=True, interpret=interpret, mode=cmode,
                )
                cnt = int(out[3])
                seg = int(out[5])
                flag = int(jnp.asarray(out[6]).astype(_I32))
        else:  # pathological emission density; the host path is exact
            return ("host", None)
        if cnt == 0:
            return ("empty", None)
        # dispatch the cnt-sliced stacked fetch (one fetch per batch, all
        # batches' stacks queue before any blocks in _post_batch)
        cols = [
            jax.lax.bitcast_convert_type(pos[:cnt], jnp.uint32),
            lo[:cnt],
            hi[:cnt],
        ]
        if run is not None:
            cols.append(jax.lax.bitcast_convert_type(run[:cnt], jnp.uint32))
        stacked = jnp.stack(cols)
    except Exception:
        if interpret:
            raise
        return ("host", None)
    _stage("sync", t0)
    return ("dev", {"stacked": stacked, "has_run": run is not None,
                    "offsets": st["offsets"]})


def _post_batch(res, batch: list[np.ndarray], k: int, w: int) -> list[Sketch]:
    """Fetch one resolved batch's stack and split it into per-record
    sketches (pure numpy; ~the result download over the tunnel)."""
    import time

    empty = Sketch(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    kind, data = res
    if kind == "host":
        return [_host_sketch(c, k, w) for c in batch]
    n_rec = len(batch)
    outs: list[Sketch] = [empty] * n_rec
    if kind == "empty":
        return outs
    t0 = time.monotonic()
    stacked = np.asarray(data["stacked"])
    _stage("fetch", t0)
    t0 = time.monotonic()
    offsets = data["offsets"]
    pos = stacked[0].view(np.int32).astype(np.int64)
    lo_np = stacked[1]
    hi_np = stacked[2]
    runs_np = stacked[3].view(np.int32) if data["has_run"] else None
    pos, lo_np, hi_np = _expand_runs(pos, lo_np, hi_np, runs_np)
    cnt = pos.shape[0]
    keep = np.empty(cnt, dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]  # chunk-seam dedupe
    sel = np.flatnonzero(keep)
    pos = pos[sel]
    canon = lo_np[sel].astype(np.uint64) | (
        hi_np[sel].astype(np.uint64) << np.uint64(32)
    )
    hashes = derive_hash(canon, k)
    # emissions are ascending global positions and records are disjoint
    # ascending ranges, so per-record slices come from one searchsorted
    bounds = np.searchsorted(pos, offsets)
    bounds = np.append(bounds, pos.shape[0])
    for r in range(n_rec):
        a, b = int(bounds[r]), int(bounds[r + 1])
        if b > a:
            outs[r] = Sketch(
                positions=pos[a:b] - int(offsets[r]), hashes=hashes[a:b]
            )
    _stage("post", t0)
    return outs


def sketch_records_pallas(
    codes_list: list[np.ndarray], k: int, w: int, interpret: bool = False
) -> list[Sketch]:
    """Batched device sketch of a whole multi-record assembly.

    Records are concatenated with >= k-1 invalid separator bases (no k-mer
    spans two records) and sketched in ONE device program per batch;
    per-record window semantics are enforced by on-device boundary masking.
    N-free records ride the fast fused path (record boundaries are pure
    masks, no stream compaction); records with interior Ns take the general
    stream-compaction path — the two partitions run as separate batches.

    Transfers ship 2-bit packed (4 bases/byte, ``_prep_codes`` unpacks and
    paints the invalid runs on device), and batches are pipelined: batch
    N+1's host packing and upload overlap batch N's device compute — every
    dispatch in ``_start_batch`` is asynchronous, syncs happen only in
    ``_resolve_batch``/``_post_batch``.  Small batches fall back to the
    per-record host path.
    """
    if not codes_list:
        return []
    import time as _time

    empty = Sketch(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    sep = k - 1
    safe = _batch_i32_safe()
    out_all: list[Sketch] = [empty] * len(codes_list)

    # segmentation plan (light): clean records pass through whole;
    # N-containing records split into long clean segments (device
    # pseudo-records) + host junction patches; pathological N densities
    # (junction work rivalling the record) take the old device
    # stream-compaction path.  Patch HASHING is deferred until every
    # device batch is dispatched — the host CPU work then overlaps the
    # uploads and device compute instead of serializing before them.
    t0 = _time.monotonic()
    entries: list[tuple[int, int, np.ndarray]] = []  # (orig, base, codes)
    patch_plans: dict[int, tuple] = {}
    segmented: set[int] = set()
    fallback_old: list[int] = []
    fallback_host: list[int] = []
    i32_cap = (1 << 31) - (1 << 22)  # i32 positions + derived-buffer slack
    for i, c in enumerate(codes_list):
        c = np.asarray(c)
        if c.shape[0] >= i32_cap:
            # a single record past the int32 device-position cap cannot
            # ride any device batch: host sketcher (exact, unlimited)
            fallback_host.append(i)
            continue
        runs = _invalid_runs(c, 0)
        if not runs:
            entries.append((i, 0, c))
            continue
        n = int(c.shape[0])
        segs, nks, offs, patch_ivs, work = _patch_plan(n, runs, k, w)
        if work > max(_PATCH_WORK_MIN, n // 5):
            fallback_old.append(i)
            continue
        segmented.add(i)
        for (s, e), nk_i in zip(segs, nks):
            if (e - s) >= (w + k - 1):
                entries.append((i, s, c[s:e]))
        patch_plans[i] = (c, segs, nks, offs, patch_ivs)
    _stage("plan", t0)

    # HOST/DEVICE split: the host's native sketcher (ncpu-1 threads) takes
    # a tail share of the entries sized by the rates OBSERVED on earlier
    # calls in this process (first call: all-device, which measures the
    # device-side rate; CLI runs sketch several assemblies and bench runs
    # several trials, so the split converges immediately after).  Over a
    # relay-attached link the device path is transfer-bound (~0.16 Gbp/s
    # here) and the host contributes its full rate in parallel; on a
    # locally attached chip dev_gbps is huge and the share rounds to ~0.
    total_sz = sum(int(e[2].shape[0]) + sep + 3 for e in entries)
    steal_env = os.environ.get("NTJOIN_TPU_HOST_STEAL", "on")
    host_threads = max(1, (os.cpu_count() or 2) - 1)
    host_share = 0.0
    if steal_env == "force":
        host_share = 0.8  # deterministic stolen-merge coverage (tests)
    elif (
        steal_env != "off"
        and _RATE_STATE["dev_gbps"]
        # a relay-attached link's transfer machinery saturates ~1 core; on
        # a 2-core box the "spare" host cycles are an illusion (measured:
        # host share ran at 0.024 Gbp/s and slowed the stream too).  The
        # hybrid only pays when real spare cores exist.
        and (os.cpu_count() or 2) >= 4
    ):
        hg = _RATE_STATE["host_gbps"] or 0.03 * host_threads
        host_share = min(0.45, hg / (hg + _RATE_STATE["dev_gbps"]))
    host_ents: list[tuple[int, int, np.ndarray]] = []
    host_sz = 0
    if host_share > 0.02 and len(entries) > 1:
        budget = host_share * total_sz
        while len(entries) > 1:
            sz = int(entries[-1][2].shape[0]) + sep + 3
            if host_sz + sz > budget * 1.25:
                break
            host_ents.append(entries.pop())
            host_sz += sz
            if host_sz >= budget:
                break
    total_sz -= host_sz

    # batch the remaining (device) entries by size; dispatch every batch
    # (fast AND general) before syncing any — uploads and compute pipeline
    # on the device stream while the host hashes junction patches and
    # sketches its share.  Batches are balanced to ~equal size (instead of
    # greedy-filling to the cap): a tiny tail batch would fall below the
    # device layout minimum and take the host path record by record.
    n_batches = max(1, -(-total_sz // safe))
    target = -(-total_sz // n_batches)
    batches: list[list[tuple[int, int, np.ndarray]]] = []
    cur: list[tuple[int, int, np.ndarray]] = []
    acc = 0
    for ent in entries:
        sz = int(ent[2].shape[0]) + sep + 3
        if cur and (
            acc + sz > safe  # hard cap: i32/HBM bound, never exceeded
            or (acc + sz > target and len(batches) < n_batches - 1)
        ):
            batches.append(cur)
            cur, acc = [], 0
        cur.append(ent)
        acc += sz
    if cur:
        batches.append(cur)
    gb: list[list[int]] = []
    if fallback_old:
        curg: list[int] = []
        acc = 0
        for i in fallback_old:
            sz = int(codes_list[i].shape[0]) + sep + 3
            if curg and acc + sz > safe:
                gb.append(curg)
                curg, acc = [], 0
            curg.append(i)
            acc += sz
        if curg:
            gb.append(curg)

    # dispatch every device batch up front — uploads and compute pipeline
    # back-to-back on the stream — then do the host-side work (junction
    # patches + the host share) while it drains
    t_disp0 = _time.monotonic()
    states = [
        _start_batch([e[2] for e in b], k, w, True, interpret)
        for b in batches
    ] + [
        _start_batch([np.asarray(codes_list[i]) for i in b], k, w, False,
                     interpret)
        for b in gb
    ]
    n_fast = len(batches)

    # host junction patches, overlapped with the in-flight device wave
    t0 = _time.monotonic()
    patches: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for i, (c, segs, nks, offs, patch_ivs) in patch_plans.items():
        patches[i] = _patch_emissions(c, k, w, segs, nks, offs, patch_ivs)
    _stage("patch", t0)

    # the host share, sketched concurrently with the device stream
    stolen: dict[tuple[int, int], Sketch] = {}
    if host_ents:
        t0 = _time.monotonic()
        from ntjoin_tpu.io.native import available, sketch_codes_native

        use_native = available()
        for orig, base, c in host_ents:
            if use_native:
                stolen[(orig, base)] = sketch_codes_native(
                    c, k, w, threads=host_threads
                )
            else:
                stolen[(orig, base)] = _host_sketch(c, k, w)
        host_wall = _time.monotonic() - t0
        if host_wall > 0.05:
            _RATE_STATE["host_gbps"] = host_sz / host_wall / 1e9
        _stage("steal", t0)

    # per-batch interleaved sync -> resolve -> fetch -> post: batch j's
    # result download overlaps batches j+1..'s uploads/compute on the
    # stream (the per-batch scalar sync is one ~5 ms round-trip; a
    # whole-wave stacked sync would stall the first download until the
    # LAST batch finished computing)
    rec_lists = [[e[2] for e in b] for b in batches] + [
        [np.asarray(codes_list[i]) for i in b] for b in gb
    ]
    piece_sketches: dict[int, list[tuple[int, Sketch]]] = {}
    for (orig, base), sk in stolen.items():
        piece_sketches.setdefault(orig, []).append((base, sk))
    for j, (st, rl) in enumerate(zip(states, rec_lists)):
        meta = _batch_meta_one(st)
        res = _resolve_batch(st, rl, k, w, j < n_fast, interpret, meta)
        sketches = _post_batch(res, rl, k, w)
        if j == n_fast - 1 and total_sz > (64 << 20) and not interpret:
            # effective device-path rate (dispatch -> last fast batch
            # resolved+fetched) drives the next call's host/device split
            _RATE_STATE["dev_gbps"] = (
                total_sz / max(_time.monotonic() - t_disp0, 1e-3) / 1e9
            )
        if j < n_fast:
            for (orig, base, _), sk in zip(batches[j], sketches):
                piece_sketches.setdefault(orig, []).append((base, sk))
        else:
            for i, sk in zip(gb[j - n_fast], sketches):
                out_all[i] = sk

    # int32-cap giants: host sketcher, after the device wave completes
    for i in fallback_host:
        out_all[i] = _host_sketch(np.asarray(codes_list[i]), k, w)

    # merge device pieces + junction patches per record
    t0 = _time.monotonic()
    fallback_set = set(fallback_old)
    for i in range(len(codes_list)):
        if i in fallback_set:
            continue
        pieces = piece_sketches.get(i, [])
        if i not in segmented:
            if pieces:
                out_all[i] = pieces[0][1]
            continue
        pos_parts = [base + sk.positions for base, sk in pieces]
        h_parts = [sk.hashes for _, sk in pieces]
        ppos, pcanon = patches[i]
        if ppos.shape[0]:
            pos_parts.append(ppos)
            h_parts.append(derive_hash(pcanon, k))
        if not pos_parts:
            continue
        pos = np.concatenate(pos_parts)
        hsh = np.concatenate(h_parts)
        order = np.argsort(pos, kind="stable")
        pos, hsh = pos[order], hsh[order]
        keep = np.empty(pos.shape[0], bool)
        keep[0] = True
        keep[1:] = pos[1:] != pos[:-1]  # device/patch overlap dedupe
        out_all[i] = Sketch(positions=pos[keep], hashes=hsh[keep])
    _stage("merge", t0)
    return out_all
