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
from ntjoin_tpu.ops.nthash_np import Sketch, derive_hash

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
_I32 = jnp.int32
_MAXU = np.uint32(0xFFFFFFFF)

_SUB = 8  # sublanes per row tile
_LANE = 128
_CHUNKS = _SUB * _LANE  # 1024 lanes = chunks

_ROW_BLOCK = 256  # rows per grid step in the hash kernel (VMEM budget with double buffering)


def _split64(v: int) -> tuple[np.uint32, np.uint32]:
    return np.uint32(v & 0xFFFFFFFF), np.uint32((v >> 32) & 0xFFFFFFFF)


def _tables(k: int):
    """The four 4-entry constant tables the recurrences select from."""
    seed_in = [_split64(SEEDS[c]) for c in range(4)]
    seed_out = [_split64(srol_n(SEEDS[c], k)) for c in range(4)]
    seed_rc_out = [_split64(SEEDS[3 - c]) for c in range(4)]
    seed_rc_in = [_split64(srol_n(SEEDS[3 - c], k - 1)) for c in range(4)]
    return seed_in, seed_out, seed_rc_out, seed_rc_in


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


_UNROLL = 8  # recurrence rows advanced per loop iteration


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
        tile = x_ref[pl.ds(base, _UNROLL)]  # (_UNROLL, SUB, LANE)
        lag = xlag_ref[pl.ds(base, _UNROLL)]
        f = (fwd_lo[0], fwd_hi[0])
        r = (rev_lo[0], rev_hi[0])
        lb = last_bad[0]
        out_lo, out_hi, out_val = [], [], []
        for u in range(_UNROLL):  # static unroll: one dynamic slice per tile
            i = g * rb + base + u
            row = tile[u]
            out_c = lag[u]
            # fwd_i = srol(fwd) ^ srol^k(seed[out]) ^ seed[in]
            f = u64.srol_const(f, 1)
            f = u64.xor(f, _sel(out_c, t_out))
            f = u64.xor(f, _sel(row, t_in))
            # rev_i = srol^{-1}(rev ^ seed[rc(out)]) ^ srol^{k-1}(seed[rc(in)])
            r = u64.xor(r, _sel(out_c, t_rc_out))
            r = u64.srol_const(r, 33 * 31 - 1)
            r = u64.xor(r, _sel(row, t_rc_in))
            lb = jnp.where(row >= CODE_INVALID, i, lb)
            canon = u64.add(f, r)
            out_lo.append(canon[0])
            out_hi.append(canon[1])
            out_val.append(((i - lb) >= k).astype(jnp.int32))
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
    """x: (rows, SUB, LANE) int32 codes -> (lo, hi, valid) same shape.

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
            jax.ShapeDtypeStruct((rows, _SUB, _LANE), _I32),
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


# -- fused device pipeline ---------------------------------------------------


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


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
    jax.jit, static_argnames=("n", "k", "w", "cap", "multi", "interpret", "mode")
)
def _sketch_fused(codes_padded, n: int, k: int, w: int, cap: int,
                  multi: bool = False, interpret: bool = False,
                  mode: str = "bsearch"):
    """Whole sketch on device: layout -> hash -> window -> compacted result.

    Device-resident end to end; the only host transfers are the int8 code
    upload and the cap-bounded compacted outputs.  Exact when every k-mer is
    valid (the returned ``ok`` flag is False otherwise and callers fall back
    to the compacting general/host paths).

    codes_padded: int8[CHUNKS*L + code_rows] with CODE_INVALID padding.
    Returns (pos, lo, hi, count, ok): emissions in global window order with
    chunk-seam duplicates still present (host drops consecutive equal
    positions).

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
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    nw = nk - w + 1

    # chunk layout rows [s*L, (s+1)*L) come from the flat array shifted by
    # s*L (chunk c row i = flat[c*L + i]); stacking shifted reshapes covers
    # halos longer than L.  The transposes run on int8 (1 B/base of HBM
    # traffic); the i32 widening the kernel wants happens after layout.
    sections = -(-(L + halo) // L)
    blocks = [
        codes_padded[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
        for s in range(sections)
    ]
    x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
    x8 = jnp.pad(x8, ((0, code_rows - L - halo), (0, 0)), constant_values=CODE_INVALID)
    x8 = x8.reshape(code_rows, _SUB, _LANE)
    x = x8.astype(_I32)
    x_lag = jnp.pad(
        x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)), constant_values=CODE_INVALID
    ).astype(_I32)

    h_lo, h_hi, val = _hash_chunked.__wrapped__(x, x_lag, k, interpret=interpret)

    # start-indexed hash rows for the window stage
    h_lo = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
    h_hi = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
    val = jax.lax.slice_in_dim(val, k - 1, k - 1 + hash_rows)

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

    pad_rows = rows_p - hash_rows
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
        vcum = jnp.cumsum(val_p, axis=0)
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
    return out_pos, out_lo, out_hi, count, ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "k", "w", "cap", "cap_seg", "multi", "interpret", "mode"
    ),
)
def _sketch_fused_general(codes_padded, offsets, n: int, k: int, w: int,
                          cap: int, cap_seg: int = 4096,
                          multi: bool = False, interpret: bool = False,
                          mode: str = "bsearch"):
    """Fused sketch with device-resident valid-k-mer compaction (N-safe).

    Generalises ``_sketch_fused``: after hashing, owned valid k-mers are
    ranked with a cumsum, gathered into a re-chunked stream layout (owned
    copy plus the previous chunk's halo copy) via per-segment inverse maps,
    and the window stage runs on the compacted stream — windows slide over
    valid k-mers exactly like the oracle.  ``cap_seg`` statically bounds the
    owned-run (segment) count; callers derive it from a host-side count of
    invalid-base runs and must verify the returned ``seg_count <= cap_seg``
    (an overflow means the stream layout is incomplete — fall back).
    Returns (pos, lo, hi, count, stream_count, seg_count): emissions in
    stream order with chunk-seam duplicates still present.

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
    x = x8.astype(_I32)
    x_lag = jnp.pad(
        x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)), constant_values=CODE_INVALID
    ).astype(_I32)
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
        return jnp.concatenate([own, halo], axis=0).reshape(
            rows_p2, _SUB, _LANE
        )

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

    w_ix = _window_chunked.__wrapped__(
        s_lo.transpose(1, 0, 2),
        s_hi.transpose(1, 0, 2),
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
    return out_pos, out_lo, out_hi, count, stream_count, seg_count


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
    if n >= (1 << 31) - (1 << 20):  # i32 device position guard
        return _host_sketch(codes, k, w)
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)  # positions owned per chunk
    if (L < 4 * halo and not interpret) or L < w:
        # L < w would let a window span more than two chunks' streams
        return _host_sketch(codes, k, w)

    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = codes
    dev = jnp.asarray(buf)
    # escalating emission caps: tight first (binary-search compaction cost
    # scales with cap), a 4x retry for repeat-dense inputs, host for the
    # truly pathological (emission density near 1/window)
    cmode = _COMPACT_MODE  # read at call time so overrides retrace
    cseg = None
    try:
        for mult in (5, 20):
            cap = max(mult * (nk // w + 1) // 2, 4096) + _CHUNKS
            pos, lo, hi, count, ok = _sketch_fused(
                dev, n, k, w, cap, interpret=interpret, mode=cmode
            )
            if not bool(ok):
                # N-containing record: device-side stream compaction path
                if cseg is None:  # hoisted: codes don't change across retries
                    cseg = _seg_cap(codes)
                pos, lo, hi, count, stream_count, seg_count = (
                    _sketch_fused_general(
                        dev, jnp.zeros(1, jnp.int32), n, k, w, cap,
                        cap_seg=cseg, interpret=interpret, mode=cmode,
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
    keep = np.empty(cnt, dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]  # chunk-seam dedupe
    sel = np.flatnonzero(keep)
    canon = lo_np[sel].astype(np.uint64) | (
        hi_np[sel].astype(np.uint64) << np.uint64(32)
    )
    return Sketch(positions=pos[sel], hashes=derive_hash(canon, k))




def sketch_records_pallas(
    codes_list: list[np.ndarray], k: int, w: int, interpret: bool = False
) -> list[Sketch]:
    """Batched device sketch of a whole multi-record assembly.

    Records are concatenated with k-1 invalid separator bases (no k-mer
    spans two records) and sketched in ONE device program; per-record
    window semantics are enforced by on-device boundary masking.  N-free
    records ride the fast fused path (record boundaries are pure masks, no
    stream compaction); records with interior Ns take the general
    stream-compaction path — the two partitions run as separate batches.
    Small batches fall back to the per-record host path.
    """
    empty = Sketch(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    sep = k - 1
    total = sum(int(c.shape[0]) + sep for c in codes_list)
    # Batch-size ceiling, the tighter of two limits: (a) device positions
    # are i32 (2^31 flat bases); (b) the fused pipeline keeps ~50 B of
    # intermediates per base live, so one batch must fit HBM (v5e: 16 GB
    # -> ~200 Mbp per call).  Larger assemblies are split into sub-batches
    # — records are independent, batching is efficiency.
    _I32_SAFE = min(
        (1 << 31) - (1 << 20),
        int(os.environ.get("NTJOIN_TPU_BATCH_BASES", 192 * 2**20)),
    )
    if total > _I32_SAFE:
        out: list[Sketch] = []
        batch: list[np.ndarray] = []
        acc = 0
        for c in codes_list:
            sz = int(c.shape[0]) + sep
            if batch and acc + sz > _I32_SAFE:
                out.extend(sketch_records_pallas(batch, k, w, interpret))
                batch, acc = [], 0
            batch.append(c)
            acc += sz
        if batch:
            out.extend(sketch_records_pallas(batch, k, w, interpret))
        return out
    nk = max(total - k + 1, 0)
    halo = w + k - 2
    L = -(-max(nk, 1) // _CHUNKS)
    if (L < 4 * halo and not interpret) or L < w:
        # L < w would let a window span more than two chunks' streams
        return [_host_sketch(c, k, w) for c in codes_list]

    # partition N-free vs N-containing records; route each kind to its path
    clean = [not (np.asarray(c) >= CODE_INVALID).any() for c in codes_list]
    if any(clean) and not all(clean):
        out2: list[Sketch] = [empty] * len(codes_list)
        for want in (True, False):
            idxs = [i for i, cl in enumerate(clean) if cl == want]
            if idxs:
                sub = sketch_records_pallas(
                    [codes_list[i] for i in idxs], k, w, interpret
                )
                for i, s in zip(idxs, sub):
                    out2[i] = s
        return out2
    use_fast = bool(clean[0]) if clean else True

    offsets = np.zeros(len(codes_list), dtype=np.int32)
    flat = np.full(total, CODE_INVALID, dtype=np.int8)
    cursor = 0
    for r, c in enumerate(codes_list):
        offsets[r] = cursor
        flat[cursor : cursor + c.shape[0]] = c
        cursor += c.shape[0] + sep

    # pad the offsets array to a bucket size so R doesn't force recompiles;
    # trailing dummy records start at the flat end (empty stream segments)
    n_rec = len(codes_list)
    r_bucket = 8
    while r_bucket < n_rec:
        r_bucket *= 2
    offsets_p = np.full(r_bucket, total, dtype=np.int32)
    offsets_p[:n_rec] = offsets

    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:total] = flat
    dev = jnp.asarray(buf)
    offs_dev = jnp.asarray(offsets_p)
    cmode = _COMPACT_MODE  # read at call time so overrides retrace
    cseg = _seg_cap(flat) if not use_fast else None  # hoisted out of retries
    try:
        for mult in (5, 20):  # escalating caps (see sketch_codes_pallas)
            cap = max(mult * (nk // w + 1) // 2, 4096) + _CHUNKS + 2 * r_bucket
            if use_fast:
                pos, lo, hi, count, ok = _sketch_fused(
                    dev, total, k, w, cap, multi=True, interpret=interpret,
                    mode=cmode,
                )
            else:
                pos, lo, hi, count, _, seg_count = _sketch_fused_general(
                    dev, offs_dev, total, k, w, cap, cap_seg=cseg,
                    multi=True, interpret=interpret, mode=cmode,
                )
                if int(seg_count) > cseg:  # stream layout incomplete
                    return [_host_sketch(c, k, w) for c in codes_list]
            cnt = int(count)
            if cnt <= cap:
                break
        else:
            return [_host_sketch(c, k, w) for c in codes_list]
    except Exception:
        if interpret:  # interpret mode = tests: never mask real bugs
            raise
        return [_host_sketch(c, k, w) for c in codes_list]
    out: list[Sketch] = [empty] * n_rec
    if cnt == 0:
        return out
    pos = np.asarray(pos[:cnt]).astype(np.int64)
    lo_np = np.asarray(lo[:cnt])
    hi_np = np.asarray(hi[:cnt])
    keep = np.empty(cnt, dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]  # chunk-seam dedupe
    sel = np.flatnonzero(keep)
    pos = pos[sel]
    canon = lo_np[sel].astype(np.uint64) | (
        hi_np[sel].astype(np.uint64) << np.uint64(32)
    )
    hashes = derive_hash(canon, k)
    rec_of = np.searchsorted(offsets.astype(np.int64), pos, side="right") - 1
    for r in range(n_rec):
        m = rec_of == r
        if m.any():
            out[r] = Sketch(
                positions=pos[m] - int(offsets[r]), hashes=hashes[m]
            )
    return out
