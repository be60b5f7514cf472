"""JAX device sketch: the minimizer pipeline as one jittable XLA program.

Same closed-form dataflow as the NumPy oracle (``nthash_np.py``) but built
from TPU-friendly primitives only — uint32 lane pairs (no 64-bit vector
ops), ``associative_scan`` prefix-xor, a barrel-shifter variable rotation,
N-compaction via a stable argsort, and a block two-scan windowed argmin with
lexicographic (hash, position) ordering.  Bit-identical to the oracle (and
therefore to btllib's indexlr) by the parity tests in
``tests/test_sketch_jax.py``.

The public entry points pad records into power-of-two length buckets so XLA
compiles one program per bucket, not per record length.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ntjoin_tpu.constants import CODE_INVALID, SEEDS, SROL_PERIOD, srol_n
from ntjoin_tpu.ops import u64
from ntjoin_tpu.ops.nthash_np import Sketch, derive_hash

_U32 = jnp.uint32
_I32 = jnp.int32

# srol^e(seed[c]) tables as uint32 pairs, one row per exponent in the period.
_TAB = np.zeros((SROL_PERIOD, 5), dtype=np.uint64)
for _e in range(SROL_PERIOD):
    for _c in range(4):
        _TAB[_e, _c] = srol_n(SEEDS[_c], _e)
_TAB_LO = (_TAB & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_TAB_HI = (_TAB >> np.uint64(32)).astype(np.uint32)


def _lexmin(a, b):
    """Associative combine: min by (hash, position)."""
    a_h, a_p = a
    b_h, b_p = b
    a_smaller = u64.less(a_h, b_h) | (
        (a_h[0] == b_h[0]) & (a_h[1] == b_h[1]) & (a_p <= b_p)
    )
    return u64.select(a_smaller, a_h, b_h), jnp.where(a_smaller, a_p, b_p)


@partial(jax.jit, static_argnames=("k", "w"))
def _sketch_padded(codes: jax.Array, n_real: jax.Array, k: int, w: int):
    """Windowed-argmin sketch of one padded record.

    codes: int32[n] base codes, padded with CODE_INVALID beyond n_real.
    Returns (win_pos, win_hash_lo, win_hash_hi, emit) over all padded
    windows; entries past the real window count carry emit=False.
    """
    n = codes.shape[0]
    nk = n - k + 1  # padded kmer count
    # all index/exponent vectors are generated on device (iota + unsigned
    # div/mod) — numpy constants here would embed O(n) literals in the HLO
    # and blow up compile time and host->device transfer
    period = _U32(SROL_PERIOD)
    # optimization_barrier: keep XLA from constant-folding the O(n) iota
    # chains at compile time (the HLO evaluator makes that O(n) *compile*)
    idx = jax.lax.optimization_barrier(jax.lax.iota(_U32, n))

    codes = jnp.asarray(codes, _I32)
    rc = jnp.where(codes < 4, 3 - codes, CODE_INVALID)

    tab_lo = jnp.asarray(_TAB_LO)
    tab_hi = jnp.asarray(_TAB_HI)
    exp_r = (idx % period).astype(_I32)
    exp_f = ((period - idx % period) % period).astype(_I32)
    s_f = (tab_lo[exp_f, codes], tab_hi[exp_f, codes])
    s_r = (tab_lo[exp_r, rc], tab_hi[exp_r, rc])

    # inclusive prefix-xor scans (xor acts lane-wise on the pairs)
    p_lo = jax.lax.associative_scan(jnp.bitwise_xor, s_f[0])
    p_hi = jax.lax.associative_scan(jnp.bitwise_xor, s_f[1])
    q_lo = jax.lax.associative_scan(jnp.bitwise_xor, s_r[0])
    q_hi = jax.lax.associative_scan(jnp.bitwise_xor, s_r[1])

    starts = jax.lax.optimization_barrier(jax.lax.iota(_I32, nk))

    def span(acc_lo, acc_hi):
        end_lo, end_hi = acc_lo[starts + (k - 1)], acc_hi[starts + (k - 1)]
        before_lo = jnp.where(starts > 0, acc_lo[starts - 1], 0)
        before_hi = jnp.where(starts > 0, acc_hi[starts - 1], 0)
        return (end_lo ^ before_lo.astype(_U32), end_hi ^ before_hi.astype(_U32))

    starts_u = jax.lax.optimization_barrier(jax.lax.iota(_U32, nk))
    e_fwd = (starts_u + _U32(k - 1)) % period
    e_rev = (period - starts_u % period) % period
    fwd = u64.srol_var(span(p_lo, p_hi), e_fwd)
    rev = u64.srol_var(span(q_lo, q_hi), e_rev)
    canon = u64.add(fwd, rev)

    # validity: no invalid base inside [p, p+k)
    bad = jnp.cumsum((codes >= CODE_INVALID).astype(_I32))
    bad_before = jnp.where(starts > 0, bad[starts - 1], 0)
    valid = (bad[starts + (k - 1)] - bad_before) == 0
    valid &= starts < (n_real - (k - 1))

    # compact valid kmers to the front, preserving order
    order = jnp.argsort(jnp.logical_not(valid), stable=True).astype(_I32)
    count = jnp.sum(valid.astype(_I32))
    vh = (canon[0][order], canon[1][order])
    in_range = jnp.arange(nk, dtype=_I32) < count
    maxu = jnp.asarray(0xFFFFFFFF, _U32)
    vh = u64.select(in_range, vh, (jnp.full(nk, maxu), jnp.full(nk, maxu)))
    vpos = jnp.where(in_range, order, nk)

    # block two-scan windowed argmin over the compacted stream
    nb = -(-nk // w)
    pad = nb * w - nk
    key_lo = jnp.pad(vh[0], (0, pad), constant_values=np.uint32(0xFFFFFFFF)).reshape(nb, w)
    key_hi = jnp.pad(vh[1], (0, pad), constant_values=np.uint32(0xFFFFFFFF)).reshape(nb, w)
    key_ix = jnp.pad(
        jax.lax.optimization_barrier(jax.lax.iota(_I32, nk)), (0, pad),
        constant_values=nk,
    ).reshape(nb, w)

    pre = jax.lax.associative_scan(_lexmin, ((key_lo, key_hi), key_ix), axis=1)
    suf = jax.lax.associative_scan(
        _lexmin, ((key_lo, key_hi), key_ix), axis=1, reverse=True
    )

    nw = nk - w + 1
    i_u = jax.lax.optimization_barrier(jax.lax.iota(_U32, nw))
    w_u = _U32(w)
    b_lo, j_lo = (i_u // w_u).astype(_I32), (i_u % w_u).astype(_I32)
    hi_u = i_u + _U32(w - 1)
    b_hi, j_hi = (hi_u // w_u).astype(_I32), (hi_u % w_u).astype(_I32)

    suf_part = ((suf[0][0][b_lo, j_lo], suf[0][1][b_lo, j_lo]), suf[1][b_lo, j_lo])
    pre_part = ((pre[0][0][b_hi, j_hi], pre[0][1][b_hi, j_hi]), pre[1][b_hi, j_hi])
    win_hash, win_ix = _lexmin(suf_part, pre_part)

    # emission: first window, then whenever the argmin index moves; windows
    # beyond the real count are dead
    prev_ix = jnp.concatenate([jnp.full(1, -1, _I32), win_ix[:-1]])
    alive = jnp.arange(nw, dtype=_I32) < (count - w + 1)
    emit = (win_ix != prev_ix) & alive

    win_pos = vpos[win_ix]  # map compacted index back to genomic position
    return win_pos, win_hash[0], win_hash[1], emit


def _bucket_len(n: int) -> int:
    size = 256
    while size < n:
        size *= 2
    return size


def sketch_codes_jax(codes: np.ndarray, k: int, w: int) -> Sketch:
    """Drop-in replacement for the NumPy-oracle ``sketch_codes``.

    Pads the record into a power-of-two bucket (one XLA compilation per
    bucket size), runs the device kernel, and compacts emissions on host.
    """
    empty = Sketch(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    n = int(codes.shape[0])
    if k > n or w > n - k + 1:
        return empty
    padded = _bucket_len(n)
    buf = np.full(padded, CODE_INVALID, dtype=np.int32)
    buf[:n] = codes
    win_pos, h_lo, h_hi, emit = _sketch_padded(
        jnp.asarray(buf), jnp.asarray(n, _I32), k, w
    )
    emit = np.asarray(emit)
    sel = np.flatnonzero(emit)
    if sel.size == 0:
        return empty
    pos = np.asarray(win_pos)[sel].astype(np.int64)
    canon = np.asarray(h_lo)[sel].astype(np.uint64) | (
        np.asarray(h_hi)[sel].astype(np.uint64) << np.uint64(32)
    )
    return Sketch(positions=pos, hashes=derive_hash(canon, k))
