"""Vectorized Mann-Kendall trend test (batch orientation on device).

The ``--mkt`` orientation mode runs the MK original test per contig run
(reference ``ntjoin_assemble.py:37-40`` via pymannkendall).  This module
evaluates a whole batch of padded position rows in one fused computation —
``core/paths.PathBuilder`` routes every ambiguous run of an ``--mkt`` path
through it (see ``core/orientation.determine_orientations``).

Exactness split: the O(L^2) pairwise part — the S statistic — is computed
on device in *integer* arithmetic (bit-exact; S fits int32 for runs up to
65k elements), while the O(L) tail (tie correction, variance, z, p) runs
on host in float64, reproducing ``pymannkendall.original_test`` numerics
exactly.  ``mann_kendall_batch`` keeps the all-device variant (float32
variance/p) for device-resident pipelines.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# S = sum of +-1 over n(n-1)/2 pairs: |S| < 2^31 needs n <= 65536
MAX_EXACT_LEN = 65536


def mk_s_batch(positions: jax.Array, lengths: jax.Array) -> jax.Array:
    """Exact integer Mann-Kendall S statistic per padded row.

    positions: int (B, L), padded past ``lengths`` (values ignored).
    Returns S of shape (B,) as int32 — exact for L <= MAX_EXACT_LEN.
    Pair sums are blocked over the i axis: O(B * C * L) live memory
    instead of the full (B, L, L) pair tensor.
    """
    pos = positions.astype(jnp.int32)
    b, l = pos.shape
    idx = jnp.arange(l)
    valid = idx[None, :] < lengths[:, None]  # (B, L)

    chunk = min(32, l)
    nblk = -(-l // chunk)
    pad = nblk * chunk - l
    pos_p = jnp.pad(pos, ((0, 0), (0, pad)))
    val_p = jnp.pad(valid, ((0, 0), (0, pad)))
    idx_p = jnp.pad(idx, (0, pad), constant_values=l)

    def body(s_acc, blk):
        i0 = blk * chunk
        pi = jax.lax.dynamic_slice_in_dim(pos_p, i0, chunk, axis=1)  # (B, C)
        vi = jax.lax.dynamic_slice_in_dim(val_p, i0, chunk, axis=1)
        ii = jax.lax.dynamic_slice_in_dim(idx_p, i0, chunk)
        diff = pos[:, None, :] - pi[:, :, None]  # (B, C, j) = x_j - x_i
        both = vi[:, :, None] & valid[:, None, :]
        after = (idx[None, :] > ii[:, None])[None]  # j > i
        s_acc = s_acc + jnp.sum(
            jnp.sign(diff) * (both & after), axis=(1, 2), dtype=jnp.int32
        )
        return s_acc, None

    s, _ = jax.lax.scan(body, jnp.zeros(b, jnp.int32), jnp.arange(nblk))
    return s


def mann_kendall_batch(positions: jax.Array, lengths: jax.Array, alpha: float = 0.05):
    """MK original test over a (B, L) batch of padded position rows.

    All-device variant: S is integer-exact (``mk_s_batch``); tie counts are
    integer; variance/z/p are float32.  Returns (trend, h, p, z) where
    trend is +1 (increasing), -1 (decreasing) or 0 (no trend), each (B,).
    """
    pos = positions.astype(jnp.int32)
    b, l = pos.shape
    idx = jnp.arange(l)
    valid = idx[None, :] < lengths[:, None]

    s = mk_s_batch(pos, lengths).astype(jnp.float32)

    # per-element multiplicity, blocked like the S computation
    chunk = min(32, l)
    nblk = -(-l // chunk)
    pad = nblk * chunk - l
    pos_p = jnp.pad(pos, ((0, 0), (0, pad)))
    val_p = jnp.pad(valid, ((0, 0), (0, pad)))

    def body(cnt_acc, blk):
        i0 = blk * chunk
        pi = jax.lax.dynamic_slice_in_dim(pos_p, i0, chunk, axis=1)
        vi = jax.lax.dynamic_slice_in_dim(val_p, i0, chunk, axis=1)
        diff = pos[:, None, :] - pi[:, :, None]
        both = vi[:, :, None] & valid[:, None, :]
        cnt_acc = cnt_acc + jnp.sum((diff == 0) & both, axis=1)  # per j
        return cnt_acc, None

    counts, _ = jax.lax.scan(
        body, jnp.zeros((b, l), jnp.int32), jnp.arange(nblk)
    )
    counts = counts.astype(jnp.float32)
    # sum over groups of t(t-1)(2t+5) = sum over elements of (t-1)(2t+5)
    tie_term = jnp.sum(
        jnp.where(valid, (counts - 1) * (2 * counts + 5), 0.0), axis=1
    )
    n = lengths.astype(jnp.float32)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    sd = jnp.sqrt(jnp.maximum(var_s, 1e-30))
    z = jnp.where(s > 0, (s - 1) / sd, jnp.where(s < 0, (s + 1) / sd, 0.0))
    p = jax.scipy.special.erfc(jnp.abs(z) / jnp.sqrt(2.0))
    h = (p < alpha) & (z != 0)
    trend = jnp.where(h & (z > 0), 1, jnp.where(h & (z < 0), -1, 0))
    return trend, h, p, z
