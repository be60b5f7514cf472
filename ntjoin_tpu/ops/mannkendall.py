"""Vectorized Mann-Kendall trend test (batch orientation on device).

The ``--mkt`` orientation mode runs the MK original test per contig run
(reference ``ntjoin_assemble.py:37-40`` via pymannkendall).  The host path
(`core/orientation.py`) handles one run at a time; this module evaluates a
whole batch of padded position rows in one fused computation — the shape the
device pipeline feeds when orienting thousands of contig runs at once.

Numerics match ``pymannkendall.original_test``: S statistic, tie-corrected
variance, continuity-corrected z, two-sided p via erf.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mann_kendall_batch(positions: jax.Array, lengths: jax.Array, alpha: float = 0.05):
    """MK original test over a (B, L) batch of padded position rows.

    positions: int32/float (B, L), padded past ``lengths`` (values ignored).
    Returns (trend, h, p, z) where trend is +1 (increasing), -1
    (decreasing) or 0 (no trend), each of shape (B,).
    """
    positions = positions.astype(jnp.float32)
    b, l = positions.shape
    idx = jnp.arange(l)
    valid = idx[None, :] < lengths[:, None]  # (B, L)

    # pair sums blocked over the i axis: O(B * C * L) live memory instead of
    # materialising the full (B, L, L) pair tensor (long runs would blow it
    # quadratically)
    chunk = min(32, l)
    nblk = -(-l // chunk)
    pad = nblk * chunk - l
    pos_p = jnp.pad(positions, ((0, 0), (0, pad)))
    val_p = jnp.pad(valid, ((0, 0), (0, pad)))
    idx_p = jnp.pad(idx, (0, pad), constant_values=l)

    def body(carry, blk):
        s_acc, cnt_acc = carry
        i0 = blk * chunk
        pi = jax.lax.dynamic_slice_in_dim(pos_p, i0, chunk, axis=1)  # (B, C)
        vi = jax.lax.dynamic_slice_in_dim(val_p, i0, chunk, axis=1)
        ii = jax.lax.dynamic_slice_in_dim(idx_p, i0, chunk)
        diff = positions[:, None, :] - pi[:, :, None]  # (B, C, j) = x_j - x_i
        both = vi[:, :, None] & valid[:, None, :]
        after = (idx[None, :] > ii[:, None])[None]  # j > i
        s_acc = s_acc + jnp.sum(jnp.sign(diff) * (both & after), axis=(1, 2))
        cnt_acc = cnt_acc + jnp.sum((diff == 0.0) & both, axis=1)  # per j
        return (s_acc, cnt_acc), None

    (s, counts), _ = jax.lax.scan(
        body,
        (jnp.zeros(b, jnp.float32), jnp.zeros((b, l), jnp.int32)),
        jnp.arange(nblk),
    )
    counts = counts.astype(jnp.float32)  # multiplicity per element
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
