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

    # S = sum_{i<j} sign(x_j - x_i), masked to valid pairs
    diff = positions[:, None, :] - positions[:, :, None]  # (B, i, j) = x_j - x_i
    pair = valid[:, None, :] & valid[:, :, None] & (idx[None, :] > idx[:, None])[None]
    s = jnp.sum(jnp.sign(diff) * pair, axis=(1, 2))

    # tie correction: counts of equal values among the valid entries
    eq = (
        (positions[:, None, :] == positions[:, :, None])
        & valid[:, None, :]
        & valid[:, :, None]
    )
    counts = jnp.sum(eq, axis=2).astype(jnp.float32)  # multiplicity per element
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
