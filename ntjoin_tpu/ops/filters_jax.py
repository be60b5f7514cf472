"""Device-side minimizer filtering and edge tallying (jittable).

The on-device counterparts of the host filters in ``core/assembly.py`` and
``graph/mingraph.py`` — sorted-hash joins over uint32 lane pairs:

* within-assembly uniqueness (drop every hash occurring more than once;
  semantics of reference ``read_minimizers``, ``ntjoin_utils.py:182-192``),
* cross-assembly intersection (keep hashes present in all assemblies;
  reference ``filter_minimizers``, ``ntjoin_utils.py:152-165``),
* adjacency edge tally (canonical unordered pairs with per-assembly
  support; reference ``build_graph``, ``ntjoin_utils.py:83-141``).

These run under jit on any backend and compose with the mesh collectives in
``parallel/mesh.py`` for the distributed path (per-shard sort -> all-gather
-> identical global verdicts).  The single-host pipeline defaults to the
NumPy implementations; byte-parity is enforced by tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lexsort_pairs(lo, hi):
    return jnp.lexsort((lo, hi))


def unique_mask(lo, hi):
    """keep[i] = hash i occurs exactly once in the array (original order)."""
    n = lo.shape[0]
    order = _lexsort_pairs(lo, hi)
    s_lo, s_hi = lo[order], hi[order]
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), (s_lo[1:] == s_lo[:-1]) & (s_hi[1:] == s_hi[:-1])]
    )
    same_next = jnp.concatenate([same_prev[1:], jnp.zeros(1, bool)])
    uniq_sorted = ~(same_prev | same_next)
    keep = jnp.zeros(n, bool).at[order].set(uniq_sorted)
    return keep


def member_mask(q_lo, q_hi, ref_lo, ref_hi):
    """mask[i] = query hash i present in the reference set.

    Tag-sort formulation (no 64-bit keys): refs sort before queries among
    equal hashes; a running cummax of the last-seen reference index tells
    each query whether an equal reference precedes it.
    """
    nq = q_lo.shape[0]
    nr = ref_lo.shape[0]
    lo = jnp.concatenate([ref_lo, q_lo])
    hi = jnp.concatenate([ref_hi, q_hi])
    tag = jnp.concatenate([jnp.zeros(nr, jnp.int32), jnp.ones(nq, jnp.int32)])
    order = jnp.lexsort((tag, lo, hi))
    s_lo, s_hi, s_tag = lo[order], hi[order], tag[order]
    idx = jnp.arange(nr + nq, dtype=jnp.int32)
    ref_pos = jnp.where(s_tag == 0, idx, -1)
    last_ref = jax.lax.cummax(ref_pos)
    at = jnp.clip(last_ref, 0, nr + nq - 1)
    member_sorted = (
        (s_tag == 1)
        & (last_ref >= 0)
        & (s_lo[at] == s_lo)
        & (s_hi[at] == s_hi)
    )
    member = jnp.zeros(nr + nq, bool).at[order].set(member_sorted)
    return member[nr:]


def edge_tally(node_ids, ctg_ids, asm_ids, weights, num_nodes):
    """Canonical adjacency pairs with summed weights and support bitmasks.

    Inputs are the concatenated per-assembly shared-minimizer streams
    (node id, contig id, assembly index per minimizer, in stream order).
    Returns per consecutive-pair-slot (lo, hi, weight, support) arrays with
    a validity mask (pairs crossing contig/assembly boundaries are dead);
    grouping/dedup happens via sort.

    Weight exactness: the weight sum is an UNORDERED float32 scatter-add,
    which matches the host's sequential float64 ``np.add.reduceat`` only
    when addition cannot round — guaranteed here by requiring integer
    weights with an f32-exact total bound (integer f32 arithmetic below
    2^24 is associative).  Non-integer weights raise; the product device
    path (``ops/device_index.py``) instead tallies integer per-assembly
    counts on device and replays the host float64 reduction exactly.
    """
    w_np = np.asarray(weights, dtype=np.float64)
    if w_np.size and (
        np.any(w_np != np.rint(w_np))
        or np.abs(w_np).max() * max(int(np.shape(node_ids)[0]), 1) >= 2**24
    ):
        raise ValueError(
            "edge_tally's unordered f32 weight sum is only byte-exact for "
            "small integer weights; use the host build_graph or the "
            "device_index exact tally for fractional weights"
        )
    n_asm = np.shape(np.asarray(weights))[0]
    if n_asm > 32:
        raise ValueError(
            f"device edge_tally supports at most 32 assemblies (got {n_asm}):"
            " the support bitmask is a uint32 lane — use the host"
            " graph.mingraph.build_graph path (unlimited) instead"
        )
    u = node_ids[:-1]
    v = node_ids[1:]
    same = (ctg_ids[1:] == ctg_ids[:-1]) & (asm_ids[1:] == asm_ids[:-1])
    # no 64-bit composite keys (TPU path runs without x64): sort the pair
    # lexicographically with a sentinel column pushing dead slots last;
    # assembly id as the tertiary key groups a pair's repeated supports so
    # the bitmask below can OR each assembly's bit exactly once (the
    # reference appends repeated support, ``ntjoin_utils.py:100-108``, so a
    # pair adjacent twice in one assembly is legal input — a plain
    # scatter-add of ``1 << a`` would carry into the next assembly's bit)
    lo = jnp.where(same, jnp.minimum(u, v), num_nodes).astype(jnp.int32)
    hi = jnp.where(same, jnp.maximum(u, v), num_nodes).astype(jnp.int32)
    a_all = asm_ids[:-1]
    order = jnp.lexsort((a_all, hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    a_s = a_all[order]
    alive = lo_s < num_nodes
    new_group = jnp.concatenate(
        [jnp.ones(1, bool), (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
    )
    seg = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # group id per element
    nseg = lo_s.shape[0]
    w = jnp.asarray(weights)[a_s]
    weight = jnp.zeros(nseg, w.dtype).at[seg].add(jnp.where(alive, w, 0.0))
    # support bitmask: each (pair, assembly) contributes its bit once —
    # repeats of the same assembly within a group are adjacent after the
    # sort, so only the first of each assembly run adds its bit
    first_of_asm = new_group | jnp.concatenate(
        [jnp.ones(1, bool), a_s[1:] != a_s[:-1]]
    )
    support = jnp.zeros(nseg, jnp.uint32).at[seg].add(
        jnp.where(
            alive & first_of_asm,
            jnp.uint32(1) << a_s.astype(jnp.uint32),
            jnp.uint32(0),
        )
    )
    # representative pair per group id (all elements of a group share it)
    g_lo = jnp.full(nseg, num_nodes, jnp.int32).at[seg].min(lo_s)
    g_hi = jnp.full(nseg, num_nodes, jnp.int32).at[seg].min(hi_s)
    ngroups = seg[-1] + 1
    valid = (jnp.arange(nseg) < ngroups) & (g_lo < num_nodes)
    return g_lo, g_hi, weight, support, valid
