"""Parity of the device-side filters vs the host (NumPy) implementations."""
import numpy as np

import jax.numpy as jnp

from ntjoin_tpu.ops.filters_jax import edge_tally, member_mask, unique_mask


def _pairs(vals):
    v = np.asarray(vals, dtype=np.uint64)
    return (
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
    )


def test_unique_mask():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 50, size=300).astype(np.uint64) * (1 << 40) + rng.integers(
        0, 4, size=300
    )
    lo, hi = _pairs(vals)
    keep = np.asarray(unique_mask(lo, hi))
    u, c = np.unique(vals, return_counts=True)
    expect = np.isin(vals, u[c == 1])
    assert (keep == expect).all()


def test_member_mask():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 1 << 60, size=200).astype(np.uint64)
    q = np.concatenate([ref[:50], rng.integers(0, 1 << 60, size=100).astype(np.uint64)])
    q_lo, q_hi = _pairs(q)
    r_lo, r_hi = _pairs(ref)
    got = np.asarray(member_mask(q_lo, q_hi, r_lo, r_hi))
    expect = np.isin(q, ref)
    assert (got == expect).all()


def test_edge_tally_repeated_same_assembly_adjacency():
    """A pair adjacent twice within ONE assembly must set that assembly's
    support bit once, not carry into the next assembly's bit (the reference
    appends repeated support, ``ntjoin_utils.py:100-108``, so the input is
    legal; regression for the ``.add`` carry bug)."""
    # assembly 0 stream: 1-2-1 on one contig -> pair (1,2) adjacent twice;
    # assembly 1 stream: 1-2 once
    node_ids = jnp.asarray(np.array([1, 2, 1, 1, 2], np.int32))
    ctg_ids = jnp.asarray(np.array([0, 0, 0, 0, 0], np.int32))
    asm_ids = jnp.asarray(np.array([0, 0, 0, 1, 1], np.int32))
    g_lo, g_hi, weight, support, valid = edge_tally(
        node_ids, ctg_ids, asm_ids, np.array([2.0, 1.0]), 3
    )
    valid = np.asarray(valid)
    got = {
        (int(l), int(h)): (float(wt), int(s))
        for l, h, wt, s in zip(
            np.asarray(g_lo)[valid], np.asarray(g_hi)[valid],
            np.asarray(weight)[valid], np.asarray(support)[valid],
        )
    }
    # weight counts repeats (2 + 2 + 1); support is the OR of assembly bits
    assert got == {(1, 2): (5.0, 0b11)}


def test_edge_tally_matches_host_graph():
    from ntjoin_tpu.core.assembly import AssemblySketch, SharedIndex
    from ntjoin_tpu.graph.mingraph import build_graph

    rng = np.random.default_rng(2)
    hashes = rng.permutation(np.arange(100, dtype=np.uint64) + 1000)

    def asm(name, wt, order):
        h = hashes[order]
        return AssemblySketch.from_stream(
            name, wt, ["c0", "c1"],
            h,
            np.arange(len(h), dtype=np.int64) * 37,
            (np.arange(len(h)) >= len(h) // 2).astype(np.int32),
        )

    a = asm("a", 2.0, np.arange(100))
    b = asm("b", 1.0, np.concatenate([np.arange(50), 50 + rng.permutation(50)]))
    shared = SharedIndex([a, b])
    host = build_graph(shared)

    ids, ctgs, asms = [], [], []
    for ai, (node_ids, ctg_ids) in enumerate(shared.streams):
        ids.append(node_ids)
        ctgs.append(ctg_ids)
        asms.append(np.full(len(node_ids), ai, dtype=np.int32))
    g_lo, g_hi, weight, support, valid = edge_tally(
        jnp.asarray(np.concatenate(ids)),
        jnp.asarray(np.concatenate(ctgs)),
        jnp.asarray(np.concatenate(asms)),
        np.array([2.0, 1.0]),
        shared.num_nodes,
    )
    valid = np.asarray(valid)
    got = {
        (int(l), int(h)): (float(wt), int(s))
        for l, h, wt, s in zip(
            np.asarray(g_lo)[valid], np.asarray(g_hi)[valid],
            np.asarray(weight)[valid], np.asarray(support)[valid],
        )
    }
    expect = {}
    for i in range(host.src.shape[0]):
        key = tuple(sorted((int(host.src[i]), int(host.dst[i]))))
        expect[key] = (float(host.weight[i]), int(host.support_mask[i]))
    assert got == expect


def test_edge_tally_rejects_fractional_weights():
    """The unordered f32 weight scatter-add is only byte-exact for small
    integer weights (round-5 review): fractional weights must raise."""
    import pytest

    ids = np.array([0, 1, 2], np.int32)
    ctg = np.zeros(3, np.int32)
    asm = np.zeros(3, np.int32)
    with pytest.raises(ValueError, match="byte-exact"):
        edge_tally(ids, ctg, asm, np.array([0.1]), 3)
