"""Multi-chip sharding: sequence-parallel sketching + distributed filters.

The reference is single-node (SURVEY §2.2); this module adds what the
TPU-era framework needs instead of its thread pools:

* a 1-D device mesh over which long sequences are tiled (the framework's
  sequence parallelism: fixed-size base tiles with ``w + k - 2`` halos so
  every window's argmin is computed exactly at tile seams),
* ``shard_map``-based sketching with per-shard emission and host-side seam
  dedupe (the emission rule "argmin position changed vs previous window"
  needs one extra boundary window, folded into the halo),
* the distributed global uniqueness filter: per-shard sorted minimizer
  hashes are all-gathered and every shard derives the identical duplicate
  set — the collective pattern that replaces nothing in the reference (it
  had no distribution) but is required at pod scale.

Exactness note: tiles are split on the *valid-k-mer stream*, not on base
positions — shard d owns stream windows [d*tw, (d+1)*tw) and its base tile
spans exactly the bases of stream ranks [d*tw - 1, (d+1)*tw - 1 + w - 1]
(one extra left window for seam dedupe).  Because windows slide over valid
k-mers (btllib semantics, reference sketch contract at
/root/reference/ntJoin:204-205), a base-split tile could need unbounded
halos across long N runs; a stream-split tile never does, so N-rich real
assemblies shard exactly with no single-program fallback.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ntjoin_tpu.constants import CODE_INVALID
from ntjoin_tpu.ops.nthash_np import Sketch, derive_hash
from ntjoin_tpu.ops.sketch_jax import _sketch_padded


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("shard",))


def _valid_kmer_starts(codes: np.ndarray, k: int) -> np.ndarray:
    """Start positions of k-mers containing no invalid base (the stream)."""
    n = codes.shape[0]
    idx = np.arange(n, dtype=np.int64)
    last_bad = np.maximum.accumulate(np.where(codes >= CODE_INVALID, idx, -1))
    starts = idx[: n - k + 1]
    return np.flatnonzero(last_bad[starts + k - 1] < starts)


def _bucket(n: int) -> int:
    size = 256
    while size < n:
        size *= 2
    return size


def _tile_record(codes: np.ndarray, n_shards: int, k: int, w: int):
    """Split one record into per-shard base tiles along the valid stream.

    Shard d owns stream windows [d*tw, (d+1)*tw) and gets one extra left
    window for seam dedupe; its base tile spans exactly the bases of its
    stream ranks, so interior N runs of any length shard exactly.  Returns
    (tiles, n_reals, base_offsets, own_counts); tiles are padded to a
    power-of-two bucket so XLA compiles one program per bucket.
    """
    vk = _valid_kmer_starts(codes, k)
    ns = vk.size - w + 1  # global stream windows
    tw = -(-max(ns, 0) // n_shards)  # windows per shard
    segs: list[np.ndarray | None] = []
    offsets = np.zeros(n_shards, dtype=np.int64)
    own = np.zeros(n_shards, dtype=np.int32)
    for d in range(n_shards):
        ws = d * tw
        own[d] = max(0, min(tw, ns - ws))
        if own[d] == 0:
            segs.append(None)
            continue
        lead = 1 if d > 0 else 0  # extra left window for dedupe
        lo_rank = ws - lead
        hi_rank = min(vk.size - 1, ws + own[d] - 1 + w - 1)
        base_lo = int(vk[lo_rank])
        base_hi = int(vk[hi_rank]) + k
        segs.append(codes[base_lo:base_hi])
        offsets[d] = base_lo
    tile_len = _bucket(max((s.shape[0] for s in segs if s is not None), default=256))
    tiles = np.full((n_shards, tile_len), CODE_INVALID, dtype=np.int32)
    n_reals = np.zeros(n_shards, dtype=np.int32)
    for d, seg in enumerate(segs):
        if seg is not None:
            tiles[d, : seg.shape[0]] = seg
            n_reals[d] = seg.shape[0]
    return tiles, n_reals, offsets, own


def sharded_sketch_fn(mesh: Mesh, k: int, w: int):
    """Build the jitted sequence-parallel sketch step for a mesh.

    Input arrays are sharded along the mesh axis; each device runs the full
    windowed-argmin pipeline on its haloed tile; outputs stay sharded.
    """
    shard_map = jax.shard_map

    def per_shard(tile_codes, n_real):
        # leading axis of size 1 per shard
        win_pos, h_lo, h_hi, emit = _sketch_padded.__wrapped__(
            tile_codes[0], n_real[0], k, w
        )
        return (
            win_pos[None],
            h_lo[None],
            h_hi[None],
            emit[None],
        )

    smap = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("shard", None), P("shard")),
        out_specs=(P("shard", None), P("shard", None), P("shard", None), P("shard", None)),
        check_vma=False,
    )
    return jax.jit(smap)


def sketch_sharded(
    codes: np.ndarray, k: int, w: int, mesh: Mesh | None = None
) -> Sketch:
    """Exact minimizer sketch of one record, tiled across the mesh."""
    empty = Sketch(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    n = codes.shape[0]
    if k > n or w > n - k + 1:
        return empty
    mesh = mesh or make_mesh()
    n_shards = mesh.devices.size
    halo = w + k - 2
    if n_shards == 1 or n <= 4 * (halo + n_shards):
        from ntjoin_tpu.ops.sketch_jax import sketch_codes_jax

        return sketch_codes_jax(codes, k, w)

    tiles, n_reals, offsets, own = _tile_record(codes, n_shards, k, w)
    if not own.any():  # fewer than w valid k-mers in the whole record
        return empty
    fn = sharded_sketch_fn(mesh, k, w)
    win_pos, h_lo, h_hi, emit = fn(jnp.asarray(tiles), jnp.asarray(n_reals))
    win_pos = np.asarray(win_pos)
    h_lo = np.asarray(h_lo)
    h_hi = np.asarray(h_hi)
    emit = np.asarray(emit)

    del emit  # emission is recomputed host-side against true seam neighbours
    positions, hashes = [], []
    for d in range(n_shards):
        if own[d] == 0:
            continue
        lead = 1 if d > 0 else 0  # the extra left window carried for dedupe
        pos_global = win_pos[d].astype(np.int64) + offsets[d]
        owned = pos_global[lead : lead + own[d]]
        prev = np.empty_like(owned)
        prev[1:] = owned[:-1]
        # global rule: window j emits iff j == 0 or argmin moved vs j-1
        prev[0] = pos_global[lead - 1] if d > 0 else -1
        keep = np.flatnonzero(owned != prev) + lead
        positions.append(pos_global[keep])
        hashes.append(
            h_lo[d][keep].astype(np.uint64)
            | (h_hi[d][keep].astype(np.uint64) << np.uint64(32))
        )
    if not positions:
        return empty
    pos = np.concatenate(positions)
    canon = np.concatenate(hashes)
    return Sketch(positions=pos, hashes=derive_hash(canon, k))


def distributed_unique_count(mesh: Mesh, hash_lo, hash_hi, counts):
    """All-gather per-shard minimizer hashes; every shard derives the same
    global uniqueness verdict.  Returns the global distinct-hash count — the
    collective core of the distributed uniqueness/intersection filters.
    """
    shard_map = jax.shard_map

    def step(h_lo, h_hi, cnt):
        g_lo = jax.lax.all_gather(h_lo, "shard", tiled=True)
        g_hi = jax.lax.all_gather(h_hi, "shard", tiled=True)
        total = jax.lax.psum(cnt, "shard")
        # sort the gathered (hi, lo) pairs and count boundaries
        key = jnp.lexsort((g_lo.ravel(), g_hi.ravel()))
        s_lo = g_lo.ravel()[key]
        s_hi = g_hi.ravel()[key]
        new = jnp.concatenate(
            [
                jnp.ones(1, jnp.int32),
                ((s_lo[1:] != s_lo[:-1]) | (s_hi[1:] != s_hi[:-1])).astype(jnp.int32),
            ]
        )
        return jnp.sum(new)[None], total

    smap = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P("shard")),
        out_specs=(P("shard"), P("shard")),
        check_vma=False,
    )
    return jax.jit(smap)(hash_lo, hash_hi, counts)
