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

Exactness note: tiles are split on the base-position stream.  When a tile
interior contains non-ACGT runs longer than the halo, windows-over-valid-
kmers can span beyond the halo; ``sketch_sharded`` detects that and falls
back to the exact single-program path.  N-free genomes (and masked repeats
shorter than w+k) shard exactly.
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


def _tile_record(codes: np.ndarray, n_shards: int, k: int, w: int):
    """Split one record into per-shard base tiles with full halos.

    Shard d owns window starts [d*tk, (d+1)*tk) of the kmer stream and gets
    one extra left window for seam dedupe.  Returns (tiles, n_reals,
    kmer_offsets, own_counts) with tiles padded to a common length.
    """
    n = codes.shape[0]
    nk = n - k + 1
    nw = nk - w + 1
    tk = -(-nw // n_shards)  # windows per shard
    halo = w + k - 2
    tile_len = tk + 1 + halo  # +1 base for the extra left window
    tiles = np.full((n_shards, tile_len), CODE_INVALID, dtype=np.int32)
    n_reals = np.zeros(n_shards, dtype=np.int32)
    offsets = np.zeros(n_shards, dtype=np.int64)
    own = np.zeros(n_shards, dtype=np.int32)
    for d in range(n_shards):
        wstart = d * tk
        own[d] = max(0, min(tk, nw - wstart))
        lead = 1 if d > 0 else 0  # extra left window for dedupe
        base_lo = wstart - lead
        base_hi = min(n, wstart + own[d] - 1 + w + k - 1)
        if own[d] > 0:
            seg = codes[base_lo:base_hi]
            tiles[d, : seg.shape[0]] = seg
            n_reals[d] = seg.shape[0]
        offsets[d] = base_lo
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
    # exactness guard: interior invalid runs longer than the halo break
    # tile-local window/valid-kmer equivalence -> use the single program
    if (codes >= CODE_INVALID).any():
        from ntjoin_tpu.ops.sketch_jax import sketch_codes_jax

        return sketch_codes_jax(codes, k, w)

    tiles, n_reals, offsets, own = _tile_record(codes, n_shards, k, w)
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
