"""Multi-device (virtual 8-CPU mesh) tests for the sharded sketch path."""
import jax
import numpy as np
import pytest

from ntjoin_tpu.ops.nthash_np import sketch_codes
from ntjoin_tpu.parallel.mesh import (
    distributed_unique_count,
    make_mesh,
    sketch_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.mark.parametrize("seed,k,w", [(0, 32, 100), (1, 15, 10), (2, 21, 250)])
def test_sharded_sketch_matches_oracle(mesh8, seed, k, w):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=60_000).astype(np.uint8)
    ref = sketch_codes(codes, k, w)
    got = sketch_sharded(codes, k, w, mesh8)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()


@pytest.mark.parametrize("seed,k,w", [(0, 32, 100), (5, 15, 10)])
def test_sharded_sketch_n_runs(mesh8, seed, k, w):
    # interior N runs much longer than the (w+k-2) halo: windows must slide
    # over the valid-kmer stream across the gaps, exactly like btllib
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=60_000).astype(np.uint8)
    for start in rng.integers(0, 55_000, size=6):
        codes[start : start + int(rng.integers(200, 2_000))] = 4  # N
    ref = sketch_codes(codes, k, w)
    got = sketch_sharded(codes, k, w, mesh8)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()


def test_sharded_sketch_mostly_n(mesh8):
    # degenerate: almost everything invalid, stream barely longer than w
    codes = np.full(50_000, 4, dtype=np.uint8)
    rng = np.random.default_rng(9)
    codes[1000:1200] = rng.integers(0, 4, size=200)
    codes[30_000:30_100] = rng.integers(0, 4, size=100)
    ref = sketch_codes(codes, 15, 10)
    got = sketch_sharded(codes, 15, 10, mesh8)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()


def test_sharded_repeat_seams(mesh8):
    # periodic sequence stresses seam dedupe: identical hashes everywhere
    codes = np.tile(np.array([0, 1, 2, 3], dtype=np.uint8), 10_000)
    ref = sketch_codes(codes, 8, 32)
    got = sketch_sharded(codes, 8, 32, mesh8)
    assert got.positions.tolist() == ref.positions.tolist()


def test_distributed_unique_count(mesh8):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    per = 64
    vals = rng.integers(0, 200, size=(8, per)).astype(np.uint32)
    lo = jnp.asarray(vals)
    hi = jnp.zeros_like(lo)
    counts = jnp.full(8, per, jnp.int32)
    uniq, total = distributed_unique_count(mesh8, lo, hi, counts)
    expect = len(np.unique(vals))
    assert int(np.asarray(uniq)[0]) == expect
    assert (np.asarray(uniq) == expect).all()
    assert int(np.asarray(total)[0]) == 8 * per


def test_sketch_sharded_all_n_record():
    """A record with zero valid k-mers (all-N placeholder scaffold) must
    return an empty sketch, not crash the vectorized tiling (round-5
    review finding)."""
    import numpy as np

    from ntjoin_tpu.parallel.mesh import make_mesh, sketch_sharded

    codes = np.full(200_000, 4, dtype=np.uint8)
    got = sketch_sharded(codes, 32, 1000, make_mesh(8))
    assert got.positions.size == 0 and got.hashes.size == 0
