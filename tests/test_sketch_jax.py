"""Parity: the JAX device sketch must be bit-identical to the NumPy oracle."""
import numpy as np
import pytest

from ntjoin_tpu.ops.nthash_np import sketch_codes
from ntjoin_tpu.ops.sketch_jax import sketch_codes_jax


def _assert_same(codes, k, w):
    ref = sketch_codes(codes, k, w)
    got = sketch_codes_jax(codes, k, w)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("k,w", [(32, 1000), (32, 500), (15, 10), (21, 64)])
def test_random_parity(seed, k, w):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 6000))
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    _assert_same(codes, k, w)


@pytest.mark.parametrize("seed", [10, 11])
def test_parity_with_ns(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    # sprinkle N runs, including one long run
    for start, length in [(100, 1), (700, 40), (2500, 300), (4990, 10)]:
        codes[start : start + length] = 4
    _assert_same(codes, 15, 10)
    _assert_same(codes, 32, 100)


def test_parity_on_fixture():
    from ntjoin_tpu.io.fasta import read_fasta

    for rec in read_fasta("/root/reference/tests/ref.multiple.fa"):
        _assert_same(rec.codes, 32, 500)


def test_repeats_tiebreak_parity():
    codes = np.tile(np.array([0, 1, 2, 3], dtype=np.uint8), 200)
    _assert_same(codes, 4, 8)
    codes = np.zeros(500, dtype=np.uint8)  # poly-A: every hash identical
    _assert_same(codes, 8, 16)


def test_short_records():
    for n in [1, 31, 32, 100]:
        codes = np.zeros(n, dtype=np.uint8)
        got = sketch_codes_jax(codes, 32, 100)
        ref = sketch_codes(codes, 32, 100)
        assert got.positions.tolist() == ref.positions.tolist()
