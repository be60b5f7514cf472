"""Parity: Pallas kernels (interpret mode on CPU) vs the NumPy oracle."""
import numpy as np
import pytest

from ntjoin_tpu.ops.nthash_np import sketch_codes
from ntjoin_tpu.ops.sketch_pallas import sketch_codes_pallas


def _assert_same(codes, k, w):
    ref = sketch_codes(codes, k, w)
    got = sketch_codes_pallas(codes, k, w, interpret=True)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()


@pytest.mark.parametrize("seed,k,w", [(0, 15, 10), (1, 32, 25), (2, 21, 40)])
def test_random_parity(seed, k, w):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=60_000).astype(np.uint8)
    _assert_same(codes, k, w)


def test_parity_with_ns():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=60_000).astype(np.uint8)
    for start, length in [(500, 3), (10_000, 200), (30_000, 17), (59_990, 10)]:
        codes[start : start + length] = 4
    _assert_same(codes, 15, 10)


def test_repeat_tiebreaks():
    codes = np.tile(np.array([0, 1, 2, 3], dtype=np.uint8), 12_000)
    _assert_same(codes, 8, 16)


def test_fused_pipeline_parity():
    """The fused device program (bench path) matches the oracle end to end."""
    from ntjoin_tpu.ops.sketch_pallas import _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    for k, w in [(15, 16), (32, 40)]:
        codes = rng.integers(0, 4, size=70_000).astype(np.uint8)
        n = codes.shape[0]
        nk = n - k + 1
        halo = w + k - 2
        L = -(-nk // _CHUNKS)
        code_rows = _ceil_to(L + halo, _ROW_BLOCK)
        buf = np.full(_CHUNKS * L + code_rows, 4, dtype=np.int8)
        buf[:n] = codes
        cap = max(4 * (nk // w + 1), 4096) + _CHUNKS
        pos, lo, hi, count, ok = _sketch_fused(
            jnp.asarray(buf), n, k, w, cap, interpret=True
        )
        assert bool(ok)
        cnt = int(count)
        pos = np.asarray(pos[:cnt]).astype(np.int64)
        keep = np.ones(cnt, bool)
        keep[1:] = pos[1:] != pos[:-1]
        got_pos = pos[np.flatnonzero(keep)]
        ref = sketch_codes(codes, k, w)
        assert got_pos.tolist() == ref.positions.tolist()


def test_batched_records_parity():
    """One device call over many records == per-record oracle sketches."""
    from ntjoin_tpu.ops.sketch_pallas import sketch_records_pallas

    rng = np.random.default_rng(33)
    records = []
    for ln in [5000, 120, 9000, 31, 4000, 2500]:  # incl. sub-k and sub-w recs
        codes = rng.integers(0, 4, size=ln).astype(np.uint8)
        records.append(codes)
    records[0][100:160] = 4  # N run inside one record
    got = sketch_records_pallas(records, 15, 10, interpret=True)
    for codes, sk in zip(records, got):
        ref = sketch_codes(codes, 15, 10)
        assert sk.positions.tolist() == ref.positions.tolist()
        assert sk.hashes.tolist() == ref.hashes.tolist()


def test_batched_dirty_records_general_path():
    """All-N-containing batch large enough to stay on the device general
    path (stream compaction) in interpret mode."""
    from ntjoin_tpu.ops.sketch_pallas import sketch_records_pallas

    rng = np.random.default_rng(44)
    records = []
    for ln in [9000, 7000]:
        codes = rng.integers(0, 4, size=ln).astype(np.uint8)
        codes[ln // 3 : ln // 3 + 120] = 4  # interior N run
        records.append(codes)
    got = sketch_records_pallas(records, 15, 10, interpret=True)
    for codes, sk in zip(records, got):
        ref = sketch_codes(codes, 15, 10)
        assert sk.positions.tolist() == ref.positions.tolist()
        assert sk.hashes.tolist() == ref.hashes.tolist()


def test_batched_clean_records_fast_path():
    """All-clean batch rides the fused fast path with boundary masks."""
    from ntjoin_tpu.ops.sketch_pallas import sketch_records_pallas

    rng = np.random.default_rng(45)
    records = [
        rng.integers(0, 4, size=ln).astype(np.uint8)
        for ln in [8000, 40, 6000, 2000, 9]
    ]
    got = sketch_records_pallas(records, 15, 10, interpret=True)
    for codes, sk in zip(records, got):
        ref = sketch_codes(codes, 15, 10)
        assert sk.positions.tolist() == ref.positions.tolist()
        assert sk.hashes.tolist() == ref.hashes.tolist()
