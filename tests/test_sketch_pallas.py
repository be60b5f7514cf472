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
    # sized so L = n/_CHUNKS >= w: the wrapper must stay on the kernel
    # path (not the host fallback) under the 2048-chunk default layout
    codes = rng.integers(0, 4, size=160_000).astype(np.uint8)
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
        ref = sketch_codes(codes, k, w)
        for slots in (True, False):  # v3 slot kernel and full-array path
            pos, lo, hi, count, ok, slots_ok, run = _sketch_fused(
                jnp.asarray(buf), n, k, w, cap, interpret=True, slots=slots
            )
            assert bool(ok) and bool(slots_ok)
            cnt = int(count)
            pos_np = np.asarray(pos[:cnt]).astype(np.int64)
            if run is not None:
                from ntjoin_tpu.ops.sketch_pallas import _expand_runs

                pos_np, _, _ = _expand_runs(
                    pos_np, pos_np, pos_np, np.asarray(run[:cnt])
                )
                cnt = pos_np.shape[0]
            keep = np.ones(cnt, bool)
            keep[1:] = pos_np[1:] != pos_np[:-1]
            got_pos = pos_np[np.flatnonzero(keep)]
            assert got_pos.tolist() == ref.positions.tolist(), (k, w, slots)


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


def test_segmented_n_rich_records():
    """N-containing records split into clean segments (device fast path)
    plus host junction patches; union-by-position equals the oracle."""
    from ntjoin_tpu.ops.sketch_pallas import sketch_records_pallas

    rng = np.random.default_rng(46)
    records = []
    for ln in [9000, 12000]:
        codes = rng.integers(0, 4, size=ln).astype(np.uint8)
        # several interior runs incl. short inter-run segments (< w+k-1)
        for start, rl in [(500, 40), (540 + 10, 30), (4000, 200), (ln - 300, 5)]:
            codes[start : start + rl] = 4
        records.append(codes)
    got = sketch_records_pallas(records, 15, 10, interpret=True)
    for codes, sk in zip(records, got):
        ref = sketch_codes(codes, 15, 10)
        assert sk.positions.tolist() == ref.positions.tolist()
        assert sk.hashes.tolist() == ref.hashes.tolist()


def test_pathological_n_density_general_fallback():
    """Alternating N every few bases makes every segment short — the
    junction-work guard routes the record to the device stream-compaction
    (old general) path, still exact."""
    import ntjoin_tpu.ops.sketch_pallas as sp

    rng = np.random.default_rng(47)
    ln = 60_000
    codes = rng.integers(0, 4, size=ln).astype(np.uint8)
    codes[::25] = 4  # a run every 25 bases: all segments < w+k-1 for w=16
    old = sp._PATCH_WORK_MIN
    sp._PATCH_WORK_MIN = 1000  # force the guard at test scale
    try:
        got = sp.sketch_records_pallas([codes], 15, 16, interpret=True)
    finally:
        sp._PATCH_WORK_MIN = old
    ref = sketch_codes(codes, 15, 16)
    assert got[0].positions.tolist() == ref.positions.tolist()
    assert got[0].hashes.tolist() == ref.hashes.tolist()


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

def test_compact_modes_agree():
    """topk and bsearch emission compaction give identical results."""
    import jax.numpy as jnp
    from ntjoin_tpu.ops.sketch_pallas import _LANE, _SUB, _compact_emissions

    rng = np.random.default_rng(9)
    rows = 64
    emit = jnp.asarray(rng.random((rows, _SUB, _LANE)) < 0.01)
    order = jnp.asarray(
        np.arange(rows * _SUB * _LANE, dtype=np.int32).reshape(
            rows, _SUB, _LANE
        )
    )
    vals = jnp.asarray(
        rng.integers(0, 1 << 30, size=(rows, _SUB, _LANE)).astype(np.int32)
    )
    cap = 2048
    c1, (o1,) = _compact_emissions(emit, order, cap, (vals,), mode="topk")
    c2, (o2,) = _compact_emissions(emit, order, cap, (vals,), mode="bsearch")
    assert int(c1) == int(c2)
    n = int(c1)
    # bsearch orders by (chunk, row); topk orders by ``order`` — compare as
    # sets plus the count (callers feed an order consistent with both)
    assert sorted(np.asarray(o1[:n]).tolist()) == sorted(
        np.asarray(o2[:n]).tolist()
    )


def test_compact_order_matches_chunk_row():
    """With order = chunk*rows + row (the callers' g_window convention),
    topk output order equals bsearch's (chunk, row) order exactly."""
    import jax.numpy as jnp
    from ntjoin_tpu.ops.sketch_pallas import _LANE, _SUB, _compact_emissions

    rng = np.random.default_rng(11)
    rows = 48
    nl = _SUB * _LANE
    emit_np = rng.random((rows, nl)) < 0.02
    chunk = np.arange(nl, dtype=np.int32)[None, :]
    row = np.arange(rows, dtype=np.int32)[:, None]
    order_np = (chunk * rows + row).astype(np.int32)
    vals_np = rng.integers(0, 1 << 30, size=(rows, nl)).astype(np.int32)
    sh = (rows, _SUB, _LANE)
    emit = jnp.asarray(emit_np.reshape(sh))
    order = jnp.asarray(order_np.reshape(sh))
    vals = jnp.asarray(vals_np.reshape(sh))
    c1, (o1,) = _compact_emissions(emit, order, 4096, (vals,), mode="topk")
    c2, (o2,) = _compact_emissions(emit, order, 4096, (vals,), mode="bsearch")
    n = int(c1)
    assert int(c2) == n
    assert np.asarray(o1[:n]).tolist() == np.asarray(o2[:n]).tolist()


def test_general_path_bsearch_mode_parity():
    """The N-rich general path stays exact under NTJOIN_TPU_COMPACT=bsearch
    (the fallback compaction strategy)."""
    import ntjoin_tpu.ops.sketch_pallas as sp

    rng = np.random.default_rng(55)
    codes = rng.integers(0, 4, size=60_000).astype(np.uint8)
    for start, length in [(2000, 40), (25_000, 300), (50_000, 5)]:
        codes[start : start + length] = 4
    old = sp._COMPACT_MODE
    sp._COMPACT_MODE = "bsearch"
    try:
        _assert_same(codes, 15, 10)
    finally:
        sp._COMPACT_MODE = old


def test_seg_cap_bound():
    """_seg_cap upper-bounds the segment count the general path produces."""
    from ntjoin_tpu.ops.sketch_pallas import _seg_cap

    flat = np.zeros(10_000, dtype=np.int8)
    assert _seg_cap(flat) == 4096
    flat[::2] = 4  # pathological alternation: 5000 invalid runs
    assert _seg_cap(flat) >= 5000


def test_equal_hash_run_compression_parity():
    """Repeat runs (homopolymers/microsatellites) slide the window argmin
    one position per window; the v3 kernel stores them compressed (fresh
    entry + run length) and the host expansion must reproduce btllib's
    uncompressed emission stream bit-for-bit — including windows fully
    inside the run, where every k-mer hash is identical."""
    from ntjoin_tpu.ops.nthash_np import sketch_codes
    from ntjoin_tpu.ops.sketch_pallas import (
        sketch_codes_pallas, sketch_records_pallas,
    )

    rng = np.random.default_rng(77)
    k, w = 15, 16
    codes = rng.integers(0, 4, size=60_000).astype(np.uint8)
    codes[5_000:5_200] = 1      # poly-C, longer than k+w: guaranteed slides
    codes[20_000:20_060] = 3    # shorter poly-T
    # AT microsatellite: the phases are reverse complements, so every k-mer
    # in the run shares ONE canonical hash and the argmin advances 1 per
    # window (stride-1 slides, like a homopolymer)
    codes[40_000:40_100:2] = 0
    codes[40_001:40_101:2] = 3
    # AC microsatellite: distinct phase hashes — the winning phase emits
    # every 2nd window only (non-consecutive), exercising the stride-2
    # propagate-scan slide test
    codes[52_000:52_400:2] = 0
    codes[52_001:52_401:2] = 1
    ref = sketch_codes(codes, k, w)
    got = sketch_codes_pallas(codes, k, w, interpret=True)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()

    # the 200-long poly-C emits every window of its interior blocks (16 per
    # 16-window block > 15 slots uncompressed): compression must keep the
    # record on the slot path
    import jax.numpy as jnp

    from ntjoin_tpu.ops.sketch_pallas import (
        _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused,
    )

    n = codes.shape[0]
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, 4, dtype=np.int8)
    buf[:n] = codes
    cap = max(4 * (nk // w + 1), 4096) + _CHUNKS
    out = _sketch_fused(jnp.asarray(buf), n, k, w, cap, interpret=True)
    assert bool(out[4]), "ok flag"
    assert bool(out[5]), "repeat runs must stay within the slot bound"

    # multi-record device call with runs inside and at record edges
    recs = [codes[:30_000], codes[30_000:], codes[4_990:5_230]]
    outs = sketch_records_pallas(recs, k, w, interpret=True)
    for rec, out in zip(recs, outs):
        r = sketch_codes(rec, k, w)
        assert out.positions.tolist() == r.positions.tolist()
        assert out.hashes.tolist() == r.hashes.tolist()


def test_periodic_repeat_stays_in_slot():
    """A long dinucleotide repeat with DISTINCT phase hashes (AC) emits
    every 2nd window; stride-2 run compression must keep the call on the
    v3 slot path (no full-array fallback) with bit-exact expansion."""
    import jax.numpy as jnp

    from ntjoin_tpu.ops.nthash_np import sketch_codes
    from ntjoin_tpu.ops.sketch_pallas import (
        _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused, sketch_codes_pallas,
    )

    rng = np.random.default_rng(9)
    k, w = 15, 64
    codes = rng.integers(0, 4, size=70_000).astype(np.uint8)
    codes[30_000:30_600:2] = 0  # 600 bp AC repeat
    codes[30_001:30_601:2] = 1

    n = codes.shape[0]
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, 4, dtype=np.int8)
    buf[:n] = codes
    cap = max(4 * (nk // w + 1), 4096) + _CHUNKS
    out = _sketch_fused(jnp.asarray(buf), n, k, w, cap, interpret=True)
    assert bool(out[4]), "ok flag"
    assert bool(out[5]), "stride-2 runs must compress within the slot bound"

    ref = sketch_codes(codes, k, w)
    got = sketch_codes_pallas(codes, k, w, interpret=True)
    assert got.positions.tolist() == ref.positions.tolist()
    assert got.hashes.tolist() == ref.hashes.tolist()


def test_expand_runs_strided():
    """_expand_runs unpacks (count, stride) words into arithmetic position
    runs — including stride > 1 and the count<=1 passthrough."""
    from ntjoin_tpu.ops.sketch_pallas import _expand_runs

    pos = np.array([10, 100, 500], dtype=np.int64)
    lo = np.array([1, 2, 3], dtype=np.uint32)
    hi = np.array([4, 5, 6], dtype=np.uint32)
    # entry 0: count 3 stride 2 -> 10, 12, 14; entry 1: count 1;
    # entry 2: count 4 stride 7 -> 500, 507, 514, 521
    runs = np.array([(2 << 16) | 3, 1, (7 << 16) | 4], dtype=np.int32)
    p, l, h = _expand_runs(pos, lo, hi, runs)
    assert p.tolist() == [10, 12, 14, 100, 500, 507, 514, 521]
    assert l.tolist() == [1, 1, 1, 2, 3, 3, 3, 3]
    assert h.tolist() == [4, 4, 4, 5, 6, 6, 6, 6]

    # count<=1 everywhere short-circuits to the inputs unchanged
    runs1 = np.array([1, 1, 0], dtype=np.int32)
    p1, l1, h1 = _expand_runs(pos, lo, hi, runs1)
    assert p1 is pos and l1 is lo and h1 is hi


def test_int32_guard_routes_giant_record_to_host(monkeypatch):
    """Single records at/past the int32 device-position cap must route to
    the host sketcher without touching the device (the >= ~2.1 Gbp guard)."""
    import ntjoin_tpu.ops.sketch_pallas as sp

    called = {}

    def fake_host(codes, k, w):
        called["n"] = codes.shape[0]
        return "HOST_SENTINEL"

    monkeypatch.setattr(sp, "_host_sketch", fake_host)
    n = (1 << 31) - (1 << 20)  # exactly the guard threshold
    codes = np.zeros(n, dtype=np.int8)  # untouched pages: cheap despite 2 GB
    out = sp.sketch_codes_pallas(codes, 32, 1000)
    assert out == "HOST_SENTINEL" and called["n"] == n


def test_multi_record_batch_split_parity(monkeypatch):
    """A small NTJOIN_TPU_BATCH_BASES forces the whole-assembly path to
    split records across several device batches; outputs must equal the
    single-batch result."""
    import ntjoin_tpu.ops.sketch_pallas as sp

    rng = np.random.default_rng(60)
    records = [
        rng.integers(0, 4, size=ln).astype(np.uint8)
        for ln in [9000, 8000, 7000, 6000]
    ]
    monkeypatch.setenv("NTJOIN_TPU_BATCH_BASES", "16000")  # ~2 records/batch
    got = sp.sketch_records_pallas(records, 15, 10, interpret=True)
    monkeypatch.delenv("NTJOIN_TPU_BATCH_BASES")
    for codes, sk in zip(records, got):
        ref = sketch_codes(codes, 15, 10)
        assert sk.positions.tolist() == ref.positions.tolist()
        assert sk.hashes.tolist() == ref.hashes.tolist()


def test_batched_int32_guard_routes_giant_record_to_host(monkeypatch):
    """A single record past the int32 device-position cap inside a BATCH
    must route to the host sketcher (device positions would overflow);
    normal-sized records in the same call stay on the device path."""
    import ntjoin_tpu.ops.sketch_pallas as sp

    calls = []

    def fake_host(codes, k, w):
        calls.append(codes.shape[0])
        return "HOST_SENTINEL"

    monkeypatch.setattr(sp, "_host_sketch", fake_host)
    small = np.random.default_rng(1).integers(0, 4, 40_000).astype(np.uint8)
    giant = np.zeros((1 << 31) - (1 << 20), dtype=np.int8)  # untouched pages
    out = sp.sketch_records_pallas([small, giant], 15, 10, interpret=True)
    assert out[1] == "HOST_SENTINEL" and calls == [giant.shape[0]]
    ref = sketch_codes(small, 15, 10)
    assert out[0].positions.tolist() == ref.positions.tolist()


def test_host_steal_parity(monkeypatch):
    """Host work-stealing (tail entries sketched by the native/host
    sketcher while the device stream is busy) must be result-invisible:
    forcing maximal stealing across many small batches — including
    segmented N-rich records whose pieces then mix device and stolen
    sketches — reproduces the oracle bit-for-bit."""
    import ntjoin_tpu.ops.sketch_pallas as sp

    rng = np.random.default_rng(71)
    records = []
    for ln in [40_000, 35_000, 42_000, 38_000, 36_000]:
        codes = rng.integers(0, 4, size=ln).astype(np.uint8)
        records.append(codes)
    records[1][5_000:5_300] = 4  # segmented record: device + stolen pieces
    records[3][20_000:20_040] = 4
    monkeypatch.setenv("NTJOIN_TPU_BATCH_BASES", "40000")  # many batches
    monkeypatch.setenv("NTJOIN_TPU_HOST_STEAL", "force")
    got = sp.sketch_records_pallas(records, 15, 10, interpret=True)
    monkeypatch.setenv("NTJOIN_TPU_HOST_STEAL", "off")
    ref = sp.sketch_records_pallas(records, 15, 10, interpret=True)
    for sk, rk, codes in zip(got, ref, records):
        oracle = sketch_codes(codes, 15, 10)
        assert sk.positions.tolist() == oracle.positions.tolist()
        assert sk.hashes.tolist() == oracle.hashes.tolist()
        assert rk.positions.tolist() == oracle.positions.tolist()


def test_batch_meta_no_run_column():
    """w with no viable scan tile (_pick_tr(w)==0, e.g. w=1026) makes
    _sketch_fused take its exact non-slot path and return run=None; the
    batch meta sync must not crash on the missing run column (round-4
    advisor finding: uncaught TypeError in _batch_meta_one)."""
    import jax.numpy as jnp

    from ntjoin_tpu.ops import sketch_pallas as sp

    assert sp._pick_tr(1026) == 0
    one = jnp.asarray(1, jnp.int32)
    out = (None, None, None, jnp.asarray(7, jnp.int32), None, one, None)
    meta = sp._batch_meta_one({"out": out, "use_fast": True})
    assert meta.tolist() == [7, 1, 0, 0]


def test_batched_records_no_tile_w_parity():
    """Batched sketch at a tile-less w (w=1026) matches the oracle
    whichever path (device non-slot or host fallback) serves it."""
    from ntjoin_tpu.ops.sketch_pallas import sketch_records_pallas

    rng = np.random.default_rng(5)
    rec = rng.integers(0, 4, size=2_200_000).astype(np.uint8)
    got = sketch_records_pallas([rec], 32, 1026, interpret=False)
    ref = sketch_codes(rec, 32, 1026)
    assert got[0].positions.tolist() == ref.positions.tolist()
    assert got[0].hashes.tolist() == ref.hashes.tolist()


def test_bk_scan_mode_parity(monkeypatch):
    """NTJOIN_TPU_SCAN=bk (vreg-local + coarse scans) must be bit-equal
    to the shifted-combine scans across w with tr%8==0 (tile scans) and
    w%8==0 (emission scans), including repeat runs (dense tier)."""
    import jax

    monkeypatch.setenv("NTJOIN_TPU_SCAN", "bk")
    jax.clear_caches()
    try:
        from ntjoin_tpu.ops.sketch_pallas import sketch_records_pallas

        rng = np.random.default_rng(71)
        records = []
        for ln in [9000, 4000, 2500]:
            codes = rng.integers(0, 4, size=ln).astype(np.uint8)
            records.append(codes)
        records[0][500:2100] = 1  # poly-C: dense tier + run compression
        records[1][100:160] = 4  # N run: general path
        for w in (16, 64):
            got = sketch_records_pallas(records, 15, w, interpret=True)
            for codes, sk in zip(records, got):
                ref = sketch_codes(codes, 15, w)
                assert sk.positions.tolist() == ref.positions.tolist(), w
                assert sk.hashes.tolist() == ref.hashes.tolist(), w
    finally:
        jax.clear_caches()


@pytest.mark.parametrize("seed", [0, 3])
def test_compact_slots_stress(seed):
    """Randomized _compact_slots decode vs a direct NumPy reference.

    Exercises the scatter+cummax rank decode (round 5) on adversarial
    shapes: empty lanes, empty blocks, full slots, lanes at the per-lane
    cap, and counts-raw overflow flipping slots_ok."""
    import jax.numpy as jnp

    from ntjoin_tpu.ops import sketch_pallas as sp

    rng = np.random.default_rng(seed)
    nbm1, nl = 9, 256
    counts = rng.poisson(1.2, size=(nbm1, nl)).astype(np.int32)
    counts[:, rng.integers(0, nl, 40)] = 0  # empty lanes
    counts[rng.integers(0, nbm1, 3), :] = 0  # empty blocks
    counts[0, 0] = sp._NSLOT  # a full slot row
    oix = np.full((nbm1, sp._SLOTS, nl), -1, np.int32)
    olo = np.zeros((nbm1, sp._SLOTS, nl), np.int32)
    ohi = np.zeros((nbm1, sp._SLOTS, nl), np.int32)
    orun = np.zeros((nbm1, sp._SLOTS, nl), np.int32)
    val = 1
    # fill slots 0..cnt-1 contiguously per (block, lane), ascending values
    for b in range(nbm1):
        for l in range(nl):
            for s in range(min(int(counts[b, l]), sp._NSLOT)):
                oix[b, s, l] = val
                olo[b, s, l] = val * 3
                ohi[b, s, l] = val * 5
                orun[b, s, l] = 1
                val += 1
    oix[:, sp._NSLOT, :] = counts  # raw-count row
    cap = int(counts.sum()) + 64

    got = sp._compact_slots(
        jnp.asarray(oix), jnp.asarray(olo), jnp.asarray(ohi),
        jnp.asarray(orun), cap,
    )
    pos, lo, hi, run, total, slots_ok = (np.asarray(x) for x in got)
    assert int(total) == counts.sum()
    assert bool(slots_ok)

    # numpy reference: lane-major, block order within lane, slot order
    ref_pos, ref_lo, ref_hi = [], [], []
    for l in range(nl):
        for b in range(nbm1):
            for s in range(min(int(counts[b, l]), sp._NSLOT)):
                ref_pos.append(oix[b, s, l])
                ref_lo.append(olo[b, s, l])
                ref_hi.append(ohi[b, s, l])
    n = len(ref_pos)
    assert pos[:n].tolist() == ref_pos
    assert lo[:n].astype(np.int32).tolist() == ref_lo
    assert hi[:n].astype(np.int32).tolist() == ref_hi
    assert (pos[n:] == 0).all()

    # per-lane cap overflow must flip slots_ok (host-fallback contract)
    counts2 = counts.copy()
    counts2[:, 5] = sp._NSLOT  # one lane over 4*nbm1 emissions
    oix2 = oix.copy()
    oix2[:, sp._NSLOT, :] = counts2
    got2 = sp._compact_slots(
        jnp.asarray(oix2), jnp.asarray(olo), jnp.asarray(ohi),
        jnp.asarray(orun), cap,
    )
    assert not bool(np.asarray(got2[5]))
