"""Bit-exactness tests of the minimizer sketch against golden indexlr output.

The golden TSVs under the reference's ``tests/expected_outputs`` were produced
by btllib's indexlr and pin down the full hash/selection contract (values like
``3714041376220621505:800`` in ``ref.fa.k32.w1000.tsv``).
"""
import os

import numpy as np
import pytest

from ntjoin_tpu.io.fasta import read_fasta
from ntjoin_tpu.ops.nthash_np import (
    Sketch,
    canonical_hashes,
    derive_hash,
    encode,
    sketch_seq,
)

GOLDEN = "/root/reference/tests/expected_outputs"


def load_golden_tsv(path):
    out = {}
    with open(path) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2 or not parts[1]:
                out[parts[0]] = []
                continue
            mxs = []
            for tok in parts[1].split(" "):
                fields = tok.split(":")
                mxs.append((int(fields[0]), int(fields[1])))
            out[parts[0]] = mxs
    return out


@pytest.mark.parametrize(
    "fasta,tsv",
    [
        ("/root/reference/tests/ref.fa", f"{GOLDEN}/ref.fa.k32.w1000.tsv"),
        ("/root/reference/tests/scaf.f-f.fa", f"{GOLDEN}/scaf.f-f.fa.k32.w1000.tsv"),
    ],
)
def test_sketch_matches_golden_indexlr_legacy_min(fasta, tsv):
    """Legacy min-canonical mode is bit-identical to the archived golden TSVs.

    The golden artifacts predate ntHash2's add-canonical; matching them
    end-to-end (positions AND emitted 64-bit values) pins every other part of
    the sketch contract: seeds, split rotation, window argmin, tie-breaks,
    dedup and the nte1 output transform.  The current-era add-canonical is
    exercised by the pipeline tests' cut coordinates.
    """
    golden = load_golden_tsv(tsv)
    for rec in read_fasta(fasta):
        got = sketch_seq(rec.seq, 32, 1000, canonical="min")
        want = golden.get(rec.id, [])
        assert [(h, p) for h, p in zip(got.hashes.tolist(), got.positions.tolist())] == want


def test_short_sequence_yields_empty_sketch():
    s = sketch_seq("ACGTACGTACGT", 32, 1000)
    assert s.positions.size == 0
    # w larger than kmer count
    s = sketch_seq("A" * 100, 32, 1000)
    assert s.positions.size == 0


def test_invalid_bases_are_skipped():
    seq = "ACGT" * 64
    seq_n = seq[:100] + "N" + seq[101:]
    canon, valid = canonical_hashes(encode(seq_n), 15)
    # every kmer window covering position 100 is invalid
    assert not valid[86:101].any()
    assert valid[:86].all() and valid[101:].all()


def test_rolling_reference_agreement():
    """Closed-form hashes equal the sequential rolling recurrence."""
    from ntjoin_tpu.constants import SEEDS, srol

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=300).astype(np.uint8)
    k = 21
    canon_add, valid = canonical_hashes(codes, k, "add")
    canon_min, _ = canonical_hashes(codes, k, "min")
    assert valid.all()
    rc = [3 - int(c) for c in codes]
    for p in range(0, 300 - k + 1, 17):
        f = 0
        r = 0
        for j in range(k):
            f = srol(f) ^ SEEDS[int(codes[p + j])]
        for j in reversed(range(k)):
            r = srol(r) ^ SEEDS[rc[p + j]]
        assert int(canon_add[p]) == (f + r) % (1 << 64)
        assert int(canon_min[p]) == min(f, r)


def test_window_tiebreak_leftmost():
    """Identical kmers in one window: the leftmost must be selected."""
    # A period-4 sequence for k=4 has 4 rotations collapsing into 2 canonical
    # hashes (add-canonical is reverse-complement symmetric: CGTA == rc TACG),
    # so the minimal hash repeats every 2 positions.  Each window holds
    # several copies and the leftmost must win: emitted positions advance in
    # steps of exactly 2.
    seq = "ACGT" * 50
    s = sketch_seq(seq, 4, 8)
    assert s.positions[0] < 2
    diffs = np.diff(s.positions)
    assert (diffs == 2).all()
    assert len(set(s.hashes.tolist())) == 1


def test_native_mt_stream_space_tiling():
    """N-containing records must tile across threads in valid-k-mer
    STREAM space (round-5 review: any non-ACGT base used to serialize the
    whole record), bit-equal to the oracle at every thread count."""
    import numpy as np

    from ntjoin_tpu.io.native import available, sketch_codes_native
    from ntjoin_tpu.ops.nthash_np import sketch_codes

    if not available():  # pragma: no cover - toolchain-less environments
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(23)
    codes = rng.integers(0, 4, size=300_000).astype(np.uint8)
    codes[:40] = 4  # leading N run
    for s in (50_000, 120_000, 240_000):
        codes[s : s + 2_000] = 4  # long interior gaps
    codes[-25:] = 4  # trailing run
    ref = sketch_codes(codes, 32, 25)
    for th in (2, 3, 8):
        got = sketch_codes_native(codes, 32, 25, threads=th)
        assert got.positions.tolist() == ref.positions.tolist(), th
        assert got.hashes.tolist() == ref.hashes.tolist(), th


def test_native_fasta_nul_safe():
    """A stray NUL byte in a FASTA must not merge records (round-5
    review: fgets+strlen framing lost whole contigs)."""
    import tempfile

    from ntjoin_tpu.io import native as nat
    from ntjoin_tpu.io.fasta import read_fasta

    if not nat.available():  # pragma: no cover
        import pytest

        pytest.skip("native library not built")
    with tempfile.NamedTemporaryFile(
        "wb", suffix=".fa", delete=False
    ) as fh:
        fh.write(b">a\nAC\x00GT\n>b\nAAAA\n")
        path = fh.name
    recs = nat.read_fasta_native(path)
    assert [r.id for r in recs] == ["a", "b"]
    assert recs[1].seq == "AAAA"
    # python fallback frames identically (NUL lands inside record a)
    orig = nat._load
    try:
        nat._load = lambda: None
        recs_py = read_fasta(path)
    finally:
        nat._load = orig
    assert [r.id for r in recs_py] == ["a", "b"]
    assert recs_py[1].seq == "AAAA"
