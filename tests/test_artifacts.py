"""Artifact-level byte equality: reference goldens + self-regression pins."""
import os
import shutil
import subprocess
import sys

REF = "/root/reference/tests"
GOLDEN = f"{REF}/expected_outputs"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SELF_GOLDEN = os.path.join(REPO, "tests", "golden")


def _run(workdir, *args):
    cmd = [sys.executable, "-m", "ntjoin_tpu.cli", "assemble", "-B",
           "backend=numpy", *args]
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr + res.stdout
    return res


def test_ff_artifacts_match_reference_goldens(tmp_path):
    """Full artifact set of the f-f case vs the reference's expected_outputs.

    The reference's install check compares these files byte-for-byte
    (tests/test_installation.sh); we assert the same set from pytest.  The
    golden TSV is the historical 2-field format and the DOT predates the
    label prefix, so those two are compared structurally elsewhere.
    """
    for f in ["ref.fa", "scaf.f-f.fa"]:
        shutil.copy(f"{REF}/{f}", tmp_path / f)
    _run(tmp_path, "target=scaf.f-f.fa", "target_weight=1", "references=ref.fa",
         "reference_weights=2", "prefix=f-f_test", "k=32", "w=1000", "n=2",
         "overlap=False")
    for name in [
        "scaf.f-f.fa.k32.w1000.n2.assigned.scaffolds.fa",
        "scaf.f-f.fa.k32.w1000.n2.unassigned.scaffolds.fa",
        "scaf.f-f.fa.k32.w1000.n2.all.scaffolds.fa",
    ]:
        golden = name.replace(".n2.", ".n1.")  # golden set was built with n=1
        assert (tmp_path / name).read_bytes() == open(f"{GOLDEN}/{golden}", "rb").read(), name
    assert (tmp_path / "scaf.f-f.fa.fai").read_bytes() == open(f"{GOLDEN}/scaf.f-f.fa.fai", "rb").read()
    assert (tmp_path / "ref.fa.fai").read_bytes() == open(f"{GOLDEN}/ref.fa.fai", "rb").read()
    assert (
        (tmp_path / "f-f_test.scaf.f-f.fa.k32.w1000.tsv.unassigned.bed").read_bytes()
        == open(f"{GOLDEN}/f-f_test.scaf.f-f.fa.k32.w1000.tsv.unassigned.bed", "rb").read()
    )
    got_path = [ln for ln in (tmp_path / "f-f_test.path").read_text().splitlines()]
    want_path = open(f"{GOLDEN}/f-f_test.path").read().splitlines()
    assert got_path == want_path


def test_overlap_agp_self_golden(tmp_path):
    """Self-regression pin: the overlap+AGP artifact set for f-r.overlapping.

    The reference has no goldens for this configuration; this snapshot locks
    the full writer stack (path/agp/fasta/bed/dot edge section) against
    regressions.  Regenerate with REGEN=1 after intentional changes.
    """
    for f in ["ref.fa", "scaf.f-r.overlapping.fa"]:
        shutil.copy(f"{REF}/{f}", tmp_path / f)
    _run(tmp_path, "target=scaf.f-r.overlapping.fa", "target_weight=1",
         "references=ref.fa", "reference_weights=2", "prefix=ovl", "k=32",
         "w=1000", "n=2", "overlap=True", "agp=True")
    names = [
        "ovl.path",
        "ovl.agp",
        "ovl.mx.dot",
        "ovl.scaf.f-r.overlapping.fa.k32.w1000.tsv.unassigned.bed",
        "scaf.f-r.overlapping.fa.k32.w1000.n2.all.scaffolds.fa",
        "scaf.f-r.overlapping.fa.k32.w1000.tsv",
    ]
    os.makedirs(SELF_GOLDEN, exist_ok=True)
    for name in names:
        golden_path = os.path.join(SELF_GOLDEN, name)
        if os.environ.get("REGEN") == "1" or not os.path.exists(golden_path):
            shutil.copy(tmp_path / name, golden_path)
        assert (tmp_path / name).read_bytes() == open(golden_path, "rb").read(), name


def test_fasta_store_subseq(tmp_path):
    """mmap-backed FastaStore slices match in-memory records, across line
    widths, boundaries, and the gz fallback."""
    from ntjoin_tpu.io.fasta import FastaStore, read_fasta_dict

    import gzip
    import numpy as np

    rng = np.random.default_rng(11)
    seqs = {
        "a": "".join("ACGT"[i] for i in rng.integers(0, 4, 257)),
        "b": "".join("ACGTN"[i] for i in rng.integers(0, 5, 80)),
        "c": "A",
    }
    fa = tmp_path / "s.fa"
    with open(fa, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name} extra comment\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i : i + 60] + "\n")
    store = FastaStore(str(fa))
    assert store.names() == ["a", "b", "c"]
    for name, seq in seqs.items():
        assert store.length(name) == len(seq)
        assert store.subseq(name, 0, len(seq)) == seq
        assert store.subseq(name, 0, 0) == ""
        for s, e in [(0, 1), (59, 61), (60, 120), (3, len(seq)),
                     (len(seq) - 1, len(seq)), (0, 10**9)]:
            e_c = min(e, len(seq))
            s_c = min(s, len(seq))
            assert store.subseq(name, s, e) == seq[s_c:e_c], (name, s, e)
    store.close()

    gz = tmp_path / "s.fa.gz"
    with open(fa, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    gstore = FastaStore(str(gz))
    assert gstore.names() == ["a", "b", "c"]
    for name, seq in seqs.items():
        assert gstore.subseq(name, 2, 40) == seq[2:40]
    # sanity: both agree with the eager reader
    recs = read_fasta_dict(str(fa))
    assert {n: r.seq for n, r in recs.items()} == seqs
