"""Analysis layer (minimap2/samtools/QUAST wrappers) with stubbed tools.

The real tools are absent from this image; shell stubs on PATH record their
argv so the command construction (mirroring reference ``ntJoin:238-252``)
is testable end-to-end through the CLI.
"""
import os
import stat
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stub(bindir, name, body):
    p = bindir / name
    p.write_text("#!/bin/bash\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)


def _env(bindir):
    env = dict(os.environ, PYTHONPATH=REPO)
    env["PATH"] = f"{bindir}:{env['PATH']}"
    return env


def test_quast_command(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "quast.log"
    _stub(bindir, "quast", f'echo "$@" >> {log}\nmkdir -p "$4"\n'
          f'touch "$4/report.tsv"\n')
    for f in ("t.fa", "r.fa", "truth.fa", "t.fa.k32.w1000.n2.all.scaffolds.fa"):
        (tmp_path / f).write_text(">x\nACGT\n")
    res = subprocess.run(
        [sys.executable, "-m", "ntjoin_tpu.cli", "quast", "target=t.fa",
         "references=r.fa", "ref=truth.fa", "n=2", "prefix=p1", "large=1"],
        cwd=tmp_path, env=_env(bindir), capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "quast_p1/report.tsv" in res.stdout
    args = log.read_text().split()
    # reference flag set (ntJoin:244-252)
    for flag in ("--fast", "--scaffold-gap-max-size", "100000",
                 "--split-scaffolds", "--large"):
        assert flag in args
    assert args[args.index("-r") + 1] == "truth.fa"
    # assemblies: references, target, all.scaffolds — in that order
    assert args[-3:] == ["r.fa", "t.fa", "t.fa.k32.w1000.n2.all.scaffolds.fa"]


def test_analysis_accepts_gzipped_scaffolds(tmp_path):
    """assemble gzip=True replaces <fa> with <fa>.gz; analysis must still
    find and align the scaffolds (ADVICE round 2: the plain-name existence
    check silently skipped them)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.log"
    _stub(bindir, "minimap2", f'echo "minimap2 $@" >> {log}\necho SAM\n')
    _stub(bindir, "samtools", f'echo "samtools $@" >> {log}\ncat > /dev/null\n')
    for f in ("t.fa", "truth.fa"):
        (tmp_path / f).write_text(">x\nACGT\n")
    import gzip

    with gzip.open(tmp_path / "t.fa.k32.w1000.n1.all.scaffolds.fa.gz", "wt") as fh:
        fh.write(">s\nACGT\n")
    res = subprocess.run(
        [sys.executable, "-m", "ntjoin_tpu.cli", "analysis", "target=t.fa",
         "ref=truth.fa", "t=3"],
        cwd=tmp_path, env=_env(bindir), capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "t.fa.k32.w1000.n1.all.scaffolds.fa.gz" in log.read_text()


def test_quast_missing_tool(tmp_path):
    (tmp_path / "t.fa").write_text(">x\nACGT\n")
    env = dict(os.environ, PYTHONPATH=REPO, PATH="/usr/bin:/bin")
    res = subprocess.run(
        [sys.executable, "-m", "ntjoin_tpu.cli", "quast", "target=t.fa",
         "references=r.fa", "ref=truth.fa"],
        cwd=tmp_path, env=env, capture_output=True, text=True,
    )
    assert res.returncode == 1
    assert "quast not found" in res.stderr


def test_analysis_alignment_pipeline(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.log"
    _stub(bindir, "minimap2", f'echo "minimap2 $@" >> {log}\necho SAM\n')
    _stub(bindir, "samtools", f'echo "samtools $@" >> {log}\ncat > /dev/null\n')
    for f in ("t.fa", "r.fa", "truth.fa", "t.fa.k32.w1000.n1.all.scaffolds.fa"):
        (tmp_path / f).write_text(">x\nACGT\n")
    res = subprocess.run(
        [sys.executable, "-m", "ntjoin_tpu.cli", "analysis", "target=t.fa",
         "references=r.fa", "ref=truth.fa", "t=3"],
        cwd=tmp_path, env=_env(bindir), capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    calls = log.read_text()
    # asm5 preset with the reference's -r100000, vs the truth reference
    assert "minimap2 -a -x asm5 -r100000 -t 3 truth.fa r.fa" in calls
    assert "minimap2 -a -x asm5 -r100000 -t 3 truth.fa t.fa" in calls
    assert (
        "minimap2 -a -x asm5 -r100000 -t 3 truth.fa "
        "t.fa.k32.w1000.n1.all.scaffolds.fa" in calls
    )
    assert "samtools index" in calls
    # bams written next to the inputs
    assert (tmp_path / "t.fa.bam").exists()
