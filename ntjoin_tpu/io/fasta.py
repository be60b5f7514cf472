"""FASTA input/output for the scaffolding engine.

Host-side sequence handling: parse FASTA (optionally gzipped) into records,
encode into the framework's uint8 base codes, write scaffold/`.fai` artifacts.
Replaces the reference's btllib ``SeqReader`` (reference
``ntjoin_assemble.py:308-323``), ``samtools faidx`` (``ntJoin:207-208``) and
lh3 readfq parser (``read_fasta.py:6-46``).

A fast C++ reader (``native/``) is used automatically for large inputs when
the shared library has been built; this pure-python path is the portable
fallback and the behavioural reference.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np

from ntjoin_tpu.ops.nthash_np import encode


@dataclass
class FastaRecord:
    """One FASTA record: identifier, raw sequence, derived base codes."""

    id: str
    seq: str
    _codes: np.ndarray | None = field(default=None, repr=False)

    @property
    def length(self) -> int:
        return len(self.seq)

    @property
    def codes(self) -> np.ndarray:
        if self._codes is None:
            self._codes = encode(self.seq)
        return self._codes


def _open_text(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r", encoding="utf-8")


def read_fasta(path: str) -> list[FastaRecord]:
    """Parse a FASTA file into records (order preserved).

    Record ids are the first whitespace-separated token of the header, the
    same convention btllib's SeqReader applies for the reference pipeline.
    Uses the native C++ reader when built (an order of magnitude faster on
    Gbp-scale inputs); this python loop is the portable fallback and the
    gzip path.
    """
    if not path.endswith(".gz"):
        try:
            from ntjoin_tpu.io.native import available, read_fasta_native

            if available():
                return read_fasta_native(path)
        except Exception:  # pragma: no cover - fall back to python parsing
            pass
    records: list[FastaRecord] = []
    name = None
    chunks: list[str] = []
    with _open_text(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    records.append(FastaRecord(name, "".join(chunks)))
                name = line[1:].split()[0] if len(line) > 1 else ""
                chunks = []
            elif name is not None:
                chunks.append(line.strip())
    if name is not None:
        records.append(FastaRecord(name, "".join(chunks)))
    return records


def read_fasta_dict(path: str) -> dict[str, FastaRecord]:
    """Parse FASTA into an insertion-ordered id -> record mapping."""
    out: dict[str, FastaRecord] = {}
    for rec in read_fasta(path):
        out[rec.id] = rec
    return out


def write_fai(path: str, out_path: str | None = None) -> str:
    """Write a ``.fai`` index for a FASTA file (mirrors ``samtools faidx``).

    Columns: name, length, byte offset of first base, bases per line, bytes
    per line.  Only needed to mirror the reference's artifact set.
    """
    out_path = out_path or path + ".fai"
    if not path.endswith(".gz"):
        from ntjoin_tpu.io import native as _native

        lib = _native._load()
        if lib is not None:
            got = lib.nj_write_fai(path.encode(), out_path.encode())
            if got >= 0:
                return out_path
    rows = []
    with open(path, "rb") as fh:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        first_line = True
        pos = 0
        for raw in fh:
            line_len = len(raw)
            stripped = raw.rstrip(b"\r\n")
            if stripped.startswith(b">"):
                if name is not None:
                    rows.append((name, length, offset, linebases, linewidth))
                name = stripped[1:].split()[0].decode()
                length = 0
                offset = pos + line_len
                first_line = True
            elif name is not None and stripped:
                if first_line:
                    linebases = len(stripped)
                    linewidth = line_len
                    first_line = False
                length += len(stripped)
            pos += line_len
        if name is not None:
            rows.append((name, length, offset, linebases, linewidth))
    with open(out_path, "w", encoding="utf-8") as out:
        for row in rows:
            out.write("\t".join(str(x) for x in row) + "\n")
    return out_path


def reverse_complement(seq: str) -> str:
    """Reverse complement with the full IUPAC alphabet.

    Same translation contract as reference ``ntjoin_utils.py:145-150``.
    """
    return seq[::-1].translate(_RC_TABLE)


_RC_TABLE = str.maketrans(
    "ACGTUNMRWSYKVHDBacgtunmrwsykvhdb",
    "TGCAANKYWSRMBDHVtgcaankywsrmbdhv",
)
