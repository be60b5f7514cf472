"""Artifact writers: .path, AGP, DOT graph, minimizer TSV, BED, FASTA.

Byte-compatible with the reference's emission formats:
AGP (``ntjoin_assemble.py:345-404``), DOT (``ntjoin.py:25-67``), indexlr TSV
(``ntJoin:204-205`` contract), unassigned BED/FASTA (``:628-658``).
"""
from __future__ import annotations

import re
from typing import TextIO

import numpy as np

from ntjoin_tpu.core.pathnode import Bed

_CONTIG_RE = re.compile(r"(\S+)([\+\-])\:(\d+)-(\d+)")
_GAP_RE = re.compile(r"(\d+)N")
_AGP_ROW = ("{}\t" * 9).strip()


def write_agp_path(agp_file: TextIO, scaffold_id: str, path_str: str) -> None:
    """One scaffold's AGP rows from its path string (ref :345-376)."""
    coord = 1
    part = 1
    for component in path_str.split():
        cmatch = _CONTIG_RE.search(component)
        gmatch = _GAP_RE.search(component)
        if cmatch:
            contig_id, ori = cmatch.group(1), cmatch.group(2)
            c_start, c_end = int(cmatch.group(3)) + 1, int(cmatch.group(4))
            seg_len = c_end - c_start + 1
            row = _AGP_ROW.format(
                scaffold_id, coord, coord + seg_len - 1, part, "W",
                contig_id, c_start, c_end, ori,
            )
        elif gmatch:
            seg_len = int(gmatch.group(1))
            row = _AGP_ROW.format(
                scaffold_id, coord, coord + seg_len - 1, part, "N",
                seg_len, "scaffold", "yes", "align_genus",
            )
        else:
            raise ValueError(f"Path string is not formatted correctly: {path_str}")
        agp_file.write(row + "\n")
        coord += seg_len
        part += 1


_UNASSIGNED_RE = re.compile(r"((\S+)\:(\d+)-(\d+))")


def write_agp_unassigned(agp_file: TextIO, header: str, seq: str) -> None:
    """AGP row for an unassigned region, N-strip adjusted (ref :378-404)."""
    start_stripped = seq.strip().lstrip("Nn")
    diff_start = len(seq) - len(start_stripped)
    end_stripped = start_stripped.rstrip("Nn")
    diff_end = len(start_stripped) - len(end_stripped)
    if not end_stripped:
        return
    match = _UNASSIGNED_RE.search(header)
    if not match:
        return
    new_id, contig = match.group(1), match.group(2)
    start = int(match.group(3)) + 1 + diff_start
    end = int(match.group(4)) - diff_end
    assert len(seq.strip().strip("Nn")) == end - start + 1
    agp_file.write(
        _AGP_ROW.format(new_id, 1, end - start + 1, 1, "W", contig, start, end, "+")
        + "\n"
    )


_DOT_COLOURS = [
    "red", "green", "blue", "purple", "orange",
    "turquoise", "pink", "yellow", "orchid", "salmon",
]


def write_dot(out_path: str, graph, shared) -> None:
    """Minimizer graph DOT dump with per-assembly edge colours (ref ntjoin.py:25-67).

    Node section is emitted in hash order (the reference's order is python-set
    nondeterministic); the edge section follows first-seen insertion order
    like the reference.
    """
    assemblies = shared.assemblies
    colours = _DOT_COLOURS
    if len(assemblies) > len(colours):
        colours = ["red"] * len(assemblies)
    names = [str(h) for h in shared.node_hash.tolist()]
    chunks: list[str] = ["graph G {\n"]
    for node_id in range(shared.num_nodes):
        name = names[node_id]
        labels = "\n".join(
            f"{asm.name}_"
            f"{(asm.contig_names[int(shared.ctg[a, node_id])], int(shared.pos[a, node_id]))}"
            for a, asm in enumerate(assemblies)
        )
        chunks.append(f'"{name}" [label="{name}\n{labels}"]\n')
    for eid in np.flatnonzero(graph.alive):
        s = names[int(graph.src[eid])]
        t = names[int(graph.dst[eid])]
        mask = int(graph.support_mask[eid])
        support = [i for i in range(len(assemblies)) if mask & (1 << i)]
        if len(support) == 1:
            colour = colours[support[0]]
        elif len(support) == 2:
            colour = "lightgrey"
        else:
            colour = "black"
        chunks.append(f'"{s}" --"{t}" [weight={graph.weight[eid]} color={colour}]\n')
    chunks.append("}\n")
    with open(out_path, "w", encoding="utf-8") as out:
        out.write("".join(chunks))


def dot_colour_legend(assemblies) -> str:
    """Per-assembly colour legend echoed after the DOT dump (ref ntjoin.py:64-67)."""
    colours = _DOT_COLOURS
    if len(assemblies) > len(colours):
        colours = ["red"] * len(assemblies)
    lines = ["\nfile_name\tnumber\tcolour"]
    for i, asm in enumerate(assemblies):
        lines.append(f"{asm.name}\t{i}\t{colours[i]}")
    lines.append("")
    return "\n".join(lines)


def write_minimizer_tsv(
    out_path: str, records, sketches: list, k: int, with_seq: bool = True
) -> None:
    """indexlr-format TSV: ``id\\thash:pos[:seq] ...`` one line per record."""
    with open(out_path, "w", encoding="utf-8") as out:
        for rec, sk in zip(records, sketches):
            toks = []
            for h, p in zip(sk.hashes.tolist(), sk.positions.tolist()):
                if with_seq:
                    toks.append(f"{h}:{p}:{rec.seq[p:p + k]}")
                else:
                    toks.append(f"{h}:{p}")
            out.write(f"{rec.id}\t{' '.join(toks)}\n")


def write_bed(out_path: str, beds: list[Bed]) -> None:
    with open(out_path, "w", encoding="utf-8") as out:
        for b in beds:
            out.write(f"{b.contig}\t{b.start}\t{b.end}\n")
