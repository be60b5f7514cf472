"""Argparse front-end for the scaffolding stage.

Flag-for-flag mirror of the reference's python CLI (``ntjoin_run.py:17-53``):
takes pre-computed minimizer TSVs and drives the scaffolder directly.  The
Make-style pipeline driver (sketching + artifact reuse + the all-scaffolds
concatenation) lives in ``ntjoin_tpu.cli``.
"""
from __future__ import annotations

import argparse
import re
import sys

from ntjoin_tpu.core.config import ScaffoldConfig
from ntjoin_tpu.core.scaffolder import Scaffolder


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(
        description="ntjoin-tpu: scaffolding genome assemblies using reference "
        "assemblies and minimizer graphs (TPU-native engine)",
        epilog="Note: each input minimizer TSV file must have a matching fasta "
        "file.\nExample: myscaffolds.fa.k32.w1000.tsv - myscaffolds.fa is the "
        "expected matching fasta",
        formatter_class=argparse.RawTextHelpFormatter,
    )
    parser.add_argument("FILES", nargs="+", help="Minimizer TSV files of references")
    parser.add_argument("-s", help="Target scaffolds minimizer TSV file", required=True)
    parser.add_argument("-l", help="Weight of target genome assembly [1]",
                        default=1, type=float)
    parser.add_argument("-r", help="List of reference assembly weights (in quotes, "
                        "space separated, same order as the TSV files)",
                        required=True, type=str)
    parser.add_argument("-p", help="Output prefix [out]", default="out", type=str)
    parser.add_argument("-n", help="Minimum edge weight [1]", default=1, type=int)
    parser.add_argument("-k", help="Kmer size used for minimizer step",
                        required=True, type=int)
    parser.add_argument("-g", help="Minimum gap size (bp)", default=20, type=int)
    parser.add_argument("-G", help="Maximum gap size (bp) (0 = no maximum)",
                        default=0, type=int)
    parser.add_argument("--mkt", help="Use Mann-Kendall Test to orient contigs "
                        "(slower, overrides m)", action="store_true")
    parser.add_argument("-m", help="Require at least m%% of minimizer positions "
                        "to be increasing/decreasing to assign orientation [90]",
                        default=90, type=int)
    parser.add_argument("-t", help="Number of threads [1]", default=1, type=int)
    parser.add_argument("-v", "--version", action="version",
                        version="ntjoin-tpu 0.1.0")
    parser.add_argument("--agp", help="Output AGP file describing scaffolds",
                        action="store_true")
    parser.add_argument("--no_cut", help="Do not cut input contigs, place in "
                        "most representative path", action="store_true")
    parser.add_argument("--overlap", help="Attempt to detect and trim "
                        "overlapping joined sequences", action="store_true")
    parser.add_argument("--overlap_gap", help="Gap length between trimmed "
                        "overlapping segments [20]", type=int, default=20)
    parser.add_argument("--overlap_k", help="Kmer size for overlap minimizer "
                        "step [15]", type=int, default=15)
    parser.add_argument("--overlap_w", help="Window size for overlap minimizer "
                        "step [10]", type=int, default=10)
    parser.add_argument("--btllib_t", help="Reader/sketcher thread count "
                        "(accepted for CLI parity) [4]", type=int, default=4)

    if argv is None and len(sys.argv) == 1:
        parser.print_help()
        sys.exit()
    return parser.parse_args(argv)


def config_from_args(args) -> ScaffoldConfig:
    weights = [float(x) for x in re.split(r"\s+", args.r.strip())]
    return ScaffoldConfig(
        references=args.FILES,
        target=args.s,
        target_weight=args.l,
        reference_weights=weights,
        prefix=args.p,
        n=args.n,
        k=args.k,
        g=args.g,
        G=args.G,
        mkt=args.mkt,
        m=args.m,
        t=args.t,
        agp=args.agp,
        no_cut=args.no_cut,
        overlap=args.overlap,
        overlap_gap=args.overlap_gap,
        overlap_k=args.overlap_k,
        overlap_w=args.overlap_w,
        btllib_t=args.btllib_t,
    )


def main(argv=None):
    args = parse_arguments(argv)
    Scaffolder(config_from_args(args)).run()


if __name__ == "__main__":
    main()
