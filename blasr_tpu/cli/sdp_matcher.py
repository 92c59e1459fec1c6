"""sdpMatcher equivalent: standalone pairwise aligner.

Reference: utils/SDPMatcher.cpp — aligns query.fasta x target.fasta pairs
with SDP + per-pair printing.  Here each (query, target) pair runs the
full anchor->chain->guided-banded pipeline against a single-contig index
built from the target, printing m-format records.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from blasr_tpu.index import build_genome_index
from blasr_tpu.io import formats
from blasr_tpu.io.fasta import read_fasta
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.pipeline.select import store_map_qvs


def run(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="sdpMatcher")
    ap.add_argument("query", help="query fasta")
    ap.add_argument("target", help="target fasta")
    ap.add_argument("k", type=int, nargs="?", default=11,
                    help="tuple size (reference sdpTupleSize)")
    ap.add_argument("-local", action="store_true", dest="local")
    ap.add_argument("-m", dest="fmt", type=int, default=5)
    ap.add_argument("-indel", type=int, default=5)
    ap.add_argument("--out", default="-")
    args = ap.parse_args(argv)

    queries = read_fasta(args.query)
    targets = read_fasta(args.target)
    params = MappingParams(
        min_match_length=max(8, min(args.k, 16)),
        insertion=args.indel, deletion=args.indel,
        min_read_length=1,
    ).make_sane()
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    gi = build_genome_index(targets, k=params.min_match_length)
    mapper = Mapper(gi, params)
    results = mapper.map_reads(queries)
    for alns in results:
        store_map_qvs(alns, params)
        for a in alns[:1]:
            if args.fmt == 5:
                formats.write_m5(out, a, gi)
            elif args.fmt == 4:
                formats.write_m4(out, a)
            elif args.fmt == 1:
                formats.write_m1(out, a)
            else:
                formats.write_m0(out, a, gi)
    if out is not sys.stdout:
        out.close()
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
