"""loadPulses equivalent: add per-base pulse/QV datasets to a cmp.h5.

Reference: utils/LoadPulses.cpp (``loadPulses movies.fofn aligned.cmp.h5
-metrics QualityValue,InsertionQV,...``) — for every alignment in the
cmp.h5, the matching movie read's QV tracks are gathered onto alignment
columns (gap columns get 255) and stored next to the AlnArray.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List, Optional

import numpy as np

from blasr_tpu.io.cmph5 import ALN_COLUMNS, GAP, CmpH5
from blasr_tpu.io.fofn import expand_file_name_list
from blasr_tpu.io.hdf import BaxReader

DEFAULT_METRICS = ["QualityValue", "InsertionQV", "DeletionQV",
                   "SubstitutionQV"]


def run(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="loadPulses")
    ap.add_argument("movies", help="movie .h5 file or fofn")
    ap.add_argument("cmpH5", help="aligned cmp.h5 to annotate")
    ap.add_argument("-metrics", default=",".join(DEFAULT_METRICS))
    args = ap.parse_args(argv)
    metrics = [m for m in args.metrics.split(",") if m]

    # index all movie reads by (movie, hole)
    reads: Dict[tuple, dict] = {}
    for path in expand_file_name_list([args.movies]):
        rdr = BaxReader(path)
        try:
            for i in range(len(rdr.holes)):
                z = rdr.read_zmw(i)
                reads[(rdr.movie, z.hole)] = z.tracks
        finally:
            rdr.close()

    cmp = CmpH5.open(args.cmpH5)
    try:
        per_group: Dict[int, Dict[str, List[np.ndarray]]] = {}
        n = cmp.index.shape[0]
        gcol = ALN_COLUMNS.index("AlnGroupID")
        mcol = ALN_COLUMNS.index("MovieID")
        hcol = ALN_COLUMNS.index("HoleNumber")
        rcol = ALN_COLUMNS.index("rStart")
        for row in range(n):
            gid = int(cmp.index[row, gcol])
            movie = cmp.movie_names[int(cmp.index[row, mcol])]
            hole = int(cmp.index[row, hcol])
            r0 = int(cmp.index[row, rcol])
            arr = cmp.aln_array(row)
            consumes_q = (arr >> 4) != GAP
            qoff = r0 + np.cumsum(consumes_q) - consumes_q
            tracks = reads.get((movie, hole), {})
            bufs = per_group.setdefault(gid, {m: [] for m in metrics})
            for m in metrics:
                t = tracks.get(m)
                if t is None:
                    vals = np.full(len(arr), 255, np.uint8)
                else:
                    vals = np.where(
                        consumes_q,
                        np.asarray(t, np.uint8)[
                            np.clip(qoff, 0, len(t) - 1)],
                        np.uint8(255))
                bufs[m].append(vals.astype(np.uint8))
        for gid, bufs in per_group.items():
            path = cmp.group_paths[gid]
            for m, parts in bufs.items():
                data = (np.concatenate(parts) if parts
                        else np.zeros(0, np.uint8))
                if path + "/" + m in cmp.h5:
                    del cmp.h5[path + "/" + m]
                cmp.h5.create_dataset(path + "/" + m, data=data)
    finally:
        cmp.close()
    sys.stderr.write(f"annotated {args.cmpH5} with {metrics}\n")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
