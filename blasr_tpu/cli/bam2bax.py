"""bam2bax equivalent: PacBio subread BAM -> bax.h5 round trip.

Reference: utils/bam2bax/src — reconstructs a movie HDF5 from subread
BAM records: per-ZMW basecalls are re-concatenated from the subreads (gaps
zero-filled), QV tag tracks become BaseCalls datasets, and the region
table is rebuilt (Insert region per subread, HQ region spanning them).
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from blasr_tpu.io.bam import read_bam
from blasr_tpu.io.hdf import REGION_TYPES, ZmwRead, write_bax

_TRACK_OF_TAG = {
    "iq": "InsertionQV", "dq": "DeletionQV", "sq": "SubstitutionQV",
    "mq": "MergeQV", "dt": "DeletionTag", "st": "SubstitutionTag",
}


def run(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="bam2bax")
    ap.add_argument("bam", help="subreads BAM")
    ap.add_argument("-o", "--output", default="out",
                    help="output prefix (.bax.h5 appended)")
    args = ap.parse_args(argv)

    _, _, _, records = read_bam(args.bam)
    per_hole: Dict[int, List] = defaultdict(list)
    movie = "movie"
    for r in records:
        parts = r.qname.split("/")
        if len(parts) >= 3 and "_" in parts[2]:
            movie = parts[0]
            hole = int(parts[1])
            s, e = (int(x) for x in parts[2].split("_"))
        else:
            hole = int(r.tags.get("zm", len(per_hole)))
            s = int(r.tags.get("qs", 0))
            e = int(r.tags.get("qe", s + len(r.seq)))
        per_hole[hole].append((s, e, r))

    zmws: List[ZmwRead] = []
    regions: List[List[int]] = []
    ins_id = REGION_TYPES.index("Insert")
    hq_id = REGION_TYPES.index("HQRegion")
    for hole in sorted(per_hole):
        subs = sorted(per_hole[hole])
        total = max(e for _, e, _ in subs)
        seq = np.full(total, 4, np.int8)
        tracks: Dict[str, np.ndarray] = {}
        any_qual = any(r.qual is not None for _, _, r in subs)
        if any_qual:
            tracks["QualityValue"] = np.zeros(total, np.uint8)
        tag_names = set()
        for _, _, r in subs:
            tag_names.update(t for t in r.tags if t in _TRACK_OF_TAG)
        for t in tag_names:
            tracks[_TRACK_OF_TAG[t]] = np.zeros(total, np.uint8)
        for s, e, r in subs:
            seq[s:e] = r.seq[: e - s]
            if r.qual is not None and "QualityValue" in tracks:
                tracks["QualityValue"][s:e] = np.minimum(
                    r.qual[: e - s], 255).astype(np.uint8)
            for t in tag_names:
                if t in r.tags:
                    v = np.frombuffer(str(r.tags[t]).encode(),
                                      np.uint8).astype(np.int32) - 33
                    tracks[_TRACK_OF_TAG[t]][s:e] = v[: e - s].astype(
                        np.uint8)
            regions.append([hole, ins_id, s, e, -1])
        regions.append([hole, hq_id, subs[0][0], subs[-1][1], 800])
        zmws.append(ZmwRead(hole, seq, tracks))

    out_path = args.output + ".bax.h5"
    write_bax(out_path, movie, zmws, np.asarray(regions, np.int32))
    sys.stderr.write(f"wrote {out_path} ({len(zmws)} ZMWs)\n")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
