"""bax2bam equivalent: movie .h5 -> unaligned PacBio-style subread BAM.

Reference: utils/bax2bam/src — converts bax.h5 into subread / hqregion /
polymerase BAMs with QV tag tracks.  Modes mirrored: --subread (default),
--hqregion, --polymeraseread, --ccs; QV tracks ride as PacBio Z-string
tags (iq/dq/sq/mq, dt/st tags) on unaligned records (flag 4).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from blasr_tpu.io.bam import BamRecord, BamWriter
from blasr_tpu.io.fofn import expand_file_name_list
from blasr_tpu.io.hdf import BaxReader

_TAG_OF_TRACK = {
    "InsertionQV": "iq", "DeletionQV": "dq", "SubstitutionQV": "sq",
    "MergeQV": "mq", "DeletionTag": "dt", "SubstitutionTag": "st",
}


def _qv_string(v: np.ndarray) -> str:
    return "".join(chr(min(int(x), 93) + 33) for x in v)


def run(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="bax2bam")
    ap.add_argument("inputs", nargs="+", help="movie .h5 files (or fofn)")
    ap.add_argument("-o", "--output", default="out",
                    help="output prefix (.subreads.bam etc appended)")
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--subread", action="store_true", default=True)
    mode.add_argument("--hqregion", action="store_true")
    mode.add_argument("--polymeraseread", action="store_true")
    mode.add_argument("--ccs", action="store_true")
    args = ap.parse_args(argv)

    if args.hqregion:
        suffix, split, use_regions = ".hqregions.bam", False, True
    elif args.polymeraseread:
        suffix, split, use_regions = ".polymerase.bam", False, False
    elif args.ccs:
        suffix, split, use_regions = ".ccs.bam", False, False
    else:
        suffix, split, use_regions = ".subreads.bam", True, True

    out_path = args.output + suffix
    movie = None
    records: List[BamRecord] = []
    for path in expand_file_name_list(list(args.inputs)):
        rdr = BaxReader(path)
        try:
            movie = movie or rdr.movie
            for i in range(len(rdr.holes)):
                z = rdr.read_zmw(i)
                rt = rdr.region_table
                if use_regions and rt is not None:
                    ivals = rt.subread_intervals(z.hole, split=split)
                else:
                    ivals = [(0, len(z.seq))] if len(z.seq) else []
                for s, e in ivals:
                    e = min(e, len(z.seq))
                    if e <= s:
                        continue
                    tags = {"RG": movie, "zm": int(z.hole),
                            "qs": int(s), "qe": int(e), "np": 1}
                    for track, tag in _TAG_OF_TRACK.items():
                        if track in z.tracks:
                            tags[tag] = _qv_string(z.tracks[track][s:e])
                    qual = None
                    if "QualityValue" in z.tracks:
                        qual = z.tracks["QualityValue"][s:e].astype(np.int32)
                    records.append(BamRecord(
                        qname=f"{movie}/{z.hole}/{s}_{e}", flag=4,
                        ref_id=-1, pos=-1, mapq=255, cigar=[],
                        seq=z.seq[s:e], qual=qual, tags=tags))
        finally:
            rdr.close()

    header = ("@HD\tVN:1.5\tSO:unknown\tpb:3.0.1\n"
              f"@RG\tID:{movie}\tPL:PACBIO\tDS:READTYPE=SUBREAD\n"
              f"@PG\tID:bax2bam\tPN:bax2bam\n")
    with open(out_path, "wb") as f:
        w = BamWriter(f, header, [], [])
        for r in records:
            w.write_record(r)
        w.close()
    sys.stderr.write(f"wrote {out_path} ({len(records)} records)\n")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
