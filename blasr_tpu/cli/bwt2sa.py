"""bwt2sa equivalent: BWT index -> suffix-array index.

Reference: extrautils/BwtToSuffixArray.cpp:33 (``bwt2sa in.bwt out.sa``).
Inverts the BWT to recover the concatenated genome, rebuilds the suffix
array (SA-IS), and writes a full sawriter-style .npz index.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from blasr_tpu.index.bwt import invert_bwt, load_bwt
from blasr_tpu.index.genome import build_genome_index
from blasr_tpu.io.fasta import FastaRecord


def contigs_from_concat(genome: np.ndarray, names, lengths):
    """Split a concatenated (N-spaced) genome back into contig records."""
    out, off = [], 0
    for name, ln in zip(names, lengths):
        out.append(FastaRecord(name, np.asarray(genome[off:off + ln],
                                                dtype=np.int8)))
        off += ln + 1  # single-N spacer
    return out


def run(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="bwt2sa")
    ap.add_argument("bwtIn", help="BWT index (.npz)")
    ap.add_argument("saOut", help="output sawriter index (.npz)")
    ap.add_argument("-kmer", type=int, default=12)
    args = ap.parse_args(argv)

    bwt, counts, names, lengths = load_bwt(args.bwtIn)
    genome = invert_bwt(bwt, counts)
    contigs = contigs_from_concat(genome, names, lengths)
    gi = build_genome_index(contigs, k=args.kmer, with_suffix_array=True)
    out = args.saOut
    if out.endswith(".npz"):
        out = out[:-4]
    gi.save(out)
    sys.stderr.write(f"wrote {out}.npz ({gi.glen} bp)\n")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
