"""Synthetic genome / PacBio-like read simulation.

The reference's cram tests run on PacBio-internal NFS data
(ctest/setup.sh DATDIR) which is unavailable here, so correctness and
benchmarks are established on simulated data with known ground truth:
random genomes and reads sampled with CLR-like error profiles
(~85% accuracy: insertions > deletions > substitutions, matching the
priors encoded at iblasr/MappingParameters.h readAccuracyPrior=0.85,
insertion=4 < deletion=5 asymmetry).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from blasr_tpu.io.fasta import FastaRecord, revcomp


def random_genome(length: int, seed: int = 0, n_contigs: int = 1,
                  names: Optional[List[str]] = None) -> List[FastaRecord]:
    rng = np.random.default_rng(seed)
    sizes = [length // n_contigs] * n_contigs
    sizes[-1] += length - sum(sizes)
    out = []
    for i, n in enumerate(sizes):
        name = names[i] if names else f"contig{i}"
        out.append(FastaRecord(name, rng.integers(0, 4, n, dtype=np.int8)))
    return out


@dataclass
class SimRead:
    rec: FastaRecord
    contig: int
    tstart: int     # true forward-genome interval
    tend: int
    strand: int


def mutate(seq: np.ndarray, rng: np.random.Generator,
           sub: float, ins: float, dele: float) -> np.ndarray:
    """Apply per-base substitution/insertion/deletion errors."""
    out = []
    n = len(seq)
    r = rng.random(n)
    subs = rng.integers(1, 4, n)
    ins_mask = rng.random(n) < ins
    ins_base = rng.integers(0, 4, n, dtype=np.int8)
    for i in range(n):
        x = seq[i]
        if r[i] < dele:
            pass  # deleted
        elif r[i] < dele + sub:
            out.append(np.int8((x + subs[i]) % 4))
        else:
            out.append(np.int8(x))
        if ins_mask[i]:
            out.append(ins_base[i])
    return np.array(out, dtype=np.int8) if out else np.zeros(0, dtype=np.int8)


def simulate_reads(
    contigs: List[FastaRecord],
    n_reads: int,
    read_len: Tuple[int, int] = (500, 3000),
    accuracy: float = 0.85,
    seed: int = 1,
    both_strands: bool = True,
) -> List[SimRead]:
    rng = np.random.default_rng(seed)
    err = 1.0 - accuracy
    # CLR-like split: ~50% ins, ~30% del, ~20% sub of total error
    ins, dele, sub = 0.5 * err, 0.3 * err, 0.2 * err
    lens = np.array([len(c.seq) for c in contigs])
    probs = lens / lens.sum()
    out: List[SimRead] = []
    for i in range(n_reads):
        ci = int(rng.choice(len(contigs), p=probs))
        g = contigs[ci].seq
        rl = int(rng.integers(read_len[0], read_len[1] + 1))
        rl = min(rl, len(g))
        ts = int(rng.integers(0, len(g) - rl + 1))
        frag = g[ts:ts + rl]
        strand = int(rng.integers(0, 2)) if both_strands else 0
        if strand:
            frag = revcomp(frag)
        seq = mutate(frag, rng, sub, ins, dele)
        name = f"sim/{i}/0_{len(seq)}"
        out.append(SimRead(FastaRecord(name, seq), ci, ts, ts + rl, strand))
    return out
