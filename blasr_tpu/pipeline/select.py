"""Alignment scoring aftermath: mapQV, filter criteria, hit policies.

Re-derivations of the reference's ``StoreMapQVs``
(iblasr/BlasrUtilsImpl.hpp:108-309), ``FilterCriteria`` / ``HitPolicy``
(datastructures/alignment/FilterCriteria usage at
BlasrUtilsImpl.hpp:925-947), and the per-ZMW deterministic random int
(Blasr.cpp:192-194) that makes random/randombest reproducible at any
parallelism degree (ctest/hitpolicy.t contract).
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
from typing import List, Sequence

import numpy as np

from blasr_tpu.params import MAX_PHRED_SCORE, MappingParams
from blasr_tpu.pipeline.map_read import Alignment

# score -> log-prob scale: Phred-like, ln(10)/10 per score unit
_LAMBDA = math.log(10.0) / 10.0


def zmw_rand_int(qname: str, seed: int) -> int:
    """Deterministic per-read random int, independent of batch shape and
    parallelism (counter-based equivalent of the reference's reader-drawn
    associatedRandInt)."""
    h = hashlib.sha256(f"{seed}:{qname}".encode()).digest()
    return int.from_bytes(h[:8], "little")


def _overlap_frac(a: Alignment, b: Alignment) -> float:
    lo = max(a.qstart, b.qstart)
    hi = min(a.qend, b.qend)
    if hi <= lo:
        return 0.0
    return (hi - lo) / max(1, min(a.qend - a.qstart, b.qend - b.qstart))


def partition_overlapping(alns: Sequence[Alignment],
                          min_frac: float) -> List[List[int]]:
    """Group alignment indices whose query intervals overlap by >= min_frac
    (PartitionOverlappingAlignments, BlasrUtilsImpl.hpp:411-444)."""
    groups: List[List[int]] = []
    for i, a in enumerate(alns):
        placed = False
        for g in groups:
            if any(_overlap_frac(a, alns[j]) >= min_frac for j in g):
                g.append(i)
                placed = True
                break
        if not placed:
            groups.append([i])
    return groups


def _log10_likelihood(a: Alignment, params: MappingParams, gi) -> float:
    """Rescore one alignment as log10 P(read | placement) — the
    SMRTLogProbMatrix rescore (BlasrUtilsImpl.hpp:117-130).  Falls back to
    a score-proportional likelihood when the CIGAR/genome is unavailable."""
    if gi is None or not a.cigar or a.read is None:
        return -a.score * _LAMBDA / math.log(10.0)
    if getattr(params, "ignore_qualities", True):
        a = dataclasses.replace(a, qual=None, tracks=None)
    from blasr_tpu.io.fasta import revcomp
    from blasr_tpu.pipeline.scoring import QVTracks, log10_prob_alignment
    rc = a.strand == 1

    def orient(v):
        if v is None:
            return None
        return v[::-1] if rc else v

    if not rc:
        oread, qa = a.read, a.qstart
    else:
        oread, qa = revcomp(a.read), a.qlen - a.qend
    qual = orient(a.qual)
    gs = gi.seqdb.chrom_to_genome(a.tindex, a.tstart)
    ge = gi.seqdb.chrom_to_genome(a.tindex, a.tend)
    t = a.tracks or {}
    tracks = QVTracks(qual=qual,
                      ins_qv=orient(t.get("InsertionQV")),
                      del_qv=orient(t.get("DeletionQV")),
                      sub_qv=orient(t.get("SubstitutionQV")))
    return log10_prob_alignment(a.cigar, oread, gi.genome[gs:ge], qa, 0,
                                tracks, params.read_accuracy_prior)


def store_map_qvs(alns: List[Alignment], params: MappingParams,
                  gi=None) -> None:
    """Assign mapQV per alignment: Phred of 1 - P(this | its overlap group),
    with P from a log-sum-exp over log-prob-rescored group members
    (StoreMapQVs, BlasrUtilsImpl.hpp:236-304)."""
    if not alns:
        return
    groups = partition_overlapping(alns, params.min_fraction_to_be_considered_overlapping)
    for g in groups:
        if len(g) == 1:
            alns[g[0]].map_qv = MAX_PHRED_SCORE
            continue
        lls = np.array([_log10_likelihood(alns[i], params, gi) for i in g])
        mx = lls.max()
        lse = mx + math.log10(np.power(10.0, lls - mx).sum())
        for k, i in enumerate(g):
            p = 10.0 ** (lls[k] - lse)
            if p >= 1.0:
                qv = MAX_PHRED_SCORE
            else:
                qv = int(round(-10.0 * math.log10(max(1.0 - p, 1e-26))))
            alns[i].map_qv = min(MAX_PHRED_SCORE, max(0, qv))
    if params.scale_mapqv_by_num_significant_clusters:
        scale_mapqv_by_cluster_size(alns)


def scale_mapqv_by_cluster_size(alns: List[Alignment]) -> None:
    """ScaleMapQVByClusterSize (BlasrUtilsImpl.hpp:97-106): reads whose
    anchor distribution shows many significant clusters get scaled-down
    confidence."""
    for a in alns:
        n = max(1, a.n_significant_clusters)
        if n > 1:
            a.map_qv = int(a.map_qv / n)


def pct_accuracy(a: Alignment) -> float:
    n = a.n_match + a.n_mismatch + a.n_ins + a.n_del
    return 100.0 * a.n_match / n if n else 0.0


def satisfies_filters(a: Alignment, params: MappingParams) -> bool:
    """FilterCriteria.Satisfy (RegisterFilterOptions.h semantics)."""
    if a.qend - a.qstart < params.min_aln_length:
        return False
    if a.pct_similarity < params.min_pct_similarity:
        return False
    if pct_accuracy(a) < params.min_pct_accuracy:
        return False
    if params.use_score_cutoff and a.score > params.max_score:
        return False
    return True


def _sort_key(a: Alignment):
    # lower score is better; deterministic tie-break
    return (a.score, a.tindex, a.tstart, a.strand, a.qstart)


def select_alignments(
    alns: List[Alignment], params: MappingParams, rand_int: int,
) -> List[Alignment]:
    """SelectAlignmentsToPrint (BlasrUtilsImpl.hpp:925-947): sort by score,
    filter, truncate to nBest, apply hit policy with the read's
    deterministic random int."""
    alns = sorted(alns, key=_sort_key)
    alns = [a for a in alns if satisfies_filters(a, params)]
    if not alns:
        return []
    alns = alns[: params.n_best]
    policy = params.hit_policy
    if policy == "all":
        return alns
    best = alns[0].score
    best_set = [a for a in alns if a.score == best]
    if policy == "allbest":
        return best_set
    if policy == "leftmost":
        return [min(alns, key=lambda a: (a.tindex, a.tstart, a.strand))]
    if policy == "random":
        return [alns[rand_int % len(alns)]]
    if policy == "randombest":
        return [best_set[rand_int % len(best_set)]]
    raise ValueError(f"unknown hit policy {policy!r}")
