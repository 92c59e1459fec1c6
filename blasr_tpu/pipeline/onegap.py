"""One-gap alignment — the reference's ``OneGapAlignment`` role.

Reference: --onegap / separateGaps (RegisterBlasrOptions.h:41; used in
AlignIntervals when the target gap dwarfs the query gap,
BlasrAlignImpl.hpp:892-896): an alignment is allowed to jump one large
(intron-like) target gap without paying per-base deletion costs.

TPU-shaped realization: large target gaps split a read's hit into two
*collinear candidate alignments* (the banded kernel's slope-limited band
can't absorb them, so the chain produces two candidates).  ``join_one_gap``
merges such a pair into one alignment whose CIGAR carries a single 'N'
(skip) run — the alignment the reference's OneGapAlignment would have
produced, priced as one gap event instead of per-base deletions.
"""

from __future__ import annotations

from typing import List

from blasr_tpu.pipeline.map_read import Alignment

MAX_ONE_GAP = 100_000


def _trim_query_start(a: Alignment, n: int):
    """Drop the first n query-consuming columns (must be plain matches)."""
    if not a.cigar or a.cigar[0][0] not in "M=" or a.cigar[0][1] <= n:
        return None
    import dataclasses
    op, cnt = a.cigar[0]
    return dataclasses.replace(
        a, qstart=a.qstart + n, tstart=a.tstart + n,
        n_match=a.n_match - n, score=a.score + 5 * n,
        cigar=[(op, cnt - n)] + a.cigar[1:])


def join_one_gap(alns: List[Alignment], params) -> List[Alignment]:
    """Merge collinear same-strand alignment pairs of one read that are
    separated by a large target gap and a small query gap."""
    if len(alns) < 2:
        return alns
    alns = sorted(alns, key=lambda a: (a.strand, a.tindex, a.qstart))
    out: List[Alignment] = []
    used = [False] * len(alns)
    for i, a in enumerate(alns):
        if used[i]:
            continue
        merged = a
        for j in range(i + 1, len(alns)):
            b = alns[j]
            if used[j]:
                continue
            if (b.strand != merged.strand or b.tindex != merged.tindex):
                continue
            q_gap = b.qstart - merged.qend
            # one-gap criterion: query nearly contiguous (overlaps from the
            # span widening are trimmed as long as they stay a minority of
            # the shorter piece — larger overlaps mean alternative
            # placements of the same region, not a spliced continuation)
            shorter = min(merged.qend - merged.qstart, b.qend - b.qstart)
            if not (-256 <= q_gap <= 50 and -q_gap < 0.5 * shorter):
                continue
            if merged.strand == 1:
                # strand-local CIGAR order is reversed wrt forward-read
                # coordinates; only join forward-strand pairs here
                continue
            if q_gap < 0:
                from blasr_tpu.pipeline.longread import \
                    trim_cigar_query_start
                trimmed = trim_cigar_query_start(b.cigar or [], -q_gap)
                if trimmed is None:
                    continue
                new_cigar, q_rm, t_rm, (m_rm, i_rm) = trimmed
                import dataclasses as _dc
                b = _dc.replace(
                    b, qstart=b.qstart + q_rm, tstart=b.tstart + t_rm,
                    n_match=max(b.n_match - m_rm, 0),
                    n_ins=max(b.n_ins - i_rm, 0),
                    score=b.score + 5 * m_rm, cigar=new_cigar)
                q_gap = 0
            t_gap = b.tstart - merged.tend
            if not (max(q_gap, 0) * 4 < t_gap <= MAX_ONE_GAP):
                continue
            gap_cigar = []
            if q_gap:
                gap_cigar.append(("I", q_gap))
            gap_cigar.append(("N", t_gap))
            merged = Alignment(
                qname=merged.qname, qlen=merged.qlen,
                qstart=merged.qstart, qend=b.qend,
                strand=merged.strand, tindex=merged.tindex,
                tname=merged.tname, tlen=merged.tlen,
                tstart=merged.tstart, tend=b.tend,
                score=merged.score + b.score + params.affine_open,
                n_match=merged.n_match + b.n_match,
                n_mismatch=merged.n_mismatch + b.n_mismatch,
                n_ins=merged.n_ins + b.n_ins + q_gap,
                n_del=merged.n_del + b.n_del,
                cigar=(merged.cigar or []) + gap_cigar + (b.cigar or []),
                read=merged.read, qual=merged.qual,
                n_candidates=merged.n_candidates,
            )
            used[j] = True
        out.append(merged)
    return out
