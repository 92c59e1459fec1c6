"""Ultra-long reads: segment + stitch (reads beyond the largest length
bucket map fully, like the reference's unbounded per-read allocation)."""

import numpy as np
import pytest

from blasr_tpu.index import build_genome_index
from blasr_tpu.io.fasta import FastaRecord, revcomp
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.longread import (split_read, trim_cigar_query_start,
                                         trim_cigar_target_start)
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.sim import random_genome


def test_split_read_covers_with_overlap():
    rec = FastaRecord("r", np.zeros(5000, np.int8))
    segs = split_read(rec, 2048, overlap=512)
    assert segs[0][0] == 0
    ends = [off + len(s.seq) for off, s in segs]
    assert ends[-1] == 5000
    for (o1, s1), (o2, _) in zip(segs, segs[1:]):
        assert o2 < o1 + len(s1.seq)  # overlapping
        assert o2 == o1 + 2048 - 512


def test_trim_cigar_query_start():
    c = [("M", 10), ("I", 3), ("D", 2), ("M", 5)]
    out = trim_cigar_query_start(c, 11)
    assert out is not None
    new, q_rm, t_rm, (m_rm, i_rm) = out
    assert q_rm == 11 and m_rm == 10 and i_rm == 1
    assert new == [("I", 2), ("D", 2), ("M", 5)] and t_rm == 10
    # trimming exactly through the I run absorbs the following D
    new2, q2, t2, _ = trim_cigar_query_start(c, 13)
    assert new2 == [("M", 5)] and q2 == 13 and t2 == 12
    assert trim_cigar_query_start([("M", 3)], 5) is None


def test_trim_cigar_target_start():
    c = [("M", 4), ("I", 2), ("D", 3), ("M", 5)]
    out = trim_cigar_target_start(c, 6)
    assert out is not None
    new, q_rm, m_rm = out
    # 4 M (q+t) + swallowed 2 I (q) + 2 of the D (t)
    assert new == [("D", 1), ("M", 5)] and q_rm == 6 and m_rm == 4
    assert trim_cigar_target_start([("M", 3)], 5) is None


@pytest.mark.parametrize("rc", [False, True])
def test_long_read_maps_full_span(rc):
    contigs = random_genome(60_000, seed=141)
    gi = build_genome_index(contigs, k=12)
    g = contigs[0].seq
    read = g[5_000:10_500].copy()          # 5.5 kb, bucket cap 2048
    rng = np.random.default_rng(142)
    idx = rng.random(len(read)) < 0.04
    read[idx] = rng.integers(0, 4, int(idx.sum()))
    if rc:
        read = revcomp(read)
    p = MappingParams(min_read_length=50).make_sane()
    m = Mapper(gi, p, ShapeConfig(buckets=(1024, 2048), batch_size=8))
    res = m.map_reads([FastaRecord("long/0/0_5500", read)])
    alns = res[0]
    assert alns
    best = min(alns, key=lambda a: a.score)
    # the stitched alignment covers most of the read and the true locus
    assert best.qend - best.qstart > 4500
    assert abs(best.tstart - 5_000) < 600
    assert abs(best.tend - 10_500) < 600
    assert best.strand == (1 if rc else 0)
    qc = sum(n for op, n in best.cigar if op in "MI=X")
    tc = sum(n for op, n in best.cigar if op in "MD=XN")
    qa = best.qstart if best.strand == 0 else best.qlen - best.qend
    qb = best.qend if best.strand == 0 else best.qlen - best.qstart
    assert qc == qb - qa
    assert tc == best.tend - best.tstart


@pytest.mark.parametrize("rc", [False, True])
def test_20kb_clr_error_read_stitches_full_span(rc):
    """Round-5 VERDICT #3 regression: a ~20 kb read at ~85% accuracy
    (indel-heavy CLR profile, errors crossing every segment boundary)
    must stitch into ONE full-span alignment at the true locus, with
    CIGAR invariants intact and no adjacent I/D runs at the bridges."""
    from blasr_tpu.sim import mutate

    contigs = random_genome(300_000, seed=181)
    gi = build_genome_index(contigs, k=12)
    g = contigs[0].seq
    rng = np.random.default_rng(182)
    ts, tl = 40_000, 20_000
    frag = g[ts:ts + tl]
    if rc:
        frag = revcomp(frag)
    err = 0.15
    read = mutate(frag, rng, 0.2 * err, 0.5 * err, 0.3 * err)
    p = MappingParams(min_read_length=50).make_sane()
    m = Mapper(gi, p, ShapeConfig(buckets=(1024, 2048), batch_size=8))
    res = m.map_reads([FastaRecord(f"clr/0/0_{len(read)}", read)])
    alns = res[0]
    assert alns
    best = min(alns, key=lambda a: a.score)
    L = len(read)
    assert best.strand == (1 if rc else 0)
    span = best.qend - best.qstart
    assert span >= 0.97 * L, f"span {span}/{L}"
    proj = best.tstart - (best.qstart if best.strand == 0
                          else L - best.qend)
    assert abs(proj - ts) < 300
    assert abs(best.tend - (ts + tl)) < 300
    qc = sum(n for op, n in best.cigar if op in "MI=X")
    tc = sum(n for op, n in best.cigar if op in "MD=XN")
    qa = best.qstart if best.strand == 0 else L - best.qend
    qb = best.qend if best.strand == 0 else L - best.qstart
    assert qc == qb - qa
    assert tc == best.tend - best.tstart
    ops = "".join(op for op, _ in best.cigar)
    assert "ID" not in ops and "DI" not in ops
    # stats sanity (exact CIGAR-vs-stats identity does not hold: bridge
    # I/D pairs fold into M columns at the printer level, the reference's
    # own MergeAdjacentIndels-vs-ComputeAlignmentStats split)
    assert best.n_match > 0.6 * L
    assert 0 < best.pct_similarity <= 100
