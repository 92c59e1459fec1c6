"""MapQV-chain parity: every candidate aligned (no DP truncation),
numSignificantClusters, cluster-size mapQV scaling, end-wiggle mismatch
penalty, and the alignment-level pruning family.

Reference contracts: iblasr/BlasrAlignImpl.hpp:391-488 and 553-607,
iblasr/BlasrUtilsImpl.hpp:97-106, 183-236, 344-366, 447-605.
"""

import numpy as np
import pytest

from blasr_tpu.index import build_genome_index
from blasr_tpu.io.fasta import FastaRecord
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Alignment, Mapper
from blasr_tpu.pipeline.select import (
    prune_alignments, scale_mapqv_by_cluster_size, select_alignments,
    store_map_qvs, zmw_rand_int)
from blasr_tpu.sim import random_genome


def mk(score, qstart=0, qend=100, tstart=0, **kw):
    d = dict(qname="r1", qlen=100, qstart=qstart, qend=qend, strand=0,
             tindex=0, tname="c0", tlen=100000, tstart=tstart,
             tend=tstart + (qend - qstart), score=score,
             n_match=90, n_mismatch=5, n_ins=3, n_del=2, cigar=[("M", 100)])
    d.update(kw)
    return Alignment(**d)


@pytest.fixture(scope="module")
def repeat_world():
    """40 kb genome with one 1.5 kb segment copied at 4 distant loci."""
    contigs = random_genome(40_000, seed=11)
    g = contigs[0].seq.copy()
    seg = g[5000:6500].copy()
    for pos in (15000, 25000, 35000):
        g[pos:pos + 1500] = seg
    contigs = [FastaRecord("contig0", g)]
    gi = build_genome_index(contigs, k=12)
    return contigs, gi, seg


def test_every_candidate_aligned_multihit(repeat_world):
    """A repeat read reports one hit per copy under --hitPolicy all
    --bestn 10 (the reference aligns every WeightedInterval), and its
    mapQV reflects the ambiguity (< 254)."""
    contigs, gi, seg = repeat_world
    read = FastaRecord("rep/1/0_1300", seg[100:1400].copy())
    params = MappingParams(hit_policy="all", n_best=10).make_sane()
    mapper = Mapper(gi, params, ShapeConfig(buckets=(2048,), batch_size=4,
                                            occ_per_pos=6))
    alns = mapper.map_reads([read])[0]
    store_map_qvs(alns, params, gi)
    sel = select_alignments(alns, params, zmw_rand_int(read.name, 0))
    starts = sorted(a.tstart for a in sel)
    # one alignment at each of the four copies
    assert len(sel) >= 4, f"only {len(sel)} hits for a 4-copy repeat"
    for want in (5100, 15100, 25100, 35100):
        assert any(abs(s - want) < 60 for s in starts), (want, starts)
    assert all(a.map_qv < 254 for a in sel), [a.map_qv for a in sel]
    # the four copies are indistinguishable: mapQV ~ Phred(3/4) ~ 6
    assert all(a.map_qv <= 10 for a in sel), [a.map_qv for a in sel]


def test_scale_mapqv_by_nclusters_fires(repeat_world):
    """--scaleMapQVByNClusters with nCandidates below the number of
    significant clusters scales confidence down (ScaleMapQVByClusterSize,
    BlasrUtilsImpl.hpp:97-106)."""
    contigs, gi, seg = repeat_world
    read = FastaRecord("rep/2/0_1300", seg[100:1400].copy())
    base = dict(hit_policy="all", n_best=1, n_candidates=1)
    p_off = MappingParams(**base).make_sane()
    p_on = MappingParams(
        scale_mapqv_by_num_significant_clusters=True, **base).make_sane()
    cfg = ShapeConfig(buckets=(2048,), batch_size=4, n_candidates=1,
                      occ_per_pos=6)
    mapper = Mapper(gi, p_off, cfg)
    alns = mapper.map_reads([read])[0]
    assert alns, "read did not map"
    assert alns[0].n_significant_clusters >= 4, (
        alns[0].n_significant_clusters)
    a_off = [Alignment(**{**a.__dict__}) for a in alns]
    store_map_qvs(a_off, p_off, gi)
    qv_off = max(x.map_qv for x in a_off)
    store_map_qvs(alns, p_on, gi)
    qv_on = max(x.map_qv for x in alns)
    assert qv_on < qv_off, (qv_on, qv_off)
    assert qv_on <= 10  # ~Phred(1/4)


def test_end_wiggle_mismatch_penalty():
    """A group member trimmed well short of the partition's widest member
    pays the SumMismatches penalty and loses mapQV ties."""
    params = MappingParams().make_sane()
    full = mk(-500, qstart=0, qend=100, tstart=1000)
    trimmed = mk(-500, qstart=30, qend=100, tstart=5000)
    store_map_qvs([full, trimmed], params)
    assert full.map_qv > trimmed.map_qv
    assert trimmed.map_qv == 0  # 30 uncovered bases -> overwhelming penalty
    # within the wiggle: no penalty, equal scores -> equal (low) mapQV
    a = mk(-500, qstart=0, qend=100, tstart=1000)
    b = mk(-500, qstart=3, qend=100, tstart=5000)
    store_map_qvs([a, b], params)
    assert a.map_qv == b.map_qv


def test_prune_score_cutoff():
    """RemoveLowQualityAlignments: the first score worse than maxScore
    cuts the tail of the score-sorted list (maxScore applies
    unconditionally, BlasrUtilsImpl.hpp:476-519)."""
    p = MappingParams().make_sane()
    alns = [mk(-500), mk(-300, tstart=5000), mk(-150, tstart=10000),
            mk(-100, tstart=20000)]
    out = prune_alignments(alns, p, read_len=100)
    assert [a.score for a in out] == [-500, -300]


def test_prune_overlapping_containment():
    """RemoveOverlappingAlignments: a same-contig alignment genomically
    contained in a better-scoring one is dropped."""
    p = MappingParams().make_sane()
    big = mk(-500, tstart=1000, tend=2000)
    inner = mk(-200, tstart=1200, tend=1400)
    other_contig = mk(-200, tstart=1200, tend=1400, tindex=1, tname="c1")
    out = prune_alignments([big, inner, other_contig], p, read_len=100)
    assert big in out and other_contig in out and inner not in out


def test_prune_low_matched_bases():
    """RemoveLowQualitySDPAlignments: cumulative matched bases must reach
    sdpTupleSize/50 * readLength (BlasrUtilsImpl.hpp:447-474)."""
    p = MappingParams().make_sane()  # expected = 11/50 * 1000 = 220
    weak = mk(-500, n_match=50)
    out = prune_alignments([weak], p, read_len=1000)
    assert out == []
    strong = mk(-500, n_match=800)
    out = prune_alignments([strong], p, read_len=1000)
    assert out == [strong]


def test_scale_mapqv_zero_clusters_zeroes():
    p = MappingParams().make_sane()
    a = mk(-500, map_qv=254, n_significant_clusters=0)
    scale_mapqv_by_cluster_size(a, p)
    assert a.map_qv == 0
    b = mk(-500, map_qv=254, n_significant_clusters=5)
    scale_mapqv_by_cluster_size(b, p)  # 5 <= nCandidates(10): unchanged
    assert b.map_qv == 254


def test_print_sam_qv_tags():
    """--printSAMQV emits the PacBio QV tags (iq/dq/sq/mq/dt/st),
    oriented and clipped with the record."""
    import io as _io
    from blasr_tpu.io import formats
    n = 100
    tracks = {
        "InsertionQV": np.arange(n) % 40,
        "DeletionQV": np.full(n, 7),
        "DeletionTag": np.full(n, ord("A")),
    }
    a = mk(-400, qstart=10, qend=90, tracks=tracks,
           read=np.zeros(100, np.int8))
    p = MappingParams(print_sam_qv=True, clipping="soft").make_sane()
    buf = _io.StringIO()
    formats.write_sam(buf, a, p)
    line = buf.getvalue()
    assert "iq:Z:" in line and "dq:Z:" in line and "dt:Z:" in line
    dq = [f for f in line.split("\t") if f.startswith("dq:Z:")][0][5:]
    assert dq == chr(7 + 33) * n
    # reverse strand: tag bases complemented
    b = mk(-400, qstart=10, qend=90, strand=1, tracks=tracks,
           read=np.zeros(100, np.int8))
    buf2 = _io.StringIO()
    formats.write_sam(buf2, b, p)
    dt = [f for f in buf2.getvalue().split("\t")
          if f.startswith("dt:Z:")][0][5:].strip()
    assert dt == "T" * n
    # off by default
    buf3 = _io.StringIO()
    formats.write_sam(buf3, a, MappingParams(clipping="soft").make_sane())
    assert "iq:Z:" not in buf3.getvalue()


def test_no_store_mapqv_and_print_only_best(tmp_path):
    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.fasta import write_fasta
    from blasr_tpu.sim import random_genome
    contigs = random_genome(30_000, seed=55)
    g = contigs[0].seq.copy()
    g[20000:21500] = g[5000:6500]  # two-copy repeat
    from blasr_tpu.io.fasta import FastaRecord
    contigs = [FastaRecord("contig0", g)]
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa",
                [FastaRecord("rep/1/0_1300", g[5100:6400].copy())])
    args = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4"]
    out1 = tmp_path / "a.m4"
    assert run(args + ["--out", str(out1)]) == 0
    lines = open(out1).read().splitlines()
    assert len(lines) >= 2                      # both copies reported
    assert all(int(l.split()[-1]) < 254 for l in lines)  # ambiguous mapQV
    out2 = tmp_path / "b.m4"
    assert run(args + ["--noStoreMapQV", "--out", str(out2)]) == 0
    assert all(int(l.split()[-1]) == 254
               for l in open(out2).read().splitlines())
    out3 = tmp_path / "c.m4"
    assert run(args + ["--printOnlyBest", "--out", str(out3)]) == 0
    assert len(open(out3).read().splitlines()) == 1
