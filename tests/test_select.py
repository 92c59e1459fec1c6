"""Filter criteria, hit policies, mapQV, deterministic per-read RNG."""

import numpy as np

from blasr_tpu.params import MappingParams
from blasr_tpu.pipeline.map_read import Alignment
from blasr_tpu.pipeline.select import (
    partition_overlapping, select_alignments, store_map_qvs, zmw_rand_int)


def mk(score, qstart=0, qend=100, tstart=0, **kw):
    d = dict(qname="r1", qlen=100, qstart=qstart, qend=qend, strand=0,
             tindex=0, tname="c0", tlen=10000, tstart=tstart,
             tend=tstart + (qend - qstart), score=score,
             n_match=90, n_mismatch=5, n_ins=3, n_del=2)
    d.update(kw)
    return Alignment(**d)


def test_zmw_rand_int_deterministic():
    a = zmw_rand_int("movie/42/0_1000", 1)
    b = zmw_rand_int("movie/42/0_1000", 1)
    c = zmw_rand_int("movie/43/0_1000", 1)
    assert a == b
    assert a != c
    assert zmw_rand_int("movie/42/0_1000", 2) != a


def test_hit_policy_all_sorted():
    p = MappingParams(hit_policy="all").make_sane()
    alns = [mk(-100), mk(-300), mk(-200)]
    out = select_alignments(alns, p, 0)
    assert [a.score for a in out] == [-300, -200, -100]


def test_hit_policy_allbest():
    p = MappingParams(hit_policy="allbest").make_sane()
    alns = [mk(-300, tstart=10), mk(-300, tstart=99), mk(-200)]
    out = select_alignments(alns, p, 0)
    assert len(out) == 2
    assert all(a.score == -300 for a in out)


def test_hit_policy_randombest_deterministic():
    p = MappingParams(hit_policy="randombest").make_sane()
    alns = [mk(-300, tstart=10), mk(-300, tstart=99), mk(-200)]
    r = zmw_rand_int("z", 1)
    out1 = select_alignments(list(alns), p, r)
    out2 = select_alignments(list(reversed(alns)), p, r)
    assert len(out1) == 1 and len(out2) == 1
    assert out1[0].tstart == out2[0].tstart  # order-independent
    assert out1[0].score == -300


def test_nbest_truncation():
    p = MappingParams(n_best=2).make_sane()
    alns = [mk(-100), mk(-300), mk(-200)]
    out = select_alignments(alns, p, 0)
    assert [a.score for a in out] == [-300, -200]


def test_filter_min_aln_length():
    p = MappingParams(min_aln_length=200).make_sane()
    assert select_alignments([mk(-300)], p, 0) == []


def test_filter_pct_similarity():
    p = MappingParams(min_pct_similarity=95.0).make_sane()
    assert select_alignments([mk(-300)], p, 0) == []  # 90% < 95%
    p2 = MappingParams(min_pct_similarity=80.0).make_sane()
    assert len(select_alignments([mk(-300)], p2, 0)) == 1


def test_score_cutoff():
    p = MappingParams(use_score_cutoff=True, max_score=-200).make_sane()
    out = select_alignments([mk(-100), mk(-250)], p, 0)
    assert [a.score for a in out] == [-250]


def test_partition_overlapping():
    a = mk(-300, qstart=0, qend=100)
    b = mk(-290, qstart=10, qend=95)   # overlaps a
    c = mk(-100, qstart=0, qend=100, tstart=5000)  # overlaps a on query
    groups = partition_overlapping([a, b, c], 0.75)
    assert len(groups) == 1 and sorted(groups[0]) == [0, 1, 2]


def test_mapqv_unique_is_max():
    p = MappingParams().make_sane()
    alns = [mk(-300)]
    store_map_qvs(alns, p)
    assert alns[0].map_qv == 254


def test_mapqv_competition_lowers_qv():
    p = MappingParams().make_sane()
    # two equally-scoring overlapping alignments -> ~p=0.5 -> qv ~ 3
    alns = [mk(-300, tstart=0), mk(-300, tstart=5000)]
    store_map_qvs(alns, p)
    assert alns[0].map_qv <= 3
    assert alns[0].map_qv == alns[1].map_qv
    # distant second -> high qv for the best
    alns2 = [mk(-300, tstart=0), mk(-100, tstart=5000)]
    store_map_qvs(alns2, p)
    assert alns2[0].map_qv > 40
    assert alns2[1].map_qv == 0
