"""Extension (ExtendAlign) and QV-aware score-function tests
(iblasr/BlasrAlignImpl.hpp:1011-1203; score functions
BlasrAlignImpl.hpp:1241-1253)."""

import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.pipeline.scoring import (
    QVTracks, expand_cigar, log10_prob_alignment, score_alignment_distance,
    score_alignment_ids, score_alignment_qv)
from blasr_tpu.pipeline.select import store_map_qvs
from blasr_tpu.sim import random_genome, simulate_reads


def test_expand_cigar_coords():
    opc, qidx, tidx = expand_cigar([("M", 3), ("I", 2), ("D", 1), ("M", 1)],
                                   10, 100)
    assert list(opc) == [0, 0, 0, 1, 1, 2, 0]
    # non-consuming columns point at the NEXT position on their side
    # (deletion columns price the following base's deletion QV)
    assert list(qidx) == [10, 11, 12, 13, 14, 15, 15]
    assert list(tidx) == [100, 101, 102, 103, 103, 103, 104]


def test_distance_score_matches_manual():
    q = np.array([0, 1, 2, 3, 0, 1], np.int8)
    t = np.array([0, 1, 2, 2, 0, 1], np.int8)
    m = MappingParams().make_sane().score_matrix
    s = score_alignment_distance([("M", 6)], q, t, 0, 0,
                                 score_matrix=m, ins=4, dele=5)
    assert s == 5 * (-5) + 6  # 5 matches, 1 mismatch
    s2 = score_alignment_distance([("M", 3), ("I", 2), ("M", 1)],
                                  q, t[:4], 0, 0,
                                  score_matrix=m, ins=4, dele=5)
    assert s2 == 3 * (-5) + 2 * 4 + 6  # 3 matches, 2 ins, then a mismatch


def test_qv_and_ids_scores_penalize_errors():
    q = np.array([0, 1, 2, 3], np.int8)
    t = np.array([0, 1, 0, 3], np.int8)   # one mismatch at col 2
    qv = np.array([30, 30, 10, 30])
    s_low = score_alignment_qv([("M", 4)], q, t, 0, 0, qv)
    assert s_low == 10.0  # mismatch priced at its own QV
    tracks = QVTracks(qual=qv, sub_qv=np.array([5, 5, 5, 5]))
    s_ids = score_alignment_ids([("M", 4)], q, t, 0, 0, tracks)
    assert s_ids == 5.0
    s_prior = score_alignment_ids([("M", 4)], q, t, 0, 0, QVTracks())
    assert s_prior == 20.0  # substitutionPrior


def test_log_prob_orders_by_quality():
    q = np.array([0, 1, 2, 3] * 5, np.int8)
    t_good = q.copy()
    t_bad = q.copy()
    t_bad[::4] = (t_bad[::4] + 1) % 4
    lp_good = log10_prob_alignment([("M", 20)], q, t_good, 0, 0)
    lp_bad = log10_prob_alignment([("M", 20)], q, t_bad, 0, 0)
    assert lp_good > lp_bad


def test_mapqv_discriminates_with_logprob(small_index):
    # two near-identical placements -> low mapQV; unique -> 254
    from blasr_tpu.pipeline.map_read import Alignment
    q = np.zeros(100, np.int8)
    a1 = Alignment("r", 100, 0, 100, 0, 0, "c", 1000, 0, 100, -500,
                   100, 0, 0, 0, cigar=[("M", 100)], read=q)
    a2 = Alignment("r", 100, 0, 100, 0, 0, "c", 1000, 500, 600, -500,
                   98, 2, 0, 0, cigar=[("M", 100)], read=q)
    p = MappingParams().make_sane()
    store_map_qvs([a1, a2], p)
    assert a1.map_qv < 254


def test_extend_recovers_trimmed_ends():
    contigs = random_genome(60_000, seed=51)
    gi = build_genome_index(contigs, k=12)
    sims = simulate_reads(contigs, 6, read_len=(400, 700), accuracy=0.9,
                          seed=52)
    p = MappingParams(extend_alignments=True, min_read_length=50).make_sane()
    m_ext = Mapper(gi, p, ShapeConfig(buckets=(1024,), batch_size=8))
    p0 = MappingParams(min_read_length=50).make_sane()
    m_no = Mapper(gi, p0, ShapeConfig(buckets=(1024,), batch_size=8))
    recs = [s.rec for s in sims]
    r_ext = m_ext.map_reads(recs)
    r_no = m_no.map_reads(recs)
    spans_ext = sum((a.qend - a.qstart) for alns in r_ext for a in alns[:1])
    spans_no = sum((a.qend - a.qstart) for alns in r_no for a in alns[:1])
    assert spans_ext >= spans_no
    # invariants hold after extension
    for alns in r_ext:
        for a in alns:
            qc = sum(n for op, n in a.cigar if op in "MI=X")
            tc = sum(n for op, n in a.cigar if op in "MD=X")
            qa = a.qstart if a.strand == 0 else a.qlen - a.qend
            qb = a.qend if a.strand == 0 else a.qlen - a.qstart
            assert qc == qb - qa
            assert tc == a.tend - a.tstart
            assert 0 <= a.qstart <= a.qend <= a.qlen
            assert 0 <= a.tstart <= a.tend <= a.tlen


def test_bam_qv_tracks_thread_to_rescoring(tmp_path):
    """iq/dq/sq BAM tags reach the mapQV rescore (IDSScoreFunction data
    path; ReaderAgglomerate QV threading)."""
    import numpy as np
    from blasr_tpu.io.bam import BamRecord, BamWriter, read_bam_records
    rng = np.random.default_rng(131)
    seq = rng.integers(0, 4, 60).astype(np.int8)
    qv = "".join(chr(20 + 33) for _ in range(60))
    rec = BamRecord(qname="m/7/0_60", flag=4, ref_id=-1, pos=-1, mapq=255,
                    cigar=[], seq=seq, qual=np.full(60, 25),
                    tags={"iq": qv, "dq": qv, "sq": qv})
    path = tmp_path / "in.bam"
    with open(path, "wb") as f:
        w = BamWriter(f, "@HD\tVN:1.5\n", [], [])
        w.write_record(rec)
        w.close()
    reads = read_bam_records(str(path))
    assert reads[0].tracks is not None
    for name in ("InsertionQV", "DeletionQV", "SubstitutionQV"):
        assert (reads[0].tracks[name] == 20).all()
    # log-prob rescore consumes the tracks
    from blasr_tpu.pipeline.scoring import QVTracks, log10_prob_alignment
    t = QVTracks(qual=reads[0].qual, sub_qv=reads[0].tracks["SubstitutionQV"])
    tgt = seq.copy()
    tgt[5] = (tgt[5] + 1) % 4
    lp_ids = log10_prob_alignment([("M", 60)], seq, tgt, 0, 0, t)
    # without a subQV track, quality mode falls back to substitutionPrior
    # (IDSScoreFunction contract) — use a non-default prior to observe it
    lp_plain = log10_prob_alignment([("M", 60)], seq, tgt, 0, 0,
                                    QVTracks(qual=reads[0].qual),
                                    substitution_prior=30)
    assert lp_ids != lp_plain  # subQV (20) prices the mismatch vs prior 30
    lp_prior20 = log10_prob_alignment([("M", 60)], seq, tgt, 0, 0,
                                      QVTracks(qual=reads[0].qual),
                                      substitution_prior=20)
    assert lp_prior20 == lp_ids  # prior 20 == track value 20


def test_full_qv_align_matches_banded_oracle():
    """full_qv_align (FullQVAlign role) optimizes the same IDS objective
    as the QV-steered banded kernel's oracle and returns a path whose
    cost replays to the score."""
    import numpy as np

    from blasr_tpu.params import default_score_matrix
    from blasr_tpu.pipeline.scoring import QVTracks, full_qv_align
    from tests.test_qv_dp import oracle_qv

    rng = np.random.default_rng(17)
    submat = np.asarray(default_score_matrix(), np.float32).reshape(25)
    for _ in range(4):
        m = int(rng.integers(25, 45))
        tgt = rng.integers(0, 4, m, dtype=np.int8)
        read = []
        for b in tgt:
            u = rng.random()
            if u < 0.05:
                read.append(int(rng.integers(0, 4)))
            elif u < 0.09:
                read.append(int(b))
                read.append(int(rng.integers(0, 4)))
            elif u < 0.13:
                pass
            else:
                read.append(int(b))
        read = np.asarray(read, np.int8)
        n = len(read)
        insq = rng.integers(1, 30, n)
        delq = rng.integers(1, 30, n)
        subq = rng.integers(1, 30, n)
        dtag = rng.integers(0, 5, n)
        stag = rng.integers(0, 5, n)
        want = oracle_qv(read, tgt, submat, insq, delq, subq, dtag, stag,
                         np.full(n, 13), np.full(n, 20))
        cigar, score = full_qv_align(
            read, tgt,
            QVTracks(ins_qv=insq, del_qv=delq, sub_qv=subq),
            match_score=-5.0, del_tag=dtag, sub_tag=stag)
        assert score == want
        nq = sum(c for op, c in cigar if op in "=XI")
        nt = sum(c for op, c in cigar if op in "=XD")
        assert nq == n and nt == m
        # replay the path cost
        total, qi, ti = 0.0, 0, 0
        for op, c in cigar:
            for _ in range(c):
                if op in "=X":
                    if tgt[ti] == read[qi] and read[qi] < 4:
                        total += -5.0
                    else:
                        total += subq[qi] if tgt[ti] == stag[qi] else 20
                    qi += 1
                    ti += 1
                elif op == "I":
                    total += insq[qi]
                    qi += 1
                else:
                    r = max(qi - 1, 0)
                    total += delq[r] if tgt[ti] == dtag[r] else 13
                    ti += 1
        assert total == score
