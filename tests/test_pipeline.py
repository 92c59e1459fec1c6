"""End-to-end pipeline: simulated reads map back to their true loci.

This is the ctest/ecoli.t-style workload on synthetic data (real PacBio
test data lives on internal NFS, SURVEY.md §4): FASTA reads x FASTA genome
-> anchors -> chain -> banded align -> select -> SAM/m4.
"""

import io as _io

import numpy as np
import pytest

from blasr_tpu.index import build_genome_index
from blasr_tpu.io import formats
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.pipeline.select import select_alignments, store_map_qvs, zmw_rand_int
from blasr_tpu.sim import random_genome, simulate_reads


@pytest.fixture(scope="module")
def world():
    contigs = random_genome(120_000, seed=5, n_contigs=2)
    gi = build_genome_index(contigs, k=12)
    sims = simulate_reads(contigs, 20, read_len=(300, 900), accuracy=0.87,
                          seed=7)
    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(1024,), batch_size=8, max_anchors=256)
    mapper = Mapper(gi, params, cfg)
    results = mapper.map_reads([s.rec for s in sims])
    return contigs, gi, sims, params, mapper, results


def test_reads_map_to_true_locus(world):
    contigs, gi, sims, params, mapper, results = world
    n_correct = 0
    for sim, alns in zip(sims, results):
        store_map_qvs(alns, params)
        sel = select_alignments(alns, params,
                                zmw_rand_int(sim.rec.name, 0))
        if not sel:
            continue
        best = sel[0]
        if (best.tindex == sim.contig and best.strand == sim.strand
                and abs(best.tstart - sim.tstart) < 50
                and abs(best.tend - sim.tend) < 50):
            n_correct += 1
    assert n_correct >= 18, f"only {n_correct}/20 reads mapped correctly"


def test_alignment_consistency(world):
    contigs, gi, sims, params, mapper, results = world
    checked = 0
    for sim, alns in zip(sims, results):
        for a in alns[:2]:
            # CIGAR consumption must match coordinates
            qcons = sum(n for op, n in a.cigar if op in "M=XI")
            tcons = sum(n for op, n in a.cigar if op in "M=XD")
            assert qcons == a.qend - a.qstart
            assert tcons == a.tend - a.tstart
            # no adjacent indels (merged by default)
            for (o1, _), (o2, _) in zip(a.cigar, a.cigar[1:]):
                assert not (o1 in "ID" and o2 in "ID" and o1 != o2)
            # stats consistent
            assert a.n_match + a.n_mismatch + a.n_ins == qcons
            assert a.n_match + a.n_mismatch + a.n_del == tcons
            assert 0 <= a.pct_similarity <= 100
            checked += 1
    assert checked > 10


def test_aligned_strings_reconstruct(world):
    contigs, gi, sims, params, mapper, results = world
    done = 0
    for sim, alns in zip(sims, results):
        for a in alns[:1]:
            qstr, mstr, tstr = formats.aligned_strings(a, gi)
            assert len(qstr) == len(mstr) == len(tstr)
            n_bar = mstr.count("|")
            assert n_bar == a.n_match
            assert qstr.count("-") == a.n_del
            assert tstr.count("-") == a.n_ins
            done += 1
    assert done >= 15


def test_sam_output_valid(world):
    contigs, gi, sims, params, mapper, results = world
    buf = _io.StringIO()
    buf.write(formats.sam_header(gi, "test"))
    n = 0
    for sim, alns in zip(sims, results):
        store_map_qvs(alns, params)
        for a in select_alignments(alns, params, 0)[:1]:
            formats.write_sam(buf, a, params)
            n += 1
    lines = buf.getvalue().strip().split("\n")
    header = [l for l in lines if l.startswith("@")]
    recs = [l for l in lines if not l.startswith("@")]
    assert len(header) >= 4  # HD + 2 SQ + PG
    assert len(recs) == n and n >= 15
    for l in recs:
        f = l.split("\t")
        assert len(f) >= 11
        assert int(f[1]) in (0, 16)
        assert f[2] in gi.seqdb.names
        assert 1 <= int(f[3])
        assert 0 <= int(f[4]) <= 254
        # CIGAR ops sane
        import re
        ops = re.findall(r"(\d+)([MIDNSHP=X])", f[5])
        assert "".join(f"{a}{b}" for a, b in ops) == f[5]
        qlen_from_cigar = sum(int(a) for a, b in ops if b in "MIS=X")
        assert qlen_from_cigar == len(f[9])


def test_m4_output_fields(world):
    contigs, gi, sims, params, mapper, results = world
    buf = _io.StringIO()
    for sim, alns in zip(sims, results):
        store_map_qvs(alns, params)
        for a in select_alignments(alns, params, 0)[:1]:
            formats.write_m4(buf, a)
    for line in buf.getvalue().strip().split("\n"):
        f = line.split()
        assert len(f) == 13
        score = int(f[2])
        assert score < 0  # negative-better scores
        assert 0 <= float(f[3]) <= 100
        qs, qe, qlen = int(f[5]), int(f[6]), int(f[7])
        ts, te, tlen = int(f[9]), int(f[10]), int(f[11])
        assert 0 <= qs < qe <= qlen
        assert 0 <= ts < te <= tlen


def test_deterministic_rerun(world):
    """Same inputs twice -> identical alignments (ctest/deterministic.t)."""
    contigs, gi, sims, params, mapper, results = world
    again = mapper.map_reads([s.rec for s in sims[:5]])
    for a_list, b_list in zip(results[:5], again):
        assert len(a_list) == len(b_list)
        for a, b in zip(a_list, b_list):
            assert (a.score, a.tstart, a.tend, a.qstart, a.qend, a.strand,
                    a.cigar) == \
                   (b.score, b.tstart, b.tend, b.qstart, b.qend, b.strand,
                    b.cigar)


def test_overflow_rerun_matches_default(world):
    """Forcing a tiny traceback pair capacity must flag overflow and make
    the Mapper rerun with the dense bound, producing the same alignments
    as the default capacity."""
    import blasr_tpu.pipeline.map_read as mr
    contigs, gi, sims, params, mapper, results = world
    recs = [s.rec for s in sims]
    want = [[(a.tstart, a.tend, a.strand, a.score, tuple(a.cigar or []))
             for a in alns] for alns in mapper.map_reads(recs)]
    orig = mr.map_batch
    reran = {"n": 0}

    def tiny_cap(*args, **kw):
        if kw.get("tb_cap", 0) == 0:
            kw["tb_cap"] = 64  # far below any real alignment's pair count
        else:
            reran["n"] += 1
        return orig(*args, **kw)

    mr.map_batch = tiny_cap
    try:
        got = [[(a.tstart, a.tend, a.strand, a.score, tuple(a.cigar or []))
                for a in alns] for alns in mapper.map_reads(recs)]
    finally:
        mr.map_batch = orig
    assert reran["n"] > 0  # the dense rerun actually fired
    assert got == want


def test_native_cigar_matches_python():
    """The C++ CIGAR assembler must match pairs_to_cigar +
    merge_adjacent_indels exactly (host collect hot path)."""
    import numpy as np
    from blasr_tpu.native import cigar_native
    from blasr_tpu.pipeline.map_read import (merge_adjacent_indels,
                                             pairs_to_cigar)
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(100):
        n_pairs = int(rng.integers(0, 60))
        ops = rng.choice([1, 2, 3], size=n_pairs,
                         p=[0.6, 0.2, 0.2]).astype(np.uint32)
        cnts = rng.integers(1, 50, size=n_pairs).astype(np.uint32)
        halves = ops | (cnts << 2)
        pad = (-len(halves)) % 2 + 2  # trailing stop halves
        halves = np.concatenate([halves, np.zeros(pad, np.uint32)])
        h2 = halves.reshape(-1, 2)
        words = (h2[:, 0] | (h2[:, 1] << 16)).astype(np.uint32).view(np.int32)
        for adj in (True, False):
            got = cigar_native(words, adj)
            if got is None:
                return  # extension unavailable in this environment
            want = pairs_to_cigar(words)
            if not adj:
                want = merge_adjacent_indels(want)
            assert got == want
            checked += 1
    assert checked


def test_batch_size_invariance(world):
    """The sliding-window dispatch/collect pipeline (staging LOOKAHEAD
    batches ahead, collecting once > LOOKAHEAD results are in flight)
    returns identical alignments in input order at any batch size —
    batch 3 pushes 7 batches through the window for 20 reads."""
    contigs, gi, sims, params, mapper, results = world
    cfg3 = ShapeConfig(buckets=(1024,), batch_size=3, max_anchors=256)
    res3 = Mapper(gi, params, cfg3, dev=mapper.dev).map_reads(
        [s.rec for s in sims])
    assert len(res3) == len(results)
    for a_list, b_list in zip(results, res3):
        assert [(a.qstart, a.qend, a.tstart, a.tend, a.strand, a.score,
                 list(a.cigar)) for a in a_list] == \
               [(b.qstart, b.qend, b.tstart, b.tend, b.strand, b.score,
                 list(b.cigar)) for b in b_list]
