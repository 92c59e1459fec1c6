"""Unrolled-resequencing regression (ctest/bug25328.t contract): a long
read spanning many copies of a short circular template must produce one
long alignment, not fragments.  Exercises the anchor-ambiguity rescue
(deep occurrence retry) and the bit-reversed top-A anchor spread — with
first-index tie-breaks the kept anchors cluster at the read start and the
chain never covers the read."""

import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.io.fasta import FastaRecord
from blasr_tpu.params import MappingParams
from blasr_tpu.pipeline.map_read import Mapper


def test_unrolled_circular_template_maps_full_span():
    rng = np.random.default_rng(0)
    unit = rng.integers(0, 4, 150).astype(np.int8)
    genome = np.tile(unit, 20)                    # 20x unrolled reference
    clean = np.tile(unit, 14)[40:40 + 1800]       # ~12 copies, phase 40
    read = []
    for b in clean:
        x = rng.random()
        if x < 0.04:
            continue                              # deletion
        read.append(int(rng.integers(0, 4)) if x < 0.08 else int(b))
        if 0.08 <= x < 0.12:
            read.append(int(rng.integers(0, 4)))  # insertion
    read = np.array(read, dtype=np.int8)
    gi = build_genome_index([FastaRecord("ref", genome)], k=12)
    p = MappingParams(forward_only=True, max_match_length=14,
                      n_best=1, n_candidates=1).make_sane()
    m = Mapper(gi, p)
    alns = m.map_reads([FastaRecord(f"t/0/0_{len(read)}", read)])[0]
    assert alns, "read unmapped on repetitive template"
    span = alns[0].qend - alns[0].qstart
    assert span >= 0.8 * len(read), f"span {span} < 80% of {len(read)}"


def test_repeat_copy_placement():
    """Reads drawn from EVERY copy of a multi-copy diverged repeat place
    on their own copy (the reference emits every seed occurrence; the
    strided+rotating occurrence sample must not starve any copy of
    anchors).  Before the rotation fix, reads from the unsampled copies
    misplaced onto the first copy."""
    rng = np.random.default_rng(5)
    from blasr_tpu.sim import mutate, random_genome
    contigs = random_genome(300_000, seed=6)
    g = contigs[0].seq
    block = g[50_000:52_000].copy()
    copy_pos = [50_000, 120_000, 190_000, 260_000]
    for p in copy_pos[1:]:
        b = block.copy()
        mut = rng.random(len(b)) < 0.012
        b[mut] = rng.integers(0, 4, int(mut.sum()))
        g[p:p + 2000] = b
    reads, truth = [], []
    for ci, p in enumerate(copy_pos):
        for j in range(3):
            start = p + int(rng.integers(0, 1200))
            ln = int(rng.integers(500, 760))
            sub = mutate(g[start:start + ln], rng, 0.04, 0.07, 0.04)
            reads.append(FastaRecord(f"r/{ci * 3 + j}/0_{len(sub)}", sub))
            truth.append(start)
    gi = build_genome_index([FastaRecord("c0", g)], k=12)
    m = Mapper(gi, MappingParams().make_sane())
    res = m.map_reads(reads)
    correct = 0
    for alns, t in zip(res, truth):
        if alns:
            best = min(alns, key=lambda a: a.score)
            if abs(best.tstart - t) < 150:
                correct += 1
    # score noise between 1.2%-diverged copies can flip a couple of reads
    # (the reference has the same ambiguity); anchor starvation flips most
    assert correct >= 9, f"only {correct}/12 reads placed on their copy"


def test_tandem_repeat_mapqv_not_overconfident():
    """A read spanning several units of a tandem array has near-equal
    placements shifted by the period; the competitor must reach the mapQV
    partition (mapQV << 254, StoreMapQVs contract
    BlasrUtilsImpl.hpp:236-304) instead of being suppressed before the DP
    (VERDICT r2 item 4: the flat wlen//2 margin hid tandem competitors)."""
    from blasr_tpu.pipeline.select import store_map_qvs
    from blasr_tpu.sim import random_genome

    rng = np.random.default_rng(9)
    contigs = random_genome(60_000, seed=9)
    unit = rng.integers(0, 4, 400).astype(np.int8)
    array = np.tile(unit, 8)                      # 3.2 kb tandem array
    genome = np.concatenate([contigs[0].seq[:20_000], array,
                             contigs[0].seq[20_000:]]).astype(np.int8)
    gi = build_genome_index([FastaRecord("ref", genome)], k=12)
    # read = 1.5 kb exact slice from inside the array (period 400 <
    # readLen/2): placements at +-400 score identically
    start = 20_000 + 2 * 400 + 37
    read = genome[start:start + 1500].copy()
    p = MappingParams(forward_only=True).make_sane()
    m = Mapper(gi, p)
    alns = m.map_reads([FastaRecord("t/1/0_1500", read)])[0]
    assert alns, "tandem read unmapped"
    placements = {a.tstart for a in alns}
    shifted = [t for t in placements
               if 100 <= abs(t - start) <= 3 * 400 + 100]
    assert shifted, (
        f"no period-shifted competitor among placements {sorted(placements)}")
    store_map_qvs(alns, p, gi)
    best = min(alns, key=lambda a: a.score)
    assert best.map_qv < 100, (
        f"tandem mapQV overconfident: {best.map_qv} "
        f"(placements {sorted(placements)})")


def test_emit_all_flag_raises_occ_capacity():
    """--maxAnchorsPerPosition <= 256 becomes the per-position emission
    capacity (the reference's emit-all semantics reachable by flag,
    RegisterBlasrOptions.h:104-106), with the batch bound shrunk to pay
    for the deeper [2B, L, O] expansion."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 30_000).astype(np.int8)
    gi = build_genome_index([FastaRecord("c", g)], k=12)
    m_def = Mapper(gi, MappingParams().make_sane())
    m_all = Mapper(gi, MappingParams(max_anchors_per_position=64).make_sane())
    assert m_all.cfg.occ_per_pos == 64
    assert m_def.cfg.occ_per_pos < 64
    # the anchor-expansion memory bound shrinks the batch once the
    # capacity is deep enough to matter
    m_256 = Mapper(gi, MappingParams(
        max_anchors_per_position=256).make_sane())
    assert m_256.cfg.occ_per_pos == 256
    assert m_256.batch_size_for(2048) < m_def.batch_size_for(2048)
    # the default (10000) must NOT trigger the deep expansion
    m_10k = Mapper(gi, MappingParams(
        max_anchors_per_position=10000).make_sane())
    assert m_10k.cfg.occ_per_pos == m_def.cfg.occ_per_pos


def test_max_seed_depth_probes_occurrences():
    rng = np.random.default_rng(4)
    unit = rng.integers(0, 4, 600).astype(np.int8)
    g = np.concatenate([np.tile(unit, 10),
                        rng.integers(0, 4, 5000).astype(np.int8)])
    gi = build_genome_index([FastaRecord("c", g)], k=12)
    m = Mapper(gi, MappingParams().make_sane())
    # a read from inside the repeat sees ~10 occurrences per seed
    depth = m._max_seed_depth(FastaRecord("r", unit[:400]))
    assert 9 <= depth <= 12, depth
    # a unique-region read sees ~1
    depth_u = m._max_seed_depth(FastaRecord("r2", g[-2000:-1200]))
    assert depth_u <= 3, depth_u


def test_structured_genome_placement_and_mapqv_calibration():
    """Structured-repeat soak regression (tools/soak_genome.py
    --structured, small): reads from a planted tandem array and a 97%%
    segdup pair must either place at their true copy or report low
    mapQV — no wrong placement may carry mapQV >= 30 (calibration:
    P(wrong | mapQV >= 30) must be ~0; the reference's repetitive-genome
    contract, ctest/bug25328.t class)."""
    from blasr_tpu.pipeline.select import store_map_qvs
    from blasr_tpu.sim import mutate, structured_genome

    contigs, features = structured_genome(
        400_000, seed=11, n_tandem=1, tandem_copies=(90, 110),
        n_segdup=1, segdup_len=(18_000, 22_000),
        segdup_identity=(0.97, 0.97), n_nrun=1, nrun_len=(400, 600))
    kinds = {f.kind for f in features}
    assert {"tandem", "segdup", "nrun"} <= kinds
    g = contigs[0].seq
    rng = np.random.default_rng(12)
    reads, truth = [], []

    def add_read(ts, ln):
        sub = mutate(g[ts:ts + ln], rng, 0.02, 0.05, 0.03)
        reads.append(FastaRecord(f"s/{len(reads)}/0_{len(sub)}", sub))
        truth.append(ts)

    for f in features:
        if f.kind == "nrun":
            continue
        for j in range(4):
            ln = int(rng.integers(500, 800))
            add_read(int(rng.integers(f.start, max(f.end - ln, f.start + 1))),
                     ln)
    for j in range(4):  # unique-region reads
        while True:
            ts = int(rng.integers(0, len(g) - 900))
            if all(not (ts < f.end and ts + 900 > f.start)
                   for f in features):
                break
        add_read(ts, int(rng.integers(500, 800)))

    gi = build_genome_index(contigs, k=12)
    p = MappingParams(forward_only=True).make_sane()
    m = Mapper(gi, p)
    res = m.map_reads(reads)
    n_correct = hi_wrong = 0
    for alns, t in zip(res, truth):
        assert alns, f"structured-world read at {t} unmapped"
        store_map_qvs(alns, p, gi)
        best = min(alns, key=lambda a: a.score)
        ok = abs(best.tstart - best.qstart - t) < 150
        if ok:
            n_correct += 1
        elif best.map_qv >= 30:
            hi_wrong += 1
    assert hi_wrong == 0, (
        f"{hi_wrong} wrong placements with mapQV >= 30 (miscalibrated)")
    # unique + most repeat reads place correctly; a tandem read landing
    # on another unit with LOW mapQV is acceptable (the calibration
    # assert above is the contract)
    assert n_correct >= int(0.7 * len(reads)), \
        f"{n_correct}/{len(reads)} placed"


def test_deep_tandem_array_own_copy_placement():
    """150-copy alpha-satellite-like array (tools/diag_tandem.py class):
    long reads sampled inside the array place at their OWN copy.  Pins
    the round-4 fix stack: drift-penalized guide extraction (a chain
    could mosaic across copies for free, poisoning every candidate's
    band), full-overhang interval widening (a truncated true-copy chain
    could never materialize its full-span alignment), both-orientation
    seed-depth probing, and the deep-seed (16x clipped) rescue trigger
    with drift-penalized candidate ranking."""
    from blasr_tpu.pipeline.select import store_map_qvs
    from blasr_tpu.sim import SimRead, mutate, structured_genome
    from blasr_tpu.io.fasta import revcomp
    from blasr_tpu.params import ShapeConfig

    contigs, features = structured_genome(
        1_500_000, seed=5, n_tandem=1, tandem_copies=(150, 151),
        tandem_period=171, tandem_divergence=0.015)
    feat = [f for f in features if f.kind == "tandem"][0]
    rng = np.random.default_rng(6)
    g = contigs[0].seq
    sims = []
    for i in range(12):
        rl = int(rng.integers(800, 1600))
        lo = max(0, feat.start - rl // 4)
        hi = min(len(g) - rl, feat.end - 3 * rl // 4)
        ts = int(rng.integers(lo, hi))
        frag = g[ts:ts + rl]
        strand = int(rng.integers(0, 2))
        if strand:
            frag = revcomp(frag)
        seq = mutate(frag, rng, 0.03, 0.075, 0.045)
        sims.append(SimRead(FastaRecord(f"sim/{i}/0_{len(seq)}", seq),
                            0, ts, ts + rl, strand))
    gi = build_genome_index(contigs, k=12)
    p = MappingParams(min_match_length=12).make_sane()
    m = Mapper(gi, p, ShapeConfig(buckets=(2048,), batch_size=32,
                                  max_anchors=512))
    res = m.map_reads([s.rec for s in sims])
    n_ok = hi_wrong = 0
    for s, alns in zip(sims, res):
        assert alns, f"array read at {s.tstart} unmapped"
        store_map_qvs(alns, p, gi)
        a = min(alns, key=lambda x: x.score)
        proj = a.tstart - (a.qstart if a.strand == 0
                           else len(s.rec.seq) - a.qend)
        ok = abs(proj - s.tstart) <= 100
        n_ok += ok
        if not ok and a.map_qv >= 30:
            hi_wrong += 1
    assert hi_wrong == 0, f"{hi_wrong} confidently-wrong array placements"
    assert n_ok >= 11, f"{n_ok}/12 own-copy placements"
