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
