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
