"""SDP guide densification through anchor deserts + sdpBypassThreshold.

The reference SDP-aligns every candidate interval
(iblasr/BlasrAlignImpl.hpp:780-1004); here the SDP fragment set densifies
the banded-DP guide path.  A read segment with no minMatch-length exact
runs but a concentrated indel ("anchor desert") must still align
correctly, and --sdpTupleSize must change behavior.
"""

import numpy as np
import pytest

from blasr_tpu.index import build_genome_index
from blasr_tpu.io.fasta import FastaRecord
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.sim import random_genome


@pytest.fixture(scope="module")
def desert_world():
    """Read = genome[2000:5000] with (a) every 10th base substituted in
    genome[3000:3600] (kills all 12-mer anchors there) and (b)
    genome[3600:3750] deleted from the read: a 600 bp anchor desert
    ending in a 150 bp concentrated deletion."""
    contigs = random_genome(20_000, seed=77)
    g = contigs[0].seq
    gi = build_genome_index(contigs, k=12)
    desert = g[3000:3600].copy()
    desert[::10] = (desert[::10] + 1) % 4
    read_seq = np.concatenate([g[2000:3000], desert, g[3750:5000]])
    read = FastaRecord("desert/1/0_%d" % len(read_seq), read_seq)
    return gi, read


def _best(gi, read, **params):
    cfg = ShapeConfig(buckets=(4096,), batch_size=4)
    mapper = Mapper(gi, MappingParams(**params).make_sane(), cfg)
    alns = mapper.map_reads([read])[0]
    assert alns, "read did not map at all"
    return min(alns, key=lambda a: a.score)


def test_desert_aligned_with_sdp_guide(desert_world):
    gi, read = desert_world
    best = _best(gi, read, sdp_tuple_size=8)
    # full span, correct placement, and the 150 bp deletion recovered
    assert best.tstart < 2010 and best.tend > 4990, (best.tstart, best.tend)
    assert best.qstart < 10 and best.qend > len(read.seq) - 10
    assert best.n_del >= 140, best.n_del
    # desert substitutions are ~60; allow junction slop but no more
    assert best.n_mismatch < 120, best.n_mismatch
    assert best.n_match > 2700, best.n_match


def test_sdp_guide_beats_bypass_in_desert(desert_world):
    """sdpBypassThreshold 0 disables densification (anchors-only guide);
    the desert then misaligns measurably more."""
    gi, read = desert_world
    guided = _best(gi, read, sdp_tuple_size=8)
    bypass = _best(gi, read, sdp_tuple_size=8, sdp_bypass_threshold=0.0)
    assert guided.score < bypass.score, (guided.score, bypass.score)
    assert guided.n_match > bypass.n_match


def test_sdp_tuple_size_changes_behavior(desert_world):
    """--sdpTupleSize 8 finds fragments in the 9-base desert runs;
    size 11 cannot (runs are too short), so the alignment differs."""
    gi, read = desert_world
    k8 = _best(gi, read, sdp_tuple_size=8)
    k11 = _best(gi, read, sdp_tuple_size=11)
    assert k8.score < k11.score, (k8.score, k11.score)


def test_fast_sdp_still_correct(desert_world):
    gi, read = desert_world
    fast = _best(gi, read, sdp_tuple_size=8, fast_sdp=True)
    assert fast.tstart < 2010 and fast.tend > 4990
    assert fast.n_match > 2700


def test_desert_candidate_beyond_top2_gets_dense_guide():
    """A lower-ranked candidate whose guide path has an anchor desert
    wider than the DP band gets the dense window-SDP pass (the reference
    SDP-aligns every interval, BlasrAlignImpl.hpp:980-990; VERDICT r2
    item 7 pinned the top-2-only truncation).  Three identical repeat
    copies each carry a 600 bp seed-free region with an ABRUPT 200 bp
    target-side insertion at its midpoint; every copy's alignment --
    including the rank-3 one -- must bridge it at high identity and all
    three must score identically (identical copies)."""
    import numpy as np

    from blasr_tpu.index import build_genome_index
    from blasr_tpu.io.fasta import FastaRecord
    from blasr_tpu.params import MappingParams
    from blasr_tpu.pipeline.map_read import Mapper

    rng = np.random.default_rng(17)
    flank_a = rng.integers(0, 4, 700).astype(np.int8)
    flank_b = rng.integers(0, 4, 700).astype(np.int8)
    # 600 bp read-side desert, ~11% point-diverged from the target copy
    # (kills 12-mers, keeps enough 8-mers)
    desert_r = rng.integers(0, 4, 600).astype(np.int8)
    desert_t = desert_r.copy()
    mut = np.zeros(600, bool)
    mut[::9] = True
    desert_t[mut] = (desert_t[mut] + 1
                     + rng.integers(0, 3, int(mut.sum()))) % 4
    # abrupt 200 bp target-side insertion at the desert midpoint
    desert_t = np.concatenate(
        [desert_t[:300], rng.integers(0, 4, 200).astype(np.int8),
         desert_t[300:]])
    unit = np.concatenate([flank_a, desert_t, flank_b])
    spacer0 = rng.integers(0, 4, 3000).astype(np.int8)
    parts, copies = [spacer0], []
    pos = len(spacer0)
    for _ in range(3):
        copies.append(pos)
        parts.append(unit)
        pos += len(unit)
        sp = rng.integers(0, 4, 3000).astype(np.int8)
        parts.append(sp)
        pos += len(sp)
    genome = np.concatenate(parts).astype(np.int8)
    read = np.concatenate([flank_a, desert_r, flank_b]).astype(np.int8)

    gi = build_genome_index([FastaRecord("c", genome)], k=12)
    p = MappingParams(sdp_tuple_size=8, forward_only=True).make_sane()
    m = Mapper(gi, p)
    alns = m.map_reads([FastaRecord("r/0/0_2000", read)])[0]
    assert alns, "read unmapped"
    by_copy = {}
    for a in alns:
        for c in copies:
            if abs(a.tstart - c) < 100:
                cur = by_copy.get(c)
                if cur is None or a.score < cur.score:
                    by_copy[c] = a
    assert len(by_copy) == 3, (
        f"placements at {sorted(a.tstart for a in alns)}, "
        f"copies {copies}")
    # every copy bridges the abrupt insertion at high identity, and the
    # identical copies must not diverge in score (a guide-quality
    # asymmetry between chain ranks would show up here)
    scores = set()
    for c, a in sorted(by_copy.items()):
        assert a.pct_similarity >= 85.0 and (a.qend - a.qstart) >= 1800, (
            f"copy {c}: pct {a.pct_similarity:.1f} "
            f"span {a.qend - a.qstart} score {a.score:.0f}")
        scores.add(a.score)
    assert len(scores) == 1, f"copies scored differently: {scores}"
