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
