"""Chain DP / candidate-interval kernel tests."""

import numpy as np
import jax.numpy as jnp

from blasr_tpu.kernels.anchor import Anchors
from blasr_tpu.kernels.chain import chain_anchors, chain_members


def make_anchors(triples, A=16):
    """triples: list of (q, t, l); returns a 1-read Anchors padded to A,
    sorted by t."""
    triples = sorted(triples, key=lambda x: x[1])
    n = len(triples)
    q = np.full((1, A), 0, dtype=np.int32)
    t = np.full((1, A), 0x3FFFFFFF, dtype=np.int32)
    l = np.zeros((1, A), dtype=np.int32)
    v = np.zeros((1, A), dtype=bool)
    for i, (qq, tt, ll) in enumerate(triples):
        q[0, i], t[0, i], l[0, i], v[0, i] = qq, tt, ll, True
    nlogp = l.astype(np.float32) * np.float32(np.log(4.0))
    return Anchors(jnp.asarray(q), jnp.asarray(t), jnp.asarray(l),
                   jnp.asarray(v), jnp.asarray(np.array([n], np.int32)),
                   jnp.asarray(nlogp))


def test_single_clean_chain():
    # colinear anchors along one diagonal
    tr = [(0, 100, 12), (20, 121, 12), (40, 140, 12), (60, 161, 12)]
    a = make_anchors(tr)
    c = chain_anchors(a, jnp.asarray(np.array([80], np.int32)), n_cand=3)
    assert bool(c.valid[0, 0])
    assert int(c.q_start[0, 0]) == 0
    assert int(c.t_start[0, 0]) == 100
    assert int(c.q_end[0, 0]) == 72
    assert int(c.t_end[0, 0]) == 173
    assert float(c.score[0, 0]) == 48.0
    assert int(c.n_anchors[0, 0]) == 4


def test_two_loci_give_two_candidates():
    # same read chains at two distant genome locations (a duplication)
    locA = [(0, 1000, 12), (30, 1031, 12), (60, 1062, 12)]
    locB = [(0, 9000, 12), (30, 9030, 12)]
    a = make_anchors(locA + locB)
    c = chain_anchors(a, jnp.asarray(np.array([80], np.int32)), n_cand=3)
    assert bool(c.valid[0, 0]) and bool(c.valid[0, 1])
    # best candidate is the 3-anchor locus
    assert int(c.t_start[0, 0]) == 1000
    assert float(c.score[0, 0]) == 36.0
    assert int(c.t_start[0, 1]) == 9000
    assert float(c.score[0, 1]) == 24.0


def test_window_constraint_blocks_far_join():
    # two anchors further apart than readLen*(1+indelRate) cannot chain
    tr = [(0, 100, 12), (20, 5000, 12)]
    a = make_anchors(tr)
    c = chain_anchors(a, jnp.asarray(np.array([60], np.int32)), n_cand=2)
    scores = sorted(float(s) for s in np.asarray(c.score[0]) if s > 0)
    assert scores == [12.0, 12.0]  # two separate single-anchor chains


def test_drift_constraint_blocks_off_diagonal():
    # second anchor with huge diagonal drift relative to span can't chain
    tr = [(0, 100, 12), (14, 190, 12)]
    a = make_anchors(tr)
    c = chain_anchors(a, jnp.asarray(np.array([60], np.int32)), n_cand=2,
                      drift_frac=0.3, drift_slack=5)
    assert float(c.score[0, 0]) == 12.0


def test_overlap_clip_no_double_count():
    # heavily overlapping anchors should not double-count weight
    tr = [(0, 100, 12), (1, 101, 12), (2, 102, 12)]
    a = make_anchors(tr)
    c = chain_anchors(a, jnp.asarray(np.array([40], np.int32)), n_cand=1)
    # total weight = 12 (first) + 1 + 1 (clipped gains)
    assert float(c.score[0, 0]) == 14.0


def test_chain_members_walk():
    tr = [(0, 100, 12), (20, 121, 12), (40, 140, 12)]
    a = make_anchors(tr)
    c = chain_anchors(a, jnp.asarray(np.array([60], np.int32)), n_cand=2)
    mq, mt, ml, mv = chain_members(c, a, max_chain=8)
    qs = [int(x) for x, ok in zip(np.asarray(mq[0, 0]), np.asarray(mv[0, 0])) if ok]
    ts = [int(x) for x, ok in zip(np.asarray(mt[0, 0]), np.asarray(mv[0, 0])) if ok]
    assert qs == [0, 20, 40]
    assert ts == [100, 121, 140]
