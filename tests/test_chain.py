"""Chain DP / candidate-interval kernel tests."""

import numpy as np
import jax.numpy as jnp

from blasr_tpu.kernels.anchor import Anchors
from blasr_tpu.kernels.chain import chain_anchors, chain_members


def chain_oracle(q, t, l, valid, nlogp, read_len, *, n_cand, D,
                 indel_rate=0.3, drift_frac=0.35, drift_slack=50,
                 rank_by_pvalue=False, p_value_type=0, global_chain=False):
    """Pure-NumPy restatement of chain_anchors' exact semantics for one
    read (float32 arithmetic in the same order, leftmost-max ties,
    overlap-suppressed selection).  Exists so the device kernel can be
    reformulated (blocking, interleaving) with bit-exact safety."""
    A = len(q)
    NEG = np.float32(-1e30)
    if global_chain:
        drift_frac, drift_slack = 0.1, 0
    wlen = np.int32(np.float32(read_len) * np.float32(1.0 + indel_rate))
    best = np.full(A, NEG, np.float32)
    sq = np.zeros(A, np.int64)
    st = np.zeros(A, np.int64)
    cnt = np.zeros(A, np.int64)
    sump = np.zeros(A, np.float32)
    sumr = np.zeros(A, np.float32)
    parent = np.full(A, -1, np.int64)
    for i in range(A):
        if not valid[i]:
            continue
        cand_v, cand_j, cand_gain = NEG, -1, np.float32(0)
        for j in range(max(0, i - D), i):
            if not valid[j]:
                continue
            dq, dt = q[i] - q[j], t[i] - t[j]
            drift = np.float32(abs(dt - dq))
            span = np.float32(max(dq, dt))
            if not (dq > 0 and dt > 0 and dt <= wlen and
                    drift <= np.float32(drift_frac) * span + drift_slack):
                continue
            if global_chain and not (dq >= l[j] and dt >= l[j]):
                continue
            gain = np.float32(min(l[i], min(dq, dt)))
            v = np.float32(best[j] + gain)
            if v > cand_v:  # strict: leftmost max wins, like argmax
                cand_v, cand_j, cand_gain = v, j, gain
        li = np.float32(l[i])
        if cand_v < li:
            best[i], sq[i], st[i] = li, q[i], t[i]
            cnt[i], parent[i] = 1, -1
            sump[i] = sumr[i] = np.float32(nlogp[i])
        else:
            best[i], sq[i], st[i] = cand_v, sq[cand_j], st[cand_j]
            cnt[i], parent[i] = cnt[cand_j] + 1, cand_j
            frac = cand_gain / np.float32(max(li, 1.0))
            sump[i] = np.float32(sump[cand_j] + np.float32(nlogp[i]) * frac)
            sumr[i] = np.float32(sumr[cand_j] + np.float32(nlogp[i]))
    if rank_by_pvalue:
        if p_value_type == 1:
            pkey = best * np.float32(1.3862944)
        elif p_value_type == 2:
            pkey = sumr.copy()
        else:
            pkey = sump.copy()
        rank_key = np.where(best > NEG * np.float32(0.5), pkey, NEG)
    else:
        rank_key = best.copy()
    q_end = q + l
    t_end = t + l
    remaining = valid.copy()
    out = []
    for _ in range(n_cand):
        masked = np.where(remaining, rank_key, NEG)
        i_best = int(np.argmax(masked))
        v = masked[i_best]
        ok = bool(v > NEG * np.float32(0.5)) and bool(valid[i_best])
        ts_i, te_i = st[i_best], t_end[i_best]
        # same-placement suppression: >50% mutual overlap on the genome
        # AND the same DP diagonal band (tandem-shifted competitors keep
        # their own candidate slot)
        ov = np.minimum(te_i, t_end) - np.maximum(ts_i, st)
        span_min = np.minimum(te_i - ts_i, t_end - st)
        d_sel = t_end[i_best] - q_end[i_best]
        same_diag = np.abs((t_end - q_end) - d_sel) < 128
        overlap = (2 * ov > span_min) & same_diag
        remaining &= ~overlap
        # the emitted score is the rank value itself (anchor bases by
        # default; the p-value key under rank_by_pvalue)
        out.append((sq[i_best], q_end[i_best], ts_i, te_i,
                    np.float32(v), ok, i_best,
                    cnt[i_best], sump[i_best]))
    return out


def test_chain_matches_numpy_oracle():
    """Randomized bit-exact equivalence of the device chain DP against
    the NumPy oracle, across lookback windows and weightors."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        # odd trials use an A that is not a multiple of the scan-step
        # unroll (S=8) to exercise the Ap-padding branch
        A = 48 if trial % 2 == 0 else 45
        n = int(rng.integers(8, A))
        read_len = int(rng.integers(80, 400))
        # clustered anchors: a few diagonals plus noise, with ties
        q = rng.integers(0, read_len - 12, n)
        t = np.where(rng.random(n) < 0.7,
                     q + rng.integers(1000, 1040, n),
                     rng.integers(0, 5000, n))
        l = rng.integers(12, 30, n)
        order = np.argsort(t, kind="stable")
        q, t, l = q[order], t[order], l[order]
        qa = np.zeros((1, A), np.int32)
        ta = np.full((1, A), 0x3FFFFFFF, np.int32)
        la = np.zeros((1, A), np.int32)
        va = np.zeros((1, A), bool)
        qa[0, :n], ta[0, :n], la[0, :n], va[0, :n] = q, t, l, True
        nlogp = la.astype(np.float32) * np.float32(np.log(4.0))
        anch = Anchors(jnp.asarray(qa), jnp.asarray(ta), jnp.asarray(la),
                       jnp.asarray(va),
                       jnp.asarray(np.array([n], np.int32)),
                       jnp.asarray(nlogp))
        for lookback, rb, pvt, gc in (
                (0, False, 0, False), (8, False, 0, False),
                (0, True, 0, False), (0, True, 1, False),
                (0, True, 2, False), (0, False, 0, True),
                (0, True, 0, True)):
            c = chain_anchors(anch, jnp.asarray(np.array([read_len],
                                                         np.int32)),
                              n_cand=4, lookback=lookback,
                              rank_by_pvalue=rb, p_value_type=pvt,
                              global_chain=gc)
            D = A if lookback <= 0 or lookback > A else lookback
            want = chain_oracle(qa[0], ta[0], la[0], va[0], nlogp[0],
                                read_len, n_cand=4, D=D,
                                rank_by_pvalue=rb, p_value_type=pvt,
                                global_chain=gc)
            for ci, (wqs, wqe, wts, wte, wsc, wok, wend, wcnt,
                     wsump) in enumerate(want):
                assert bool(c.valid[0, ci]) == wok, (trial, lookback, ci)
                if not wok:
                    continue
                got = (int(c.q_start[0, ci]), int(c.q_end[0, ci]),
                       int(c.t_start[0, ci]), int(c.t_end[0, ci]),
                       int(c.end_idx[0, ci]), int(c.n_anchors[0, ci]))
                assert got == (int(wqs), int(wqe), int(wts), int(wte),
                               wend, int(wcnt)), (trial, lookback, rb,
                                                  pvt, ci)

                # the significance weight accumulates pi*frac: XLA may
                # contract the mul+add into an FMA, so it can differ from
                # NumPy in the last bits — near-equality is its contract.
                # The anchor-bases weight (rank_by_pvalue=False score) is
                # integer-valued and stays bit-exact.
                def close(a, b):
                    return abs(a - b) <= 1e-5 * max(1.0, abs(b))

                if rb and pvt in (0, 2):
                    assert close(float(c.score[0, ci]), float(wsc)), \
                        (trial, lookback, rb, pvt, ci)
                else:
                    assert float(c.score[0, ci]) == float(wsc), \
                        (trial, lookback, rb, pvt, ci)
                assert close(float(c.nlogp[0, ci]), float(wsump)), \
                    (trial, lookback, rb, pvt, ci)


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


def test_global_chain_blocks_overlapping_anchors():
    # --globalChainType >= 1: RestrictedGlobalChain semantics — a
    # successor must start at-or-after the predecessor's end in both
    # coordinates, so heavily overlapping anchors cannot share a chain
    # (the LIS default chains them with clipped gain)
    tr = [(0, 100, 12), (1, 101, 12), (2, 102, 12)]
    a = make_anchors(tr)
    rl = jnp.asarray(np.array([40], np.int32))
    c_lis = chain_anchors(a, rl, n_cand=1)
    c_gc = chain_anchors(a, rl, n_cand=1, global_chain=True)
    assert float(c_lis.score[0, 0]) == 14.0   # 12 + 1 + 1 clipped
    assert float(c_gc.score[0, 0]) == 12.0    # singleton chains only
    assert int(c_gc.n_anchors[0, 0]) == 1


def test_global_chain_tight_drift():
    # drift is capped at 0.1x span with no slack under global chaining:
    # a 20-base diagonal drift over a ~100-base span chains under the
    # default LIS tolerance (0.35x + 50) but not the restricted chain
    tr = [(0, 100, 12), (30, 150, 12)]
    a = make_anchors(tr)
    rl = jnp.asarray(np.array([80], np.int32))
    c_lis = chain_anchors(a, rl, n_cand=1)
    c_gc = chain_anchors(a, rl, n_cand=1, global_chain=True)
    assert int(c_lis.n_anchors[0, 0]) == 2
    assert int(c_gc.n_anchors[0, 0]) == 1


def test_global_chain_keeps_clean_colinear_chain():
    # non-overlapping colinear anchors chain identically either way
    tr = [(0, 100, 12), (20, 121, 12), (40, 140, 12), (60, 161, 12)]
    a = make_anchors(tr)
    rl = jnp.asarray(np.array([80], np.int32))
    c = chain_anchors(a, rl, n_cand=1, global_chain=True)
    assert int(c.n_anchors[0, 0]) == 4
    assert float(c.score[0, 0]) == 48.0


def test_chain_members_walk():
    tr = [(0, 100, 12), (20, 121, 12), (40, 140, 12)]
    a = make_anchors(tr)
    c = chain_anchors(a, jnp.asarray(np.array([60], np.int32)), n_cand=2)
    mq, mt, ml, mv = chain_members(c, a, max_chain=8)
    qs = [int(x) for x, ok in zip(np.asarray(mq[0, 0]), np.asarray(mv[0, 0])) if ok]
    ts = [int(x) for x, ok in zip(np.asarray(mt[0, 0]), np.asarray(mv[0, 0])) if ok]
    assert qs == [0, 20, 40]
    assert ts == [100, 121, 140]
