"""QV-steered banded DP vs a full NumPy oracle.

The reference's PairwiseLocalAlign runs KBandAlign with an IDS/QV score
function when QVs are present (iblasr/BlasrAlignImpl.hpp:1276-1298), so
insertion/deletion/substitution QVs change the traceback PATH, not just
the rescore.  These tests pin the kernel's QV mode against an unbanded
oracle with the same per-row cost semantics, replay the RL traceback to
prove the emitted path achieves the DP score, and show a QV pattern
steering an ambiguous indel placement.
"""

import jax.numpy as jnp
import numpy as np

from blasr_tpu.kernels.banded import banded_align, banded_traceback
from blasr_tpu.params import default_score_matrix

INF = 1e30


def pack_qv(insq, delq, subq, dtag, stag, dpri, spri):
    q1 = (np.asarray(insq, np.int32)
          | (np.asarray(delq, np.int32) << 8)
          | (np.asarray(subq, np.int32) << 16)
          | (np.asarray(dtag, np.int32) << 24)
          | (np.asarray(stag, np.int32) << 27))
    q2 = np.asarray(dpri, np.int32) | (np.asarray(spri, np.int32) << 8)
    return q1, q2


def oracle_qv(read, tgt, submat, insq, delq, subq, dtag, stag, dpri, spri):
    """Unbanded DP with IDS per-row costs (linear gaps)."""
    n, m = len(read), len(tgt)

    def csub(i, j):  # read row i, target pos j
        if read[i] == tgt[j] and read[i] < 4:
            return submat[read[i] * 5 + tgt[j]]
        return subq[i] if tgt[j] == stag[i] else spri[i]

    def cdel(i, j):  # deleting tgt[j] while at query row i
        return delq[i] if tgt[j] == dtag[i] else dpri[i]

    M = np.full((n + 1, m + 1), INF)
    I = np.full((n + 1, m + 1), INF)
    D = np.full((n + 1, m + 1), INF)
    M[0][0] = 0.0
    for j in range(1, m + 1):
        D[0][j] = (D[0][j - 1] if j > 1 else 0.0) + cdel(0, j - 1)
    for i in range(1, n + 1):
        I[i][0] = min(M[i - 1][0], I[i - 1][0]) + insq[i - 1]
        for j in range(1, m + 1):
            M[i][j] = csub(i - 1, j - 1) + min(
                M[i - 1][j - 1], I[i - 1][j - 1], D[i - 1][j - 1])
            I[i][j] = min(M[i - 1][j], I[i - 1][j]) + insq[i - 1]
            D[i][j] = min(M[i][j - 1], I[i][j - 1],
                          D[i][j - 1]) + cdel(i - 1, j - 1)
    return min(M[n][m], I[n][m], D[n][m])


def run_kernel_qv(read, window, qa, qb, ta, tb, qv1, qv2, w_b=32):
    window = np.concatenate([[4], window]).astype(np.int8)
    ta, tb = ta + 1, tb + 1
    L, W = len(read), len(window)
    submat = np.asarray(default_score_matrix(), np.float32).reshape(25)
    r = np.arange(L)
    center = ta + (r - qa)
    off = np.clip(center - w_b // 2, 0, W - w_b)
    off = np.maximum.accumulate(off).astype(np.int32)
    res = banded_align(
        jnp.asarray(read, jnp.int8)[None],
        jnp.asarray(window, jnp.int8)[None], jnp.asarray(off)[None],
        jnp.asarray([qa], jnp.int32), jnp.asarray([qb], jnp.int32),
        jnp.asarray([ta], jnp.int32), jnp.asarray([tb], jnp.int32),
        jnp.asarray(submat), 4.0, 4.0, 5.0, 5.0, w_b=w_b,
        qv1=jnp.asarray(qv1, jnp.int32)[None],
        qv2=jnp.asarray(qv2, jnp.int32)[None])
    tbk = banded_traceback(
        res, jnp.asarray(off)[None],
        jnp.asarray([qa], jnp.int32), jnp.asarray([qb], jnp.int32),
        jnp.asarray([ta], jnp.int32), jnp.asarray([tb], jnp.int32),
        t_max=L + W, w_b=w_b)
    return res, tbk, submat


def replay_qv(pairs_row, read, window01, qa, ta, submat,
              insq, delq, subq, dtag, stag, dpri, spri):
    """Recompute the path cost from the RL pairs with the QV costs;
    returns (cost, q_end, t_end, insertion query columns)."""
    from blasr_tpu.pipeline.map_read import unpack_pairs
    ops_e, cnts = unpack_pairs(pairs_row)
    ops = []
    for op, c in zip(ops_e[::-1], cnts[::-1]):
        ops.extend([int(op)] * int(c))
    q, t = qa, ta
    cost = 0.0
    ins_cols = []
    for op in ops:
        if op == 1:
            if read[q] == window01[t] and read[q] < 4:
                cost += submat[read[q] * 5 + window01[t]]
            else:
                cost += subq[q] if window01[t] == stag[q] else spri[q]
            q += 1
            t += 1
        elif op == 2:
            cost += insq[q]
            ins_cols.append(q)
            q += 1
        elif op == 3:
            # deletions are priced with the LAST consumed query row (the
            # kernel's current row); boundary deletions use row qa
            r = max(q - 1, qa)
            cost += delq[r] if window01[t] == dtag[r] else dpri[r]
            t += 1
    return cost, q, t, ins_cols


def random_tracks(rng, L):
    insq = rng.integers(1, 30, L)
    delq = rng.integers(1, 30, L)
    subq = rng.integers(1, 30, L)
    dtag = rng.integers(0, 5, L)
    stag = rng.integers(0, 5, L)
    dpri = np.full(L, 13)
    spri = np.full(L, 20)
    return insq, delq, subq, dtag, stag, dpri, spri


def test_qv_dp_matches_oracle_random():
    rng = np.random.default_rng(7)
    submat = np.asarray(default_score_matrix(), np.float32).reshape(25)
    for case in range(12):
        m = int(rng.integers(30, 60))
        tgt = rng.integers(0, 4, m, dtype=np.int8)
        # read = noisy copy of tgt
        read = []
        for b in tgt:
            u = rng.random()
            if u < 0.06:
                read.append(int(rng.integers(0, 4)))   # substitution
            elif u < 0.10:
                read.append(int(b))
                read.append(int(rng.integers(0, 4)))   # insertion
            elif u < 0.14:
                pass                                   # deletion
            else:
                read.append(int(b))
        read = np.asarray(read, np.int8)
        n = len(read)
        tr = random_tracks(rng, n)
        qv1, qv2 = pack_qv(*tr)
        res, tbk, _ = run_kernel_qv(read, tgt, 0, n, 0, m, qv1, qv2,
                                    w_b=32)
        assert bool(res.valid[0]), f"case {case} did not reach the end"
        want = oracle_qv(read, tgt, submat, *[np.asarray(x) for x in tr])
        assert float(res.score[0]) == want, f"case {case}"
        # replay: the emitted path must cost exactly the DP score
        win01 = np.concatenate([[4], tgt]).astype(np.int8)
        cost, qe, te, _ = replay_qv(
            np.asarray(tbk.pairs[0]), read, win01, 0, 1, submat, *tr)
        assert cost == want and qe == n and te == m + 1
        # count bookkeeping
        assert (int(tbk.n_match[0]) + int(tbk.n_mismatch[0])
                + int(tbk.n_ins[0])) == n
        assert (int(tbk.n_match[0]) + int(tbk.n_mismatch[0])
                + int(tbk.n_del[0])) == m


def test_qv_steers_insertion_placement():
    """An ambiguous inserted base lands where insertionQV is lowest —
    the QV changes the PATH, not just the score."""
    rng = np.random.default_rng(3)
    tgt = rng.integers(0, 4, 48, dtype=np.int8)
    # homopolymer run: the extra T can sit at any of the four run
    # columns with the same match count, so flat costs leave a tie
    tgt[9] = 0
    tgt[10:13] = 3
    tgt[13] = 0
    read = np.concatenate([tgt[:12], [3], tgt[12:]]).astype(np.int8)
    n = len(read)
    base = dict(delq=np.full(n, 13), subq=np.full(n, 20),
                dtag=np.full(n, 7), stag=np.full(n, 7),
                dpri=np.full(n, 13), spri=np.full(n, 20))

    def run(insq):
        qv1, qv2 = pack_qv(insq, base["delq"], base["subq"], base["dtag"],
                           base["stag"], base["dpri"], base["spri"])
        res, tbk, submat = run_kernel_qv(read, tgt, 0, n, 0, len(tgt),
                                         qv1, qv2, w_b=32)
        assert bool(res.valid[0])
        win01 = np.concatenate([[4], tgt]).astype(np.int8)
        _, _, _, ins_cols = replay_qv(
            np.asarray(tbk.pairs[0]), read, win01, 0, 1, submat,
            insq, base["delq"], base["subq"], base["dtag"], base["stag"],
            base["dpri"], base["spri"])
        return ins_cols

    cheap_early = np.full(n, 25)
    cheap_early[11] = 2
    cheap_late = np.full(n, 25)
    cheap_late[13] = 2
    a = run(cheap_early)
    b = run(cheap_late)
    assert len(a) == 1 and len(b) == 1
    assert a[0] != b[0], "insertionQV did not steer the placement"
    assert a[0] == 11 and b[0] == 13


def test_qv_deletion_tag_prices_deletion():
    """Deleting a target base that matches the DeletionTag costs the
    (low) deletionQV; a non-matching base costs the global prior."""
    submat = np.asarray(default_score_matrix(), np.float32).reshape(25)
    tgt = np.asarray([0, 1, 2, 3] * 10, np.int8)
    read = np.concatenate([tgt[:20], tgt[21:]]).astype(np.int8)  # del tgt[20]
    n = len(read)
    insq = np.full(n, 20)
    delq = np.full(n, 2)
    subq = np.full(n, 20)
    stag = np.full(n, 7)
    spri = np.full(n, 20)
    dpri = np.full(n, 13)
    # tag matches the deleted base (tgt[20] == 0)
    dtag = np.full(n, 0)
    qv1, qv2 = pack_qv(insq, delq, subq, dtag, stag, dpri, spri)
    res, tbk, _ = run_kernel_qv(read, tgt, 0, n, 0, len(tgt), qv1, qv2)
    want = oracle_qv(read, tgt, submat, insq, delq, subq, dtag, stag,
                     dpri, spri)
    assert float(res.score[0]) == want
    # 39 matches at -5 plus one tag-priced deletion at 2
    assert want == -5.0 * 39 + 2.0
    # tag never matches -> the deletion costs the global prior instead
    dtag2 = np.full(n, 7)
    qv1b, qv2b = pack_qv(insq, delq, subq, dtag2, stag, dpri, spri)
    res2, _, _ = run_kernel_qv(read, tgt, 0, n, 0, len(tgt), qv1b, qv2b)
    assert float(res2.score[0]) == -5.0 * 39 + 13.0
