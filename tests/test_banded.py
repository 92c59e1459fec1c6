"""Banded affine DP kernel vs full (unbanded) Gotoh oracle.

The oracle implements the same state machine as the kernel:
  M from min(M,I,D) diag;  I opens from M / extends I (vertical, consumes
  read);  D opens from min(M,I) / extends D (horizontal, consumes target).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from blasr_tpu.kernels.banded import banded_align, banded_traceback
from blasr_tpu.params import default_score_matrix

INF = 1e30


def oracle(read, tgt, submat, io, ie, do, de):
    n, m = len(read), len(tgt)
    M = np.full((n + 1, m + 1), INF)
    I = np.full((n + 1, m + 1), INF)
    D = np.full((n + 1, m + 1), INF)
    M[0][0] = 0.0
    for j in range(1, m + 1):
        D[0][j] = do + de * (j - 1)
    for i in range(1, n + 1):
        I[i][0] = io + ie * (i - 1)
        for j in range(0, m + 1):
            if j > 0:
                sub = submat[read[i - 1] * 5 + tgt[j - 1]]
                M[i][j] = sub + min(M[i - 1][j - 1], I[i - 1][j - 1],
                                    D[i - 1][j - 1])
            I[i][j] = min(I[i][j], M[i - 1][j] + io, I[i - 1][j] + ie)
            if j > 0:
                D[i][j] = min(D[i][j], M[i][j - 1] + do, I[i][j - 1] + do,
                              D[i][j - 1] + de)
    return min(M[n][m], I[n][m], D[n][m])


def run_kernel(read, window, qa, qb, ta, tb, io=4, ie=4, do=5, de=5, w_b=32,
               center=None):
    # kernel requires ta >= 1 (boundary cell at ta-1): shift window by one
    # sentinel N; traceback ops are unaffected by the shift
    window = np.concatenate([[4], window]).astype(np.int8)
    ta, tb = ta + 1, tb + 1
    L = len(read)
    W = len(window)
    submat = np.asarray(default_score_matrix(), np.float32).reshape(25)
    r = np.arange(L)
    center = ta + (r - qa) if center is None else np.asarray(center) + 1
    off = np.clip(center - w_b // 2, 0, W - w_b)
    off = np.maximum.accumulate(off).astype(np.int32)
    res = banded_align(
        jnp.asarray(read, jnp.int8)[None], jnp.asarray(window, jnp.int8)[None],
        jnp.asarray(off)[None],
        jnp.asarray([qa], jnp.int32), jnp.asarray([qb], jnp.int32),
        jnp.asarray([ta], jnp.int32), jnp.asarray([tb], jnp.int32),
        jnp.asarray(submat), float(io), float(ie), float(do), float(de),
        w_b=w_b)
    tbk = banded_traceback(res, jnp.asarray(off)[None],
                           jnp.asarray([qa], jnp.int32), jnp.asarray([qb], jnp.int32),
                           jnp.asarray([ta], jnp.int32), jnp.asarray([tb], jnp.int32),
                           t_max=L + W, w_b=w_b)
    return res, tbk, submat, off


def replay_ops(pairs_row, read, window, qa, ta, submat, io, ie, do, de):
    """Recompute cost + consumption from the RL traceback pairs."""
    from blasr_tpu.pipeline.map_read import unpack_pairs
    ops_e, cnts = unpack_pairs(pairs_row)
    ops = []
    for op, c in zip(ops_e[::-1], cnts[::-1]):
        ops.extend([int(op)] * int(c))
    q, t = qa, ta
    cost = 0.0
    prev = None
    for op in ops:
        if op in (1, 4):
            cost += submat[read[q] * 5 + window[t]]
            q += 1
            t += 1
        elif op == 2:
            cost += io if prev != 2 else ie
            q += 1
        elif op == 3:
            cost += do if prev != 3 else de
            t += 1
        prev = op
    return cost, q, t


def test_exact_match_score():
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 40, dtype=np.int8)
    res, tbk, submat, _ = run_kernel(seq, seq, 0, 40, 0, 40)
    assert bool(res.valid[0])
    assert float(res.score[0]) == -5.0 * 40
    assert int(tbk.n_match[0]) == 40
    assert int(tbk.n_mismatch[0]) == int(tbk.n_ins[0]) == int(tbk.n_del[0]) == 0


def test_single_substitution():
    rng = np.random.default_rng(1)
    tgt = rng.integers(0, 4, 40, dtype=np.int8)
    read = tgt.copy()
    read[20] = (read[20] + 1) % 4
    res, tbk, *_ = run_kernel(read, tgt, 0, 40, 0, 40)
    assert float(res.score[0]) == -5.0 * 39 + 6.0
    assert int(tbk.n_mismatch[0]) == 1


def test_single_insertion_and_deletion():
    rng = np.random.default_rng(2)
    tgt = rng.integers(0, 4, 41, dtype=np.int8)
    # read = tgt with one base inserted at 15
    read = np.concatenate([tgt[:15], [2], tgt[15:]]).astype(np.int8)
    res, tbk, *_ = run_kernel(read, tgt, 0, len(read), 0, len(tgt))
    sc = float(res.score[0])
    # one insertion (cost 4) somewhere; rest matches (or a 6+(-5) tie is worse)
    assert sc == -5.0 * 41 + 4.0
    assert int(tbk.n_ins[0]) >= 1

    # read = tgt with one base deleted
    read2 = np.concatenate([tgt[:15], tgt[16:]]).astype(np.int8)
    res2, tbk2, *_ = run_kernel(read2, tgt, 0, len(read2), 0, len(tgt))
    assert float(res2.score[0]) == -5.0 * 40 + 5.0
    assert int(tbk2.n_del[0]) >= 1


def test_traceback_overflow_flag_and_dense_rerun():
    """A pair capacity below the alignment's RL pair count must flag
    overflow; the dense bound (t_max = L + W) must then complete with
    identical counts (the Mapper's rerun contract)."""
    rng = np.random.default_rng(9)
    tgt = rng.integers(0, 4, 200, dtype=np.int8)
    # alternate ins every ~3 bases: many short M runs -> many RL pairs
    read = []
    for j, b in enumerate(tgt):
        read.append(b)
        if j % 3 == 0:
            read.append(rng.integers(0, 4))
    read = np.array(read, dtype=np.int8)
    window = np.concatenate([[4], tgt]).astype(np.int8)
    L, W = len(read), len(window)
    submat = np.asarray(default_score_matrix(), np.float32).reshape(25)
    r = np.arange(L)
    # true path: ~3 target bases per 4 read rows (one ins per 3 matches)
    off = np.clip(1 + (3 * r) // 4 - 16, 0, W - 32)
    off = np.maximum.accumulate(off).astype(np.int32)
    args = (jnp.asarray(read, jnp.int8)[None],
            jnp.asarray(window, jnp.int8)[None], jnp.asarray(off)[None],
            jnp.asarray([0], jnp.int32), jnp.asarray([L], jnp.int32),
            jnp.asarray([1], jnp.int32), jnp.asarray([W], jnp.int32))
    res = banded_align(*args[:2], args[2], *args[3:],
                       jnp.asarray(submat), 4.0, 4.0, 5.0, 5.0, w_b=32)
    tb_args = (args[2][0][None], args[3], args[4], args[5], args[6])
    small = banded_traceback(res, *tb_args, t_max=64, w_b=32)
    assert bool(small.overflow[0])
    dense = banded_traceback(res, *tb_args, t_max=L + W, w_b=32)
    assert not bool(dense.overflow[0])
    # the dense run replays to the exact score and consumes everything
    cost, q, t = replay_ops(np.asarray(dense.pairs[0]), read, window, 0, 1,
                            submat, 4, 4, 5, 5)
    assert cost == pytest.approx(float(res.score[0]))
    assert (q, t) == (L, W)
    assert int(dense.n_ins[0]) >= 60


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("affine", [False, True])
def test_vs_oracle_random(seed, affine):
    rng = np.random.default_rng(seed)
    m = 50
    tgt = rng.integers(0, 4, m, dtype=np.int8)
    # read: mutated copy (sub/ins/del)
    read = []
    for b in tgt:
        x = rng.random()
        if x < 0.06:
            continue
        if x < 0.12:
            read.append(rng.integers(0, 4))
        else:
            read.append(b)
        if rng.random() < 0.08:
            read.append(rng.integers(0, 4))
    read = np.array(read, dtype=np.int8)
    io, ie, do, de = (10.0, 1.0, 12.0, 2.0) if affine else (4.0, 4.0, 5.0, 5.0)
    res, tbk, submat, _ = run_kernel(read, tgt, 0, len(read), 0, len(tgt),
                                     io=io, ie=ie, do=do, de=de)
    expect = oracle(read, tgt, submat, io, ie, do, de)
    assert bool(res.valid[0])
    assert float(res.score[0]) == pytest.approx(expect), f"seed={seed}"
    # traceback replay must reproduce the score exactly and consume all bases
    cost, q, t = replay_ops(np.asarray(tbk.pairs[0]), read, tgt, 0, 0,
                            submat, io, ie, do, de)
    assert cost == pytest.approx(float(res.score[0]))
    assert q == len(read) and t == len(tgt)


def test_subrange_alignment():
    """Alignment restricted to [qa,qb) x [ta,tb) inside larger arrays."""
    rng = np.random.default_rng(7)
    window = rng.integers(0, 4, 80, dtype=np.int8)
    read = np.full(64, 4, dtype=np.int8)
    qa, qb, ta, tb = 5, 35, 20, 50
    read[qa:qb] = window[ta:tb]
    res, tbk, submat, _ = run_kernel(read, window, qa, qb, ta, tb)
    assert bool(res.valid[0])
    assert float(res.score[0]) == -5.0 * 30
    assert int(tbk.n_match[0]) == 30
    cost, q, t = replay_ops(np.asarray(tbk.pairs[0]), read, window, qa, ta,
                            submat, 4, 4, 5, 5)
    assert (q, t) == (qb, tb)


def test_band_shift_with_offset_jump():
    """Band offsets that jump (target gap between anchors) still produce a
    valid alignment whose replayed cost equals the DP score."""
    rng = np.random.default_rng(8)
    a = rng.integers(0, 4, 30, dtype=np.int8)
    b = rng.integers(0, 4, 30, dtype=np.int8)
    gap = rng.integers(0, 4, 25, dtype=np.int8)
    window = np.concatenate([a, gap, b]).astype(np.int8)
    read = np.concatenate([a, b]).astype(np.int8)
    L, W = len(read), len(window)
    # guide path: diagonal through a, jump by 25, diagonal through b
    center = np.where(np.arange(L) < 30, np.arange(L), np.arange(L) + 25)
    res, tbk, submat, _ = run_kernel(read, window, 0, L, 0, W, w_b=32,
                                     center=center)
    assert bool(res.valid[0])
    assert float(res.score[0]) == -5.0 * 60 + 5.0 + 5.0 * 24
    cost, q, t = replay_ops(np.asarray(tbk.pairs[0]), read, window, 0, 0,
                            submat, 4, 4, 5, 5)
    assert cost == pytest.approx(float(res.score[0]))
    assert (q, t) == (L, W)


def test_hp_insertion_band():
    """Affine hp-insertion track (AffineKBandAlign's hpIns band,
    BlasrAlignImpl.hpp:1262-1266): homopolymer insertions extend cheaper
    than arbitrary insertions; without the track both cost the same."""
    import numpy as np
    import jax.numpy as jnp
    from blasr_tpu.kernels.banded import banded_align, banded_traceback

    rng = np.random.default_rng(5)
    tgt = rng.integers(0, 4, 120).astype(np.int8)
    tgt[50:54] = 0  # AAAA homopolymer
    W = 256
    win = np.full(W, 4, np.int8)
    win[1:121] = tgt

    def mk_read(insert):
        r = np.concatenate([tgt[:54], insert, tgt[54:]]).astype(np.int8)
        return r

    hp_read = mk_read(np.zeros(4, np.int8))          # AAAA inserted (hp)
    rnd_read = mk_read(np.array([1, 2, 1, 2], np.int8))
    L = 128
    reads = np.full((2, L), 4, np.int8)
    reads[0, :len(hp_read)] = hp_read
    reads[1, :len(rnd_read)] = rnd_read
    offs = np.clip(np.arange(L)[None, :] - 32, 0, W - 128).astype(np.int32)
    offs = np.repeat(offs, 2, axis=0)
    qa = jnp.zeros(2, jnp.int32)
    qb = jnp.full(2, len(hp_read), jnp.int32)
    ta = jnp.full(2, 1, jnp.int32)
    tb = jnp.full(2, 121, jnp.int32)
    sub = jnp.asarray(np.where(np.eye(5, dtype=bool), -5.0, 6.0)
                      .reshape(25).astype(np.float32))
    args = (jnp.asarray(reads), jnp.asarray(win)[None].repeat(2, 0),
            jnp.asarray(offs), qa, qb, ta, tb, sub, 7.0, 4.0, 5.0, 5.0)
    plain = banded_align(*args, w_b=128)
    hp = banded_align(*args, w_b=128, use_hp=True, hp_open=7.0, hp_ext=2.0)
    s_plain = np.asarray(plain.score)
    s_hp = np.asarray(hp.score)
    # without the track, both inserts cost the same
    assert s_plain[0] == s_plain[1]
    # with it, the homopolymer insert is cheaper; the random one unchanged
    assert s_hp[0] < s_hp[1]
    assert s_hp[1] == s_plain[1]
    # traceback through the H state stays consistent
    tbk = banded_traceback(hp, jnp.asarray(offs), qa, qb, ta, tb,
                           t_max=L + W, w_b=128)
    n_ins = np.asarray(tbk.n_ins)
    assert n_ins[0] == 4 and n_ins[1] == 4
    qc = np.asarray(tbk.n_match + tbk.n_mismatch + tbk.n_ins)
    assert (qc == len(hp_read)).all()
