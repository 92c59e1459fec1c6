"""Pallas banded-DP kernel vs the XLA reference kernel (interpret mode).

The v2 Pallas kernel (kernels/pallas_banded.py) must reproduce
kernels/banded.banded_align bit-for-bit (scores, validity, and traceback
bits drive CIGARs) for any offsets path with per-row slope in {0, 1, 2}.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import blasr_tpu.kernels.pallas_banded as pb
from blasr_tpu.kernels.banded import banded_align, banded_traceback
from blasr_tpu.params import MappingParams


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pb, "INTERPRET", True)


def _random_case(rng, N, L, W, w_b=128):
    reads = rng.integers(0, 4, (N, L)).astype(np.int8)
    windows = rng.integers(0, 4, (N, W)).astype(np.int8)
    qa = rng.integers(0, 8, N).astype(np.int32)
    qb = (qa + rng.integers(L // 2, L - 8, N)).astype(np.int32)
    # plant each read's aligned span into its window on a noisy diagonal so
    # alignments exist, then derive a slope-{0,1,2} offsets path around it
    ta = rng.integers(1, 40, N).astype(np.int32)
    offs = np.zeros((N, L), np.int32)
    tb = np.zeros(N, np.int32)
    for i in range(N):
        t = ta[i]
        for r in range(qa[i], qb[i]):
            u = rng.random()
            if u < 0.08:
                pass                       # insertion: target stalls
            elif u < 0.16 and t + 2 < W:
                windows[i, t] = rng.integers(0, 4)
                t += 2                     # deletion: target skips
            else:
                if rng.random() < 0.9:
                    windows[i, t] = reads[i, r]
                t += 1
            t = min(t, W - 1)
        tb[i] = min(t + 1, W)
        center = np.minimum(
            ta[i] + np.maximum(np.arange(L) - int(qa[i]), 0), W - 1)
        offs[i] = np.clip(center - w_b // 2, 0, W - w_b)
    offs = np.asarray(pb.slope_limit_offsets(jnp.asarray(offs), w_b))
    return (jnp.asarray(reads), jnp.asarray(windows), jnp.asarray(offs),
            jnp.asarray(qa), jnp.asarray(qb), jnp.asarray(ta),
            jnp.asarray(tb))


def test_matches_xla_kernel():
    rng = np.random.default_rng(7)
    N, L, W = 8, 256, 512
    reads, windows, offs, qa, qb, ta, tb = _random_case(rng, N, L, W)
    p = MappingParams().make_sane()
    submat = jnp.asarray(
        np.asarray(p.score_matrix, np.float32).reshape(25))
    args = (reads, windows, offs, qa, qb, ta, tb, submat,
            4.0, 4.0, 5.0, 5.0)
    ref = banded_align(*args, w_b=128)
    out = pb.pallas_banded_align(*args, w_b=128)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(ref.score)[v],
                                  np.asarray(out.score)[v])
    np.testing.assert_array_equal(np.asarray(ref.final_state)[v],
                                  np.asarray(out.final_state)[v])
    # traceback bits only matter inside the active region; compare ops
    tb_ref = banded_traceback(ref, offs, qa, qb, ta, tb, t_max=L + W)
    tb_out = banded_traceback(out, offs, qa, qb, ta, tb, t_max=L + W)
    np.testing.assert_array_equal(np.asarray(tb_ref.pairs)[v],
                                  np.asarray(tb_out.pairs)[v])


def test_n_not_multiple_of_8():
    rng = np.random.default_rng(11)
    N, L, W = 5, 128, 384
    reads, windows, offs, qa, qb, ta, tb = _random_case(rng, N, L, W)
    p = MappingParams().make_sane()
    submat = jnp.asarray(np.asarray(p.score_matrix, np.float32).reshape(25))
    args = (reads, windows, offs, qa, qb, ta, tb, submat, 4.0, 4.0, 5.0, 5.0)
    ref = banded_align(*args, w_b=128)
    out = pb.pallas_banded_align(*args, w_b=128)
    assert out.score.shape[0] == N
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_array_equal(np.asarray(ref.score)[v],
                                  np.asarray(out.score)[v])


def test_qv_mode_matches_xla_kernel():
    """QV-steered mode (round 5): per-row IDS cost tracks inside the
    Pallas kernel must reproduce the XLA QV kernel bit-for-bit (scores
    and traceback paths)."""
    rng = np.random.default_rng(23)
    N, L, W = 8, 256, 512
    reads, windows, offs, qa, qb, ta, tb = _random_case(rng, N, L, W)
    p = MappingParams().make_sane()
    submat = jnp.asarray(np.asarray(p.score_matrix, np.float32).reshape(25))
    insq = rng.integers(1, 30, (N, L)).astype(np.int64)
    delq = rng.integers(1, 30, (N, L)).astype(np.int64)
    subq = rng.integers(1, 30, (N, L)).astype(np.int64)
    dtag = rng.choice([0, 1, 2, 3, 7], (N, L)).astype(np.int64)
    stag = rng.choice([0, 1, 2, 3, 7], (N, L)).astype(np.int64)
    qv1 = jnp.asarray(insq | (delq << 8) | (subq << 16) | (dtag << 24)
                      | (stag << 27), jnp.int32)
    qv2 = jnp.asarray(np.full((N, L), 13 | (20 << 8)), jnp.int32)
    args = (reads, windows, offs, qa, qb, ta, tb, submat,
            4.0, 4.0, 5.0, 5.0)
    ref = banded_align(*args, w_b=128, qv1=qv1, qv2=qv2)
    out = pb.pallas_banded_align(*args, w_b=128, qv1=qv1, qv2=qv2)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    v = np.asarray(ref.valid)
    assert v.any()
    np.testing.assert_array_equal(np.asarray(ref.score)[v],
                                  np.asarray(out.score)[v])
    np.testing.assert_array_equal(np.asarray(ref.final_state)[v],
                                  np.asarray(out.final_state)[v])
    tb_ref = banded_traceback(ref, offs, qa, qb, ta, tb, t_max=L + W)
    tb_out = banded_traceback(out, offs, qa, qb, ta, tb, t_max=L + W)
    np.testing.assert_array_equal(np.asarray(tb_ref.pairs)[v],
                                  np.asarray(tb_out.pairs)[v])


def test_affine_gaps():
    rng = np.random.default_rng(3)
    N, L, W = 8, 192, 448
    reads, windows, offs, qa, qb, ta, tb = _random_case(rng, N, L, W)
    p = MappingParams().make_sane()
    submat = jnp.asarray(np.asarray(p.score_matrix, np.float32).reshape(25))
    args = (reads, windows, offs, qa, qb, ta, tb, submat,
            14.0, 1.0, 15.0, 1.0)
    ref = banded_align(*args, w_b=128)
    out = pb.pallas_banded_align(*args, w_b=128)
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_array_equal(np.asarray(ref.score)[v],
                                  np.asarray(out.score)[v])
    tb_ref = banded_traceback(ref, offs, qa, qb, ta, tb, t_max=L + W)
    tb_out = banded_traceback(out, offs, qa, qb, ta, tb, t_max=L + W)
    np.testing.assert_array_equal(np.asarray(tb_ref.pairs)[v],
                                  np.asarray(tb_out.pairs)[v])
