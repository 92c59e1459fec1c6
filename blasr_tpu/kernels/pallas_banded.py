"""Pallas TPU kernel for the guided banded affine DP.

Drop-in replacement for kernels/banded.banded_align's forward pass (same
semantics and traceback-bit layout — see kernels/banded.py).  The XLA scan
formulation pays ~14 ms per alignment item because vmapped dynamic slices
lower to scalar-core gathers; here every band shift is a dynamic-offset
VMEM vector load, which the VPU does natively.

Structure:
  * grid (N, L/R): program (i, j) advances item i by R query rows; M/I/D
    carries persist in VMEM scratch across the sequential j steps.
  * carries sit in a 128-aligned padded scratch row; the per-row band
    shift (s = o[r] - o[r-1], any value in [0, w_b)) is one dynamic lane
    rotate (Mosaic only allows dynamic offsets in the sublane dim, so
    shifts use ``pltpu.roll`` + static value slices).
  * per-row scalars (read base, band offset) come from small SMEM blocks.
  * the in-row deletion recurrence is a log-depth min-scan (7 shifted
    mins) instead of a sequential lane walk.
  * traceback bits accumulate in an int32 scratch tile and are flushed to
    the uint8 output block once per R rows (aligned full-tile store).
  * TPU block rule: minor block dims must equal the array's minor dims, so
    per-item arrays carry explicit singleton dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blasr_tpu.kernels.banded import ST_D, ST_I, ST_M, BandedResult

INF = 1e30  # python float: jnp scalars would be captured consts in pallas
ROWS_PER_STEP = 256
INTERPRET = False  # set True to run on CPU for testing


def _min_prefix_exclusive(g: jnp.ndarray, w_b: int) -> jnp.ndarray:
    """run_prev[w] = min(g[0..w-1]) with INF at w == 0; g: (1, w_b)."""
    x = jnp.concatenate([jnp.full((1, 1), INF), g[:, : w_b - 1]], axis=1)
    d = 1
    while d < w_b:
        shifted = jnp.concatenate(
            [jnp.full((1, d), INF), x[:, : w_b - d]], axis=1)
        x = jnp.minimum(x, shifted)
        d *= 2
    return x


def _kernel(read_ref, offsets_ref, qa_ref, qb_ref, ta_ref, tb_in_ref,
            submat_ref, gaps_ref, window_ref,
            score_ref, state_ref, ok_ref, bits_ref,
            mM, mI, mD, po_ref, bits_buf,
            *, R: int, w_b: int):
    j = pl.program_id(1)
    qa = qa_ref[0, 0, 0]
    qb = qb_ref[0, 0, 0]
    ta = ta_ref[0, 0, 0]
    tb = tb_in_ref[0, 0, 0]
    ins_open = gaps_ref[0, 0]
    ins_ext = gaps_ref[0, 1]
    del_open = gaps_ref[0, 2]
    del_ext = gaps_ref[0, 3]

    padw = mM.shape[1]

    @pl.when(j == 0)
    def _():
        mM[...] = jnp.full((1, padw), INF)
        mI[...] = jnp.full((1, padw), INF)
        mD[...] = jnp.full((1, padw), INF)
        po_ref[0] = 0
        score_ref[0, 0, 0] = INF
        state_ref[0, 0, 0] = ST_M
        ok_ref[0, 0, 0] = 0

    w_iota_i = jax.lax.broadcasted_iota(jnp.int32, (1, w_b), 1)
    w_iota_f = w_iota_i.astype(jnp.float32)

    wlen = window_ref.shape[2]

    def row(r2, po):
        r = j * R + r2
        o_r = offsets_ref[0, 0, 0, r2]
        active = (r >= qa) & (r < qb)
        first = r == qa
        s = jnp.where(first, 0, o_r - po)

        t_abs = o_r + w_iota_i
        bD = jnp.where(t_abs >= ta,
                       del_open + del_ext * (t_abs - ta).astype(jnp.float32),
                       INF)
        bM = jnp.where(t_abs == ta - 1, 0.0, INF)

        # live carry region sits at lanes [128, 128+w_b); rolled[w] =
        # row[w + s + 127] = band position (w + s - 1), so diag is
        # rolled[0:w_b] and vert (band position w + s) is rolled[1:w_b+1].
        k = padw - (s + 127)
        rM = pltpu.roll(mM[0:1, :], k, axis=1)
        rI = pltpu.roll(mI[0:1, :], k, axis=1)
        rD = pltpu.roll(mD[0:1, :], k, axis=1)
        dM, vM = rM[:, 0:w_b], rM[:, 1:w_b + 1]
        dI, vI = rI[:, 0:w_b], rI[:, 1:w_b + 1]
        dD = rD[:, 0:w_b]
        # first active row: substitute the boundary profiles
        bDp = jnp.concatenate([jnp.full((1, 1), INF), bD[:, : w_b - 1]], 1)
        bM_diag = jnp.where(t_abs == ta, 0.0, INF)  # bM shifted to w-1
        dM = jnp.where(first, bM_diag, dM)
        dI = jnp.where(first, INF, dI)
        dD = jnp.where(first, bDp, dD)
        vM = jnp.where(first, bM, vM)
        vI = jnp.where(first, INF, vI)

        in_t = (t_abs >= ta) & (t_abs < tb)
        in_t_i = (t_abs >= ta - 1) & (t_abs < tb)

        tgt = pltpu.roll(window_ref[0, 0:1, :], wlen - o_r,
                         axis=1)[:, 0:w_b]
        rb = read_ref[0, 0, 0, r2]
        sub = jnp.full((1, w_b), 0.0)
        for c in range(5):
            sub = jnp.where(tgt == c, submat_ref[0, rb * 5 + c], sub)
        eq = (tgt == rb) & (rb < 4)

        diag_best = jnp.minimum(dM, jnp.minimum(dI, dD))
        m_src = jnp.where(dM <= diag_best, ST_M,
                          jnp.where(dI <= diag_best, ST_I, ST_D))
        M = jnp.where(in_t, sub + diag_best, INF)

        i_from_m = vM + ins_open
        i_from_i = vI + ins_ext
        I = jnp.where(in_t_i, jnp.minimum(i_from_m, i_from_i), INF)
        i_open = i_from_m <= i_from_i

        base = jnp.minimum(M, I)
        g = jnp.where(base < INF * 0.5, base - del_ext * w_iota_f, INF)
        run_prev = _min_prefix_exclusive(g, w_b)
        D = jnp.where(in_t,
                      del_ext * w_iota_f + run_prev + (del_open - del_ext),
                      INF)
        D = jnp.minimum(D, INF)
        base_prev = jnp.concatenate(
            [jnp.full((1, 1), INF), base[:, : w_b - 1]], 1)
        d_open = D >= base_prev + del_open
        M_prev = jnp.concatenate([jnp.full((1, 1), INF), M[:, : w_b - 1]], 1)
        I_prev = jnp.concatenate([jnp.full((1, 1), INF), I[:, : w_b - 1]], 1)
        d_from_m = M_prev <= I_prev

        bits = (m_src
                | (i_open.astype(jnp.int32) << 2)
                | (d_open.astype(jnp.int32) << 3)
                | (d_from_m.astype(jnp.int32) << 4)
                | (eq.astype(jnp.int32) << 5))
        bits = jnp.where(active, bits, 0)
        bits_buf[pl.ds(r2, 1), :] = bits

        @pl.when(active)
        def _():
            mM[0:1, 128:128 + w_b] = M
            mI[0:1, 128:128 + w_b] = I
            mD[0:1, 128:128 + w_b] = D

        @pl.when((r == qb - 1) & active)
        def _():
            wf = tb - 1 - o_r
            okw = (wf >= 0) & (wf < w_b)
            wfc = jnp.clip(wf, 0, w_b - 1)
            onehot = w_iota_i == wfc
            cM = jnp.min(jnp.where(onehot, M, INF))
            cI = jnp.min(jnp.where(onehot, I, INF))
            cD = jnp.min(jnp.where(onehot, D, INF))
            cbest = jnp.minimum(cM, jnp.minimum(cI, cD))
            cstate = jnp.where(cM <= cbest, ST_M,
                               jnp.where(cI <= cbest, ST_I, ST_D))
            hit = okw & (cbest < INF * 0.5)
            score_ref[0, 0, 0] = jnp.where(hit, cbest, INF)
            state_ref[0, 0, 0] = jnp.where(hit, cstate, jnp.int32(ST_M))
            ok_ref[0, 0, 0] = jnp.where(hit, 1, 0)

        return jnp.where(active, o_r, po)

    po = jax.lax.fori_loop(0, R, row, po_ref[0])
    po_ref[0] = po
    bits_ref[0, 0, :, :] = bits_buf[...].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("w_b",))
def pallas_banded_align(
    reads, windows, offsets, qa, qb, ta, tb, submat,
    ins_open, ins_ext, del_open, del_ext, *, w_b: int = 128,
) -> BandedResult:
    """Same contract as kernels.banded.banded_align (forward pass)."""
    N, L = reads.shape
    W = windows.shape[1]
    R = min(ROWS_PER_STEP, L)
    assert L % R == 0, (L, R)
    J = L // R
    padw = 2 * w_b + 128
    gaps = jnp.stack([
        jnp.asarray(ins_open, jnp.float32), jnp.asarray(ins_ext, jnp.float32),
        jnp.asarray(del_open, jnp.float32), jnp.asarray(del_ext, jnp.float32),
    ]).reshape(1, 4)
    submat_p = jnp.zeros((1, 32), jnp.float32).at[0, :25].set(
        jnp.asarray(submat, jnp.float32))
    wpad = jnp.concatenate(
        [windows.astype(jnp.int32),
         jnp.full((N, w_b), 4, dtype=jnp.int32)], axis=1)

    kernel = functools.partial(_kernel, R=R, w_b=w_b)
    grid_spec = pl.GridSpec(
        grid=(N, J),
        scratch_shapes=[
            pltpu.VMEM((1, padw), jnp.float32),
            pltpu.VMEM((1, padw), jnp.float32),
            pltpu.VMEM((1, padw), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((R, w_b), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 1, 1, R), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),     # read codes (int32)
            pl.BlockSpec((1, 1, 1, R), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),     # offsets
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),     # qa
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),     # qb
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),     # ta
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),     # tb
            pl.BlockSpec((1, 32), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),     # submat
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),     # gap costs
            pl.BlockSpec((1, 1, W + w_b), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),     # window (int32)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R, w_b), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    score, state, ok, bits = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, J, R, w_b), jnp.uint8),
        ],
    )(reads.astype(jnp.int32).reshape(N, J, 1, R),
      offsets.astype(jnp.int32).reshape(N, J, 1, R),
      qa.reshape(N, 1, 1), qb.reshape(N, 1, 1),
      ta.reshape(N, 1, 1), tb.reshape(N, 1, 1),
      submat_p, gaps, wpad.reshape(N, 1, W + w_b))
    return BandedResult(
        score=score.reshape(N),
        tbbits=bits.reshape(N, L, w_b),
        final_state=state.reshape(N),
        valid=ok.reshape(N) > 0,
    )
