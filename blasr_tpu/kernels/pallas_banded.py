"""Pallas TPU kernel for the guided banded affine DP (8-way vectorized).

Drop-in replacement for kernels/banded.banded_align's forward pass (same
semantics and traceback-bit layout — see kernels/banded.py), serving the
reference's KBandAlign / AffineKBandAlign / GuidedAlign / AffineGuidedAlign
roles (iblasr/BlasrAlignImpl.hpp:1227-1309, BlasrUtilsImpl.hpp:620-903).

Design (v2): the VPU is 8 sublanes x 128 lanes; one grid program advances
ITEMS (default 32) alignment items together, one query row at a time, with
every vector op an (ITEMS, 128) multi-vreg op.  ITEMS > 8 interleaves
independent in-row prefix-min chains (the latency bottleneck: 7 dependent
lane-shift+min steps per row), hiding each chain's latency behind the
others' issue slots — 32 items measured ~3x faster than 8 on v5e:

  * The band offset path is required to advance by s in {0, 1, 2} per query
    row (the host-side offsets builder enforces this).  Aligning row r-1's
    band carries to row r's band is then a 3-way select between statically
    shifted copies — no per-item dynamic rolls in the hot loop.
  * Target bases ride in a (8, TGTW) register window refilled once per
    64-row block by one dynamic ``pltpu.roll`` per item, then shifted with
    the same 3-way select each row.
  * Absolute target coordinates are carried as an (8, 128) register
    (t_abs += s), so boundary/validity masks need no per-row scalar reads.
  * Per-row scalars (shift code s and read base, packed as s*8+base) come
    from one SMEM block; the only per-row scalar work is building one
    (8, 1) vector from 8 SMEM reads.
  * Scores use the 2-valued (match/mismatch) matrix fast path; callers
    with a general 5x5 --scoreMatrix fall back to the XLA kernel.
  * Final (score, state) are captured in a score*4+state combo vector and
    min-reduced on the host side; traceback bits accumulate in an int32
    scratch tile, flushed once per row block (int32 cell words
    carrying traceback bits + M-run counters, kernels/banded.py layout).

Costs are integer-valued f32 (exact < 2^24), so every compare used for
traceback bits is bit-stable, matching kernels/banded.py exactly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blasr_tpu.kernels.banded import ST_D, ST_I, ST_M, BandedResult

INF = 1e30  # python float: jnp scalars would be captured consts in pallas
ROWS_PER_STEP = 64
# Items advanced together per grid program.  >8 interleaves several
# independent in-row prefix-min chains (the kernel's latency bottleneck);
# 32 measured ~3x faster than 8 on v5e.  Env override for experiments.
ITEMS = int(os.environ.get("BLASR_PALLAS_ITEMS", "32"))
INTERPRET = False  # set True to run on CPU for testing


def _vec8(vals):
    """Build an (8, 1) int32 vector from 8 scalars."""
    return jnp.concatenate(
        [jnp.full((1, 1), v, jnp.int32) for v in vals], axis=0)


def _sr1(x, fill):
    """out[w] = x[w-1], INF/fill at w == 0."""
    return jnp.concatenate(
        [jnp.full((ITEMS, 1), fill, x.dtype), x[:, :-1]], axis=1)


def _sl(x, n, fill):
    """out[w] = x[w+n], fill at the right edge."""
    return jnp.concatenate(
        [x[:, n:], jnp.full((ITEMS, n), fill, x.dtype)], axis=1)


def _kernel(srb_ref, off_ref, qa_ref, qb_ref, ta_ref, tb_ref, gaps_ref,
            window_ref, *rest,
            R: int, w_b: int, tgtw: int, use_qv: bool = False):
    if use_qv:
        (qv1_ref, qv2_ref, combo_ref, bits_ref,
         mM_s, mI_s, mD_s, combo_s, mcnt_s, bits_buf) = rest
    else:
        qv1_ref = qv2_ref = None
        (combo_ref, bits_ref,
         mM_s, mI_s, mD_s, combo_s, mcnt_s, bits_buf) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        mM_s[...] = jnp.full((ITEMS, w_b), INF)
        mI_s[...] = jnp.full((ITEMS, w_b), INF)
        mD_s[...] = jnp.full((ITEMS, w_b), INF)
        combo_s[...] = jnp.full((ITEMS, w_b), INF)
        mcnt_s[...] = jnp.zeros((ITEMS, w_b), jnp.int32)

    # per-block constants
    qa_v = _vec8([qa_ref[0, 0, it] for it in range(ITEMS)])
    qb_v = _vec8([qb_ref[0, 0, it] for it in range(ITEMS)])
    ta_v = _vec8([ta_ref[0, 0, it] for it in range(ITEMS)])
    tb_v = _vec8([tb_ref[0, 0, it] for it in range(ITEMS)])

    # early exit: once every item's query range is exhausted, later row
    # blocks have nothing to compute (callers group similar spans into a
    # block); j == 0 always runs so outputs are initialized
    qb_max = qb_ref[0, 0, 0]
    for it in range(1, ITEMS):
        qb_max = jnp.maximum(qb_max, qb_ref[0, 0, it])

    run = (j == 0) | (j * R < qb_max)

    @pl.when(run)
    def _run():
        _block_body(j, qa_v, qb_v, ta_v, tb_v, srb_ref, off_ref, gaps_ref,
                    window_ref, combo_ref, bits_ref,
                    mM_s, mI_s, mD_s, combo_s, mcnt_s, bits_buf,
                    R=R, w_b=w_b, tgtw=tgtw,
                    qv1_ref=qv1_ref, qv2_ref=qv2_ref, use_qv=use_qv)

    # Skipped blocks must still define their bits output (rows >= every
    # item's qb are inactive => all-zero), so results are bit-identical
    # at any ITEMS grouping.
    @pl.when(jnp.logical_not(run))
    def _skip():
        bits_ref[0, 0] = jnp.zeros((ITEMS, R, w_b), jnp.int32)


def _cumsum_lanes(x):
    """Inclusive prefix sum over the 128-lane axis (log-depth)."""
    w_b = x.shape[1]
    d = 1
    while d < w_b:
        x = x + jnp.concatenate(
            [jnp.zeros((ITEMS, d), x.dtype), x[:, : w_b - d]], axis=1)
        d *= 2
    return x


def _block_body(j, qa_v, qb_v, ta_v, tb_v, srb_ref, off_ref, gaps_ref,
                window_ref, combo_ref, bits_ref,
                mM_s, mI_s, mD_s, combo_s, mcnt_s, bits_buf,
                *, R: int, w_b: int, tgtw: int,
                qv1_ref=None, qv2_ref=None, use_qv: bool = False):
    wlen = window_ref.shape[2]
    ins_open = gaps_ref[0, 0]
    ins_ext = gaps_ref[0, 1]
    del_open = gaps_ref[0, 2]
    del_ext = gaps_ref[0, 3]
    match = gaps_ref[0, 4]
    mismatch = gaps_ref[0, 5]

    # refill the target register window, aligned at o_prev = o[0] - s[0]
    # (each row, including the first, then shifts by its own s)
    rows = []
    o_prev = []
    for it in range(ITEMS):
        o0 = off_ref[0, 0, it, 0]
        s0 = (srb_ref[0, 0, it, 0] & 0xFF) >> 3
        op = o0 - s0
        o_prev.append(op)
        rows.append(pltpu.roll(window_ref[0, it:it + 1, :], wlen - op,
                               axis=1)[:, 0:tgtw])
    tgt2 = jnp.concatenate(rows, axis=0)                      # (8, tgtw)
    t_abs = _vec8(o_prev) + jax.lax.broadcasted_iota(
        jnp.int32, (ITEMS, w_b), 1)

    w_iota_f = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (ITEMS, w_b), 1), (ITEMS, w_b)
    ).astype(jnp.float32)

    def row(r2, carry, srb, qvw=None, qv2h=None):
        # srb: (ITEMS, 1) packed s*8+rb for this row; qvw/qv2h: (ITEMS, 1)
        # packed per-row QV costs (QV-steered mode; layout kernels/banded.py)
        mM, mI, mD, mcnt, tgt2, t_abs, combo = carry
        r = j * R + r2
        s_v = srb >> 3
        rb = srb & 7
        m0 = s_v == 0
        m1 = s_v == 1
        if use_qv:
            insq = (qvw & 255).astype(jnp.float32)
            delq = ((qvw >> 8) & 255).astype(jnp.float32)
            subq = ((qvw >> 16) & 255).astype(jnp.float32)
            dtag = (qvw >> 24) & 7
            stag = (qvw >> 27) & 7
            dpri = (qv2h & 255).astype(jnp.float32)
            spri = ((qv2h >> 8) & 255).astype(jnp.float32)

        t_abs = t_abs + s_v
        tgt2 = jnp.where(m0, tgt2,
                         jnp.where(m1, pltpu.roll(tgt2, tgtw - 1, axis=1),
                                   pltpu.roll(tgt2, tgtw - 2, axis=1)))
        tgt = tgt2[:, 0:w_b]

        def sel_d(x):
            # diagonal predecessor: carry[w + s - 1]
            return jnp.where(m0, _sr1(x, INF),
                             jnp.where(m1, x, _sl(x, 1, INF)))

        def sel_v(x):
            # vertical predecessor: carry[w + s]
            return jnp.where(m0, x,
                             jnp.where(m1, _sl(x, 1, INF), _sl(x, 2, INF)))

        dM, dI, dD = sel_d(mM), sel_d(mI), sel_d(mD)
        vM, vI = sel_v(mM), sel_v(mI)

        active = (r >= qa_v) & (r < qb_v)
        first = r == qa_v

        if use_qv:
            # per-cell deletion cost (IDS Deletion): deletionQV where the
            # deleted target base matches the DeletionTag, else the prior
            cd = jnp.where(tgt == dtag, delq, dpri)

        # boundary profiles for the virtual row qa-1
        if use_qv:
            # leading-deletion profile = running sum of row qa's per-cell
            # deletion costs from ta (the XLA kernel's cumz prefix sums,
            # in-band: the first active row's band always covers ta)
            bD = _cumsum_lanes(jnp.where(t_abs >= ta_v, cd, 0.0))
            bD = jnp.where(t_abs >= ta_v, bD, INF)
        else:
            dta = (t_abs - ta_v).astype(jnp.float32)
            bD = jnp.where(t_abs >= ta_v, del_open + del_ext * dta, INF)
        bM = jnp.where(t_abs == ta_v - 1, 0.0, INF)
        bM_diag = jnp.where(t_abs == ta_v, 0.0, INF)
        bDp = _sr1(bD, INF)
        dM = jnp.where(first, bM_diag, dM)
        dI = jnp.where(first, INF, dI)
        dD = jnp.where(first, bDp, dD)
        vM = jnp.where(first, bM, vM)
        vI = jnp.where(first, INF, vI)

        in_t = (t_abs >= ta_v) & (t_abs < tb_v)
        in_t_i = (t_abs >= ta_v - 1) & (t_abs < tb_v)

        eq = (tgt == rb) & (rb < 4)
        if use_qv:
            # mismatch: substitutionQV where the target base matches the
            # SubstitutionTag, else the per-row prior (IDS Match)
            sub = jnp.where(eq, match,
                            jnp.where(tgt == stag, subq, spri))
        else:
            sub = jnp.where(eq, match, mismatch)

        diag_best = jnp.minimum(dM, jnp.minimum(dI, dD))
        m_src = jnp.where(dM <= diag_best, ST_M,
                          jnp.where(dI <= diag_best, ST_I, ST_D))
        M = jnp.where(in_t, sub + diag_best, INF)

        if use_qv:
            # insertionQV prices this inserted query base (linear gap)
            i_from_m = vM + insq
            i_from_i = vI + insq
        else:
            i_from_m = vM + ins_open
            i_from_i = vI + ins_ext
        I = jnp.where(in_t_i, jnp.minimum(i_from_m, i_from_i), INF)
        i_open = i_from_m <= i_from_i

        base = jnp.minimum(M, I)
        if use_qv:
            # linear per-cell deletion costs: the prefix-cummin closed
            # form runs on the cost cumsum instead of ext*w
            S = _cumsum_lanes(cd)
            g = jnp.where(base < INF * 0.5, base - S, INF)
        else:
            g = jnp.where(base < INF * 0.5, base - del_ext * w_iota_f, INF)
        # exclusive prefix min over lanes (log-depth)
        x = _sr1(g, INF)
        d = 1
        while d < w_b:
            x = jnp.minimum(x, jnp.concatenate(
                [jnp.full((ITEMS, d), INF), x[:, : w_b - d]], axis=1))
            d *= 2
        if use_qv:
            D = jnp.where(in_t, S + x, INF)
        else:
            D = jnp.where(in_t,
                          del_ext * w_iota_f + x + (del_open - del_ext),
                          INF)
        D = jnp.minimum(D, INF)
        base_prev = _sr1(base, INF)
        d_open = D >= base_prev + (cd if use_qv else del_open)
        d_from_m = _sr1(M, INF) <= _sr1(I, INF)

        # M-run counters (cell-word layout: kernels/banded.py): packed in
        # mcnt as rexit | mrun<<2 | meq<<8 | ssum<<14; diagonal
        # predecessor via the same 3-way shift select as the score rows
        def sel_d0(x):
            return jnp.where(m0, _sr1(x, 0),
                             jnp.where(m1, x, _sl(x, 1, 0)))

        d_cnt = sel_d0(mcnt)
        dX = d_cnt & 3
        dR = (d_cnt >> 2) & 63
        dE = (d_cnt >> 8) & 63
        dS = (d_cnt >> 14) & 127
        from_m = m_src == ST_M
        fresh = (~from_m) | first | (dR >= 63)
        eq_i = eq.astype(jnp.int32)
        mrun = jnp.where(fresh, 1, dR + 1)
        meq = jnp.where(fresh, 0, dE) + eq_i
        rexit = jnp.where(fresh, jnp.where(from_m, ST_M, m_src), dX)
        # the XLA kernel stores s = 0 at the first active row (its carry
        # shift is forced to 0 there); mirror for bit-identical cells.
        # slope is {0,1,2} by kernel contract, so the XLA kernel's jump
        # saturation (min 127) can never fire — kept for bit parity.
        # NOTE: broadcast to full lane width BEFORE the shift/OR below —
        # Mosaic mis-lowers an (ITEMS, 1) operand shifted then ORed into
        # an (ITEMS, w_b) vector (observed on v5e: the field reads 0)
        s_store = jnp.broadcast_to(jnp.where(first, 0, s_v),
                                   (ITEMS, w_b)).astype(jnp.int32)
        ssum = jnp.minimum(jnp.where(fresh, s_store, dS + s_store), 127)
        mcnt = jnp.where(active,
                         rexit | (mrun << 2) | (meq << 8) | (ssum << 14),
                         mcnt)

        bits = (m_src
                | (i_open.astype(jnp.int32) << 2)
                | (d_open.astype(jnp.int32) << 3)
                | (d_from_m.astype(jnp.int32) << 4)
                | (eq_i << 5)
                | (rexit << 7)
                | (mrun << 9)
                | (meq << 15)
                | (s_store << 21)
                | (ssum << 23))
        bits = jnp.where(active, bits, 0)
        bits_buf[:, pl.ds(r2, 1), :] = bits[:, None, :]

        # capture score*4+state at (row qb-1, column tb-1)
        hit = (r == qb_v - 1) & (t_abs == tb_v - 1)
        cbest = jnp.minimum(M, jnp.minimum(I, D))
        cstate = jnp.where(M <= cbest, ST_M,
                           jnp.where(I <= cbest, ST_I, ST_D))
        take = hit & (cbest < INF * 0.5)
        combo = jnp.where(take, cbest * 4.0 + cstate.astype(jnp.float32),
                          combo)

        mM = jnp.where(active, M, mM)
        mI = jnp.where(active, I, mI)
        mD = jnp.where(active, D, mD)
        return mM, mI, mD, mcnt, tgt2, t_abs, combo

    def row4(r4, carry):
        # one (8,1) construct serves four rows: srb words pack 4 bytes
        srb_w = _vec8([srb_ref[0, 0, it, r4] for it in range(ITEMS)])
        if use_qv:
            qv2_w = [
                _vec8([qv2_ref[0, 0, it, 2 * r4 + h] for it in range(ITEMS)])
                for h in range(2)]  # two rows per word
        for k in range(4):
            if use_qv:
                qvw = _vec8([qv1_ref[0, 0, it, r4 * 4 + k]
                             for it in range(ITEMS)])
                qv2h = (qv2_w[k // 2] >> (16 * (k % 2))) & 0xFFFF
                carry = row(r4 * 4 + k, carry, (srb_w >> (8 * k)) & 0xFF,
                            qvw, qv2h)
            else:
                carry = row(r4 * 4 + k, carry, (srb_w >> (8 * k)) & 0xFF)
        return carry

    carry0 = (mM_s[...], mI_s[...], mD_s[...], mcnt_s[...], tgt2, t_abs,
              combo_s[...])
    mM, mI, mD, mcnt, _, _, combo = jax.lax.fori_loop(
        0, R // 4, row4, carry0)
    mM_s[...] = mM
    mI_s[...] = mI
    mD_s[...] = mD
    mcnt_s[...] = mcnt
    combo_s[...] = combo
    combo_ref[0] = combo
    bits_ref[0, 0] = bits_buf[...]


def slope_limit_offsets(offs: jnp.ndarray, w_b: int) -> jnp.ndarray:
    """Clamp a monotone band-offset path to per-row slope in {0, 1, 2}
    (the v2 kernel's contract).  offs: int32 [..., L]."""
    ax = offs.ndim - 1
    r = jnp.arange(offs.shape[ax], dtype=jnp.int32)
    offs = jax.lax.cummax(offs, axis=ax)
    return 2 * r + jax.lax.cummin(offs - 2 * r, axis=ax)


@functools.partial(jax.jit, static_argnames=("w_b",))
def pallas_banded_align(
    reads, windows, offsets, qa, qb, ta, tb, submat,
    ins_open, ins_ext, del_open, del_ext, *, w_b: int = 128,
    qv1=None, qv2=None,
) -> BandedResult:
    """Same contract as kernels.banded.banded_align (forward pass), with two
    extra requirements: ``offsets`` must advance by 0..2 per row, and
    ``submat`` must be two-valued (match on ACGT diagonal, one mismatch
    value elsewhere).  Callers check the matrix and fall back to the XLA
    kernel otherwise.

    qv1/qv2 (int32 [N, L] packed per-row QV cost tracks, layout
    kernels/banded.py::_align_one) switch on the QV-steered mode: the
    reference's KBandAlign with an IDS score function
    (iblasr/BlasrAlignImpl.hpp:1276-1298), linear gaps, per-cell deletion
    costs via an in-row cost cumsum."""
    use_qv = qv1 is not None
    N, L = reads.shape
    W = windows.shape[1]
    R = ROWS_PER_STEP
    assert L % R == 0, (L, R)
    assert w_b == 128, w_b
    J = L // R
    tgtw = 2 * R + w_b + 128  # register target window (shift headroom)

    n_pad = (-N) % ITEMS
    if n_pad:
        def padn(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)], axis=0)
        reads, windows, offsets = padn(reads, 4), padn(windows, 4), padn(offsets)
        qa, qb, ta, tb = padn(qa), padn(qb), padn(ta), padn(tb)
        if use_qv:
            qv1, qv2 = padn(qv1), padn(qv2)
        N += n_pad
    N8 = N // ITEMS

    match = submat[0]
    mismatch = submat[1]
    gaps = jnp.stack([
        jnp.asarray(ins_open, jnp.float32), jnp.asarray(ins_ext, jnp.float32),
        jnp.asarray(del_open, jnp.float32), jnp.asarray(del_ext, jnp.float32),
        match.astype(jnp.float32), mismatch.astype(jnp.float32),
        jnp.float32(0), jnp.float32(0),
    ]).reshape(1, 8)

    offsets = offsets.astype(jnp.int32)
    s = jnp.diff(offsets, axis=1, prepend=offsets[:, :1])
    srb = (s << 3) | reads.astype(jnp.int32)
    # pack 4 rows' codes per int32 (values < 32 fit a byte), then
    # [N, L/4] -> [N8, J, 8, R/4]
    srb4 = srb.reshape(N, L // 4, 4)
    srb = (srb4[:, :, 0] | (srb4[:, :, 1] << 8) | (srb4[:, :, 2] << 16)
           | (srb4[:, :, 3] << 24))
    srb = srb.reshape(N8, ITEMS, J, R // 4).transpose(0, 2, 1, 3)
    off_t = offsets.reshape(N8, ITEMS, J, R).transpose(0, 2, 1, 3)
    if use_qv:
        qv1_t = qv1.astype(jnp.int32).reshape(
            N8, ITEMS, J, R).transpose(0, 2, 1, 3)
        q2 = qv2.astype(jnp.int32) & 0xFFFF
        qv2_t = (q2[:, 0::2] | (q2[:, 1::2] << 16)).reshape(
            N8, ITEMS, J, R // 2).transpose(0, 2, 1, 3)
    wpad = jnp.concatenate(
        [windows.astype(jnp.int32),
         jnp.full((N, tgtw), 4, dtype=jnp.int32)], axis=1)
    Wp = W + tgtw

    kernel = functools.partial(_kernel, R=R, w_b=w_b, tgtw=tgtw,
                               use_qv=use_qv)
    qv_specs = [
        pl.BlockSpec((1, 1, ITEMS, R), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.SMEM),       # qv1 (packed costs)
        pl.BlockSpec((1, 1, ITEMS, R // 2), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.SMEM),       # qv2 (2 rows / word)
    ] if use_qv else []
    grid_spec = pl.GridSpec(
        grid=(N8, J),
        scratch_shapes=[
            pltpu.VMEM((ITEMS, w_b), jnp.float32),
            pltpu.VMEM((ITEMS, w_b), jnp.float32),
            pltpu.VMEM((ITEMS, w_b), jnp.float32),
            pltpu.VMEM((ITEMS, w_b), jnp.float32),
            pltpu.VMEM((ITEMS, w_b), jnp.int32),
            pltpu.VMEM((ITEMS, R, w_b), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 1, ITEMS, R // 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),   # srb (4 rows / word)
            pl.BlockSpec((1, 1, ITEMS, R), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),   # offsets
            pl.BlockSpec((1, 1, ITEMS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # qa
            pl.BlockSpec((1, 1, ITEMS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # qb
            pl.BlockSpec((1, 1, ITEMS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # ta
            pl.BlockSpec((1, 1, ITEMS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # tb
            pl.BlockSpec((1, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),   # gaps + match/mismatch
            pl.BlockSpec((1, ITEMS, Wp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # window (int32)
        ] + qv_specs,
        out_specs=[
            pl.BlockSpec((1, ITEMS, w_b), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # combo
            pl.BlockSpec((1, 1, ITEMS, R, w_b), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # bits
        ],
    )
    combo, bits = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N8, ITEMS, w_b), jnp.float32),
            jax.ShapeDtypeStruct((N8, J, ITEMS, R, w_b), jnp.int32),
        ],
    )(srb, off_t,
      qa.reshape(N8, 1, ITEMS), qb.reshape(N8, 1, ITEMS),
      ta.reshape(N8, 1, ITEMS), tb.reshape(N8, 1, ITEMS),
      gaps, wpad.reshape(N8, ITEMS, Wp),
      *((qv1_t, qv2_t) if use_qv else ()))

    combo = combo.reshape(N, w_b).min(axis=1)
    ok = combo < INF * 0.5
    score = jnp.floor(jnp.where(ok, combo, 0.0) / 4.0)
    state = (jnp.where(ok, combo, 0.0) - score * 4.0).astype(jnp.int32)
    bits = bits.transpose(0, 2, 1, 3, 4).reshape(N, L, w_b)
    N0 = N - n_pad
    return BandedResult(
        score=jnp.where(ok, score, INF)[:N0],
        tbbits=bits[:N0],
        final_state=state[:N0],
        valid=ok[:N0],
    )
