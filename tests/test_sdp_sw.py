"""SDP kernel and full-SW kernel tests (reference SDPAlign / SWAlign,
iblasr/BlasrAlignImpl.hpp:902-990, utils/SDPMatcher.cpp, extrautils/SWMatcher.cpp)."""

import jax.numpy as jnp
import numpy as np

from blasr_tpu.io.fasta import FastaRecord, encode
from blasr_tpu.kernels.sdp import sdp_align
from blasr_tpu.kernels.sw import sw_align


def mutate(rng, seq, sub=0.05, ins=0.03, dele=0.03):
    out = []
    for b in seq:
        u = rng.random()
        if u < dele:
            continue
        if u < dele + ins:
            out.append(rng.integers(0, 4))
        if rng.random() < sub:
            out.append((b + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(b)
    return np.asarray(out, dtype=np.int8)


def test_sdp_recovers_planted_span():
    rng = np.random.default_rng(5)
    N, Lq, Lt = 8, 256, 512
    qarr = np.full((N, Lq), 4, np.int8)
    tarr = np.full((N, Lt), 4, np.int8)
    qlen = np.zeros(N, np.int32)
    tlen = np.zeros(N, np.int32)
    t_at = np.zeros(N, np.int32)
    for n in range(N):
        target = rng.integers(0, 4, Lt - 1).astype(np.int8)
        pos = int(rng.integers(0, Lt - 1 - 220))
        q = mutate(rng, target[pos:pos + 200])[:Lq]
        qarr[n, : len(q)] = q
        tarr[n, 1:Lt] = target
        qlen[n] = len(q)
        tlen[n] = Lt
        t_at[n] = pos + 1
    res = sdp_align(jnp.asarray(qarr), jnp.asarray(qlen),
                    jnp.asarray(tarr), jnp.asarray(tlen), k=11)
    ok = np.asarray(res.valid)
    assert ok.all()
    ts = np.asarray(res.t_start)
    # global mode anchors the query span; start should be near the plant
    assert np.all(np.abs(ts - t_at) < 40), (ts, t_at)
    assert np.all(np.asarray(res.score) > 50)


def test_sdp_local_vs_global_spans():
    rng = np.random.default_rng(9)
    Lq, Lt = 128, 384
    target = rng.integers(0, 4, Lt - 1).astype(np.int8)
    q = np.concatenate([rng.integers(0, 4, 30).astype(np.int8),
                        target[100:180],
                        rng.integers(0, 4, 18).astype(np.int8)])
    qarr = jnp.asarray(np.pad(q, (0, Lq - len(q)),
                              constant_values=4).reshape(1, Lq))
    tarr = np.full((1, Lt), 4, np.int8)
    tarr[0, 1:Lt] = target
    args = (qarr, jnp.asarray([len(q)], jnp.int32),
            jnp.asarray(tarr), jnp.asarray([Lt], jnp.int32))
    loc = sdp_align(*args, k=11, global_align=False)
    glob = sdp_align(*args, k=11, global_align=True)
    assert int(glob.q_start[0]) == 0 and int(glob.q_end[0]) == len(q)
    # local mode confines the span to the planted block
    assert int(loc.q_start[0]) >= 25 and int(loc.q_end[0]) <= 30 + 80 + 5


def np_nw(q, t, match, mismatch, ins, dele):
    """Plain O(nm) global DP oracle (distance minimization)."""
    n, m = len(q), len(t)
    H = np.zeros((n + 1, m + 1))
    H[0, :] = dele * np.arange(m + 1)
    H[:, 0] = ins * np.arange(n + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if (q[i - 1] == t[j - 1] and q[i - 1] < 4) else mismatch
            H[i, j] = min(H[i - 1, j - 1] + s, H[i - 1, j] + ins,
                          H[i, j - 1] + dele)
    return H[n, m]


def test_sw_global_matches_oracle():
    rng = np.random.default_rng(13)
    for _ in range(5):
        q = rng.integers(0, 4, 40).astype(np.int8)
        t = mutate(rng, q, 0.1, 0.05, 0.05)
        aln = sw_align(q, t, align_type="global")
        oracle = np_nw(q, t, -5, 6, 4, 5)
        assert aln.score == oracle, (aln.score, oracle)
        # CIGAR consumes exactly the sequences
        qc = sum(n for op, n in aln.cigar if op in "MI")
        tc = sum(n for op, n in aln.cigar if op in "MD")
        assert qc == len(q) and tc == len(t)


def test_sw_local_finds_planted_block():
    rng = np.random.default_rng(17)
    t = rng.integers(0, 4, 300).astype(np.int8)
    q = np.concatenate([rng.integers(0, 4, 20).astype(np.int8),
                        t[100:160], rng.integers(0, 4, 20).astype(np.int8)])
    aln = sw_align(q, t, align_type="local")
    assert aln.score <= -5 * 50
    # the planted block must be contained in the local hit (chance matches
    # in the random flanks may extend it under SMRT scoring)
    assert aln.t_start <= 106 and aln.t_end >= 154
    assert aln.q_start <= 26 and aln.q_end >= 74


def test_sw_queryfit_consumes_whole_query():
    rng = np.random.default_rng(19)
    t = rng.integers(0, 4, 200).astype(np.int8)
    q = t[60:120].copy()
    aln = sw_align(q, t, align_type="queryfit")
    assert aln.q_start == 0 and aln.q_end == len(q)
    assert aln.t_start == 60 and aln.t_end == 120
    assert aln.score == -5 * 60


def test_tools_cli(tmp_path, capsys):
    from blasr_tpu.cli import sdp_matcher, sw_matcher
    from blasr_tpu.io.fasta import write_fasta
    rng = np.random.default_rng(23)
    t = rng.integers(0, 4, 400).astype(np.int8)
    q = mutate(rng, t[50:350])
    write_fasta(tmp_path / "q.fa", [FastaRecord("q0", q)])
    write_fasta(tmp_path / "t.fa", [FastaRecord("t0", t)])
    assert sdp_matcher.run([str(tmp_path / "q.fa"), str(tmp_path / "t.fa"),
                            "11", "-printSimilarity"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("qid,tid,qstart")
    fields = out[1].split(",")
    assert fields[0] == "q0" and fields[1] == "t0"
    assert int(fields[8]) < -500  # strong negative score

    assert sw_matcher.run([str(tmp_path / "q.fa"), str(tmp_path / "t.fa"),
                           "-local"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "qlen tlen score"
    assert int(out[1].split()[2]) < -500
