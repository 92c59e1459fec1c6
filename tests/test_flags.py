"""Previously-dead flags now either change behavior or are rejected loudly.

Covers: --pvaltype 0/1/2 distinct weightors, --fastMaxInterval /
--advanceHalf lookback-limited chaining, --aggressiveIntervalCut,
--advanceExactMatches, --minExpand, --useSensitiveSearch, and
--nowarp / --globalChainType 1 support.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from blasr_tpu.index import build_genome_index
from blasr_tpu.io.fasta import FastaRecord
from blasr_tpu.kernels.anchor import Anchors, find_anchors
from blasr_tpu.kernels.chain import chain_anchors
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.sim import random_genome


def mk_anchors(qtl, A=32):
    """Build a 1-read Anchors set from (q, t, l[, nlogp]) tuples (t-sorted)."""
    qtl = sorted(qtl, key=lambda x: x[1])
    q = np.full((1, A), 0, np.int32)
    t = np.full((1, A), 0x3FFFFFFF, np.int32)
    ln = np.zeros((1, A), np.int32)
    v = np.zeros((1, A), bool)
    p = np.zeros((1, A), np.float32)
    for i, item in enumerate(qtl):
        q[0, i], t[0, i], ln[0, i] = item[:3]
        p[0, i] = item[3] if len(item) > 3 else float(item[2])
        v[0, i] = True
    return Anchors(q=jnp.asarray(q), t=jnp.asarray(t), l=jnp.asarray(ln),
                   valid=jnp.asarray(v),
                   n_total=jnp.asarray([len(qtl)], jnp.int32),
                   nlogp=jnp.asarray(p))


def test_pvaltype_weightors_distinct():
    """pvaltype 0 (occurrence-weighted), 1 (anchor bases) and 2 (raw log-P
    sum) rank two competing chains differently (BlasrHeaders.h:54-57)."""
    # chain X: one long, high-significance anchor (rare seed)
    # chain Y: many short, low-significance anchors (common seeds), more
    # total bases but heavily overlapping (raw sum >> overlap-scaled sum)
    x = [(100, 10_000, 40, 60.0)]
    y = [(200 + 5 * i, 50_000 + 5 * i, 20, 3.0) for i in range(12)]
    anchors = mk_anchors(x + y)
    rl = jnp.asarray([400], jnp.int32)

    def best_t(ptype):
        c = chain_anchors(anchors, rl, n_cand=2, rank_by_pvalue=True,
                          p_value_type=ptype)
        return int(np.asarray(c.t_start)[0, 0])

    t0, t1, t2 = best_t(0), best_t(1), best_t(2)
    # type 0: X's 60 nats beat Y's overlap-scaled ~3 + 11*3*(5/20) nats
    assert t0 == 10_000
    # type 1: Y's clipped bases (20 + 11*5 = 75) beat X's 40
    assert t1 == 50_000
    # type 2 vs 0: two heavily-overlapping significant anchors — raw sum
    # counts both fully (50 nats), overlap scaling nearly discards the
    # second (25 + 25*2/30 ~ 26.7); a lone 35-nat anchor sits between
    xo = [(100, 10_000, 30, 25.0), (102, 10_002, 30, 25.0)]
    yo = [(300, 50_000, 20, 35.0)]
    a2 = mk_anchors(xo + yo, A=8)
    c0 = chain_anchors(a2, rl, n_cand=1, rank_by_pvalue=True, p_value_type=0)
    c2 = chain_anchors(a2, rl, n_cand=1, rank_by_pvalue=True, p_value_type=2)
    assert int(np.asarray(c0.t_start)[0, 0]) == 50_000  # scaled: 35 > 26.7
    assert int(np.asarray(c2.t_start)[0, 0]) == 10_000  # raw: 50 > 35
    assert t2 == 10_000


def test_fast_max_interval_lookback_less_exhaustive():
    """With > lookback decoy anchors between two true anchors, the
    windowed chain cannot join them; the exhaustive default can."""
    true_chain = [(0, 1000, 20), (500, 1500, 20)]
    # 70 decoys at t between the two true anchors, all at high q (cannot
    # precede the second true anchor in q, but they fill the t-window)
    decoys = [(900, 1100 + i, 12) for i in range(70)]
    anchors = mk_anchors(true_chain + decoys, A=80)
    rl = jnp.asarray([1000], jnp.int32)
    full = chain_anchors(anchors, rl, n_cand=1)
    fast = chain_anchors(anchors, rl, n_cand=1, lookback=64)
    s_full = float(np.asarray(full.score)[0, 0])
    s_fast = float(np.asarray(fast.score)[0, 0])
    assert s_full == 40.0          # both true anchors joined
    assert s_fast < s_full         # window too small to reach back


def test_advance_half_halves_lookback():
    p_half = MappingParams(advance_half=True).make_sane()
    p_fast = MappingParams(fast_max_interval=True).make_sane()
    p_both = MappingParams(advance_half=True,
                           fast_max_interval=True).make_sane()
    gi_dummy = None

    class M(Mapper):
        def __init__(self, params, cfg):
            self.params = params
            self.cfg = cfg

    cfg = ShapeConfig(max_anchors=512)
    assert M(p_fast, cfg)._chain_lookback() == 64
    assert M(p_half, cfg)._chain_lookback() == 256
    assert M(p_both, cfg)._chain_lookback() == 32
    assert M(MappingParams().make_sane(), cfg)._chain_lookback() == 0


@pytest.fixture(scope="module")
def alu_world():
    """Genome with a 1.5 kb unique segment whose first 300 bp (an
    'ALU') also occurs at two distant loci."""
    contigs = random_genome(40_000, seed=21)
    g = contigs[0].seq.copy()
    alu = g[5000:5300].copy()
    g[20000:20300] = alu
    g[30000:30300] = alu
    contigs = [FastaRecord("contig0", g)]
    return contigs, build_genome_index(contigs, k=12)


def test_aggressive_interval_cut_drops_short_hits(alu_world):
    contigs, gi = alu_world
    read = FastaRecord("alu/1/0_1500", gi.genome[5000:6500].copy())
    cfg = ShapeConfig(buckets=(2048,), batch_size=4, occ_per_pos=6)
    plain = Mapper(gi, MappingParams().make_sane(), cfg)
    alns0 = plain.map_reads([read])[0]
    cut = Mapper(gi, MappingParams(aggressive_interval_cut=True).make_sane(),
                 cfg)
    alns1 = cut.map_reads([read])[0]
    # default reports the ALU echoes; aggressive cut drops them
    assert len(alns0) >= 3, [a.tstart for a in alns0]
    assert len(alns1) < len(alns0)
    assert all(abs(a.tstart - 5000) < 50 for a in alns1)


def test_advance_exact_matches_thins_anchors(small_index):
    g = small_index.genome
    read = np.full((1, 512), 4, np.int8)
    read[0, :400] = g[1000:1400]
    rlen = jnp.asarray([400], jnp.int32)
    kw = dict(k=12, occ_per_pos=2, max_anchors=256, anchor_ext=20,
              min_match=12, max_anchors_per_pos=100,
              bucket_starts=None, gwords=None, gnwords=None)
    dense = find_anchors(jnp.asarray(small_index.genome),
                         jnp.asarray(small_index.keys_sorted),
                         jnp.asarray(small_index.pos_sorted),
                         jnp.asarray(read), rlen, **kw)
    thin = find_anchors(jnp.asarray(small_index.genome),
                        jnp.asarray(small_index.keys_sorted),
                        jnp.asarray(small_index.pos_sorted),
                        jnp.asarray(read), rlen, advance_exact=4, **kw)
    n_dense = int(np.asarray(dense.n_total)[0])
    n_thin = int(np.asarray(thin.n_total)[0])
    assert 0 < n_thin < n_dense


def test_min_expand_starts_loose(repeat_genome_world):
    """--minExpand starts the mapping pass at a looser anchoring level:
    with occ_per_pos 1 a 4-copy repeat read reports one placement; with
    minExpand the first pass already sees more copies."""
    gi, seg = repeat_genome_world
    read = FastaRecord("rep/9/0_1300", seg[100:1400].copy())
    params = dict(hit_policy="all", n_best=10)
    cfg = ShapeConfig(buckets=(2048,), batch_size=4, occ_per_pos=1)
    base = Mapper(gi, MappingParams(**params).make_sane(), cfg)
    n_base = len(base.map_reads([read])[0])
    exp = Mapper(gi, MappingParams(min_expand=2, max_expand=2,
                                   **params).make_sane(), cfg)
    n_exp = len(exp.map_reads([read])[0])
    assert n_exp > n_base, (n_exp, n_base)


@pytest.fixture(scope="module")
def repeat_genome_world():
    contigs = random_genome(40_000, seed=31)
    g = contigs[0].seq.copy()
    seg = g[5000:6500].copy()
    for pos in (15000, 25000, 35000):
        g[pos:pos + 1500] = seg
    gi = build_genome_index([FastaRecord("contig0", g)], k=12)
    return gi, seg


def test_sensitive_search_rescues_weak_read(small_index, small_genome):
    """--useSensitiveSearch re-runs weak reads with looser anchoring."""
    g = small_genome[0].seq
    # a read whose seeds are sparse: every 16th base mutated leaves some
    # 12-mers, but occ_per_pos=1 often picks other loci first
    frag = g[3000:4000].copy()
    frag[::16] = (frag[::16] + 1) % 4
    read = FastaRecord("weak/1/0_1000", frag)
    cfg = ShapeConfig(buckets=(1024,), batch_size=4, occ_per_pos=1,
                      max_anchors=64)
    p_off = MappingParams().make_sane()
    p_on = MappingParams(do_sensitive_search=True).make_sane()
    off = Mapper(small_index, p_off, cfg).map_reads([read])[0]
    on = Mapper(small_index, p_on, cfg).map_reads([read])[0]

    def best(alns):
        return min((a.score for a in alns), default=1e9)

    assert best(on) <= best(off)


def test_cli_rejects_unsupported(tmp_path):
    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.fasta import write_fasta
    contigs = random_genome(5000, seed=1)
    write_fasta(str(tmp_path / "g.fa"), contigs)
    write_fasta(str(tmp_path / "r.fa"),
                [FastaRecord("r/1/0_100", contigs[0].seq[:100])])
    args = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4",
            "--out", str(tmp_path / "o.m4")]
    # --nowarp (structural no-op: the chain DP is exhaustive) and
    # --globalChainType 1 (restricted-global-chain transitions) are
    # supported: a clean full-copy read maps identically under both
    assert run(args) == 0
    base = (tmp_path / "o.m4").read_text()
    assert run(args + ["--nowarp"]) == 0
    assert (tmp_path / "o.m4").read_text() == base
    assert run(args + ["--globalChainType", "1"]) == 0
    assert (tmp_path / "o.m4").read_text() == base


def test_cli_filter_aliases_and_score_sign(tmp_path):
    """RegisterFilterOptions aliases (--minAlignLength/--minLength/
    --minPctIdentity/--minAccuracy/--scoreCutoff) parse and act;
    --scoreSign 1 is rejected loudly."""
    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.fasta import write_fasta
    contigs = random_genome(30_000, seed=61)
    read = FastaRecord("al/1/0_400", contigs[0].seq[4000:4400].copy())
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa", [read])
    base = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4"]
    o1 = tmp_path / "a.m4"
    assert run(base + ["--minAlignLength", "100", "--out", str(o1)]) == 0
    assert len(open(o1).read().splitlines()) == 1
    o2 = tmp_path / "b.m4"
    assert run(base + ["--minLength", "500", "--out", str(o2)]) == 0
    assert open(o2).read() == ""          # 400 bp alignment filtered
    o3 = tmp_path / "c.m4"
    assert run(base + ["--minPctIdentity", "99.9", "--minAccuracy", "99.9",
                       "--out", str(o3)]) == 0
    assert len(open(o3).read().splitlines()) == 1  # exact read passes
    o4 = tmp_path / "d.m4"
    assert run(base + ["--scoreCutoff", "-100000", "--out", str(o4)]) == 0
    assert open(o4).read() == ""          # cutoff stricter than any score
    assert run(base + ["--scoreSign", "1", "--out", str(o4)]) == 1


def test_make_sane_reference_interactions(tmp_path, capsys):
    """MakeSane interaction parity (MappingParameters.h:390-689):
    subsample+stride error, concordant+ccs drop, sa+bwt error,
    useQuality+fasta error."""
    import pytest as _pytest
    with _pytest.raises(ValueError):
        MappingParams(subsample=0.5, stride=2).make_sane()
    p = MappingParams(concordant=True, use_ccs=True).make_sane()
    assert not p.concordant
    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.fasta import write_fasta
    contigs = random_genome(5000, seed=3)
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa",
                [FastaRecord("q/1/0_200", contigs[0].seq[:200])])
    base = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4",
            "--out", str(tmp_path / "o.m4")]
    assert run(base + ["--sa", "x.npz", "--bwt", "y.npz"]) == 1
    assert run(base + ["--useQuality"]) == 1   # fasta input
    assert run(base + ["--subsample", "0.5", "--stride", "2"]) == 1


def test_verbose_taps(small_index, small_genome, tmp_path, capsys,
                      monkeypatch):
    """-V 2 dumps read sequences; -V 3 routes the verbose stream to a
    per-process pid.shard.log file (Blasr.cpp:757-764)."""
    import os
    import re

    from blasr_tpu.params import MappingParams, ShapeConfig
    from blasr_tpu.pipeline.map_read import Mapper
    from blasr_tpu.sim import simulate_reads

    recs = [s.rec for s in simulate_reads(small_genome, 3, read_len=(600, 900),
                                          accuracy=0.9, seed=7)]
    cfg = ShapeConfig(buckets=(1024,), batch_size=4, max_anchors=256)

    p2 = MappingParams(verbosity=2).make_sane()
    Mapper(small_index, p2, cfg).map_reads(recs)
    err = capsys.readouterr().err
    assert "interval " in err
    assert re.search(r"^read \S+ \d+\n[ACGTN]+$", err, re.M), \
        "-V 2 must dump read sequences"

    monkeypatch.chdir(tmp_path)
    p3 = MappingParams(verbosity=3).make_sane()
    Mapper(small_index, p3, cfg).map_reads(recs)
    logname = f"{os.getpid()}.0.log"
    assert os.path.exists(logname), "-V 3 must write pid.shard.log"
    text = open(logname).read()
    assert "interval " in text and "read " in text
    assert "interval " not in capsys.readouterr().err
