"""BWT/FM-index tests (reference --bwt path + sa2bwt/bwt2sa tools,
Blasr.cpp:1073-1080, extrautils/SuffixArrayToBWT.cpp, BwtToSuffixArray.cpp)."""

import numpy as np

from blasr_tpu.index.bwt import FMIndex, build_bwt, invert_bwt
from blasr_tpu.index.genome import build_genome_index, concat_contigs
from blasr_tpu.io.fasta import FastaRecord, write_fasta
from blasr_tpu.sim import random_genome


def test_fm_backward_search_matches_naive():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, 800).astype(np.uint8)
    fm = FMIndex.from_text(codes)
    for _ in range(25):
        p = int(rng.integers(0, 780))
        k = int(rng.integers(4, 14))
        pat = codes[p:p + k]
        lo, hi = fm.backward_search(pat)
        naive = [i for i in range(len(codes) - k + 1)
                 if np.array_equal(codes[i:i + k], pat)]
        assert hi - lo == len(naive)
        assert sorted(fm.locate(r) for r in range(lo, hi)) == naive


def test_fm_batch_search():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, 600).astype(np.uint8)
    fm = FMIndex.from_text(codes)
    k = 10
    starts = rng.integers(0, len(codes) - k, 32)
    pats = np.stack([codes[s:s + k] for s in starts])
    lo, hi = fm.backward_search_batch(pats)
    for n, s in enumerate(starts):
        l2, h2 = fm.backward_search(pats[n])
        assert (lo[n], hi[n]) == (l2, h2)
        assert hi[n] > lo[n]  # the planted occurrence exists


def test_bwt_roundtrip_multicontig():
    contigs = random_genome(5000, seed=7, n_contigs=3)
    genome, seqdb = concat_contigs(contigs)
    bwt, counts = build_bwt(genome.astype(np.uint8))
    rec = invert_bwt(bwt, counts)
    np.testing.assert_array_equal(rec, genome.astype(np.uint8))


def test_sa2bwt_bwt2sa_cli_npz(tmp_path):
    from blasr_tpu.cli import bwt2sa, sa2bwt, sawriter
    contigs = random_genome(3000, seed=9, n_contigs=2)
    fa = tmp_path / "g.fa"
    write_fasta(fa, contigs)
    assert sawriter.run([str(tmp_path / "g.sa"), str(fa),
                         "--fullSuffixArray"]) == 0
    assert sa2bwt.run([str(fa), str(tmp_path / "g.sa.npz"),
                       str(tmp_path / "g.bwt.npz")]) == 0
    assert bwt2sa.run([str(tmp_path / "g.bwt.npz"),
                       str(tmp_path / "g2.sa")]) == 0
    from blasr_tpu.index.genome import GenomeIndex
    a = GenomeIndex.load(str(tmp_path / "g.sa.npz"))
    b = GenomeIndex.load(str(tmp_path / "g2.sa.npz"))
    np.testing.assert_array_equal(a.genome, b.genome)
    np.testing.assert_array_equal(a.keys_sorted, b.keys_sorted)
    np.testing.assert_array_equal(a.pos_sorted, b.pos_sorted)
    assert a.seqdb.names == b.seqdb.names


def test_sa2bwt_bwt2sa_cli_reference_binary(tmp_path):
    """Plain .bwt/.sa names take the reference binary layouts end to end
    (SuffixArrayToBWT.cpp:43-44 write, BwtToSuffixArray.cpp:25-31 invert)."""
    from blasr_tpu.cli import bwt2sa, sa2bwt, sawriter
    from blasr_tpu.index.genome import GenomeIndex, concat_contigs
    from blasr_tpu.io.refbin import is_ref_bwt, read_ref_bwt
    from blasr_tpu.io.refsa import is_ref_sa, read_ref_sa
    contigs = random_genome(3000, seed=11, n_contigs=2)
    genome, _ = concat_contigs(contigs)
    fa = tmp_path / "g.fa"
    write_fasta(fa, contigs)
    assert sawriter.run([str(tmp_path / "g.sa"), str(fa),
                         "--fullSuffixArray"]) == 0
    assert sa2bwt.run([str(fa), str(tmp_path / "g.sa.npz"),
                       str(tmp_path / "g.bwt")]) == 0
    assert is_ref_bwt(str(tmp_path / "g.bwt"))
    bwt, counts, rate, samples = read_ref_bwt(str(tmp_path / "g.bwt"))
    assert len(bwt) == len(genome) + 1 and rate and samples is not None
    rec = invert_bwt(bwt, counts)
    np.testing.assert_array_equal(rec, genome.astype(np.uint8))
    assert bwt2sa.run([str(tmp_path / "g.bwt"),
                       str(tmp_path / "g2.sa")]) == 0
    assert is_ref_sa(str(tmp_path / "g2.sa"))
    sa, p, table = read_ref_sa(str(tmp_path / "g2.sa"))
    gi = GenomeIndex.load(str(tmp_path / "g.sa.npz"))
    np.testing.assert_array_equal(sa, np.asarray(gi.suffix_array))
    assert table is not None and p == 8


def test_blasr_cli_bwt_input(tmp_path, capsys):
    from blasr_tpu.cli import blasr, sa2bwt, sawriter
    from blasr_tpu.sim import simulate_reads
    contigs = random_genome(30_000, seed=31)
    sims = simulate_reads(contigs, 4, read_len=(200, 400), accuracy=0.9,
                          seed=32)
    fa = tmp_path / "g.fa"
    rd = tmp_path / "r.fa"
    write_fasta(fa, contigs)
    write_fasta(rd, [s.rec for s in sims])
    assert sawriter.run([str(tmp_path / "g.sa"), str(fa),
                         "--fullSuffixArray"]) == 0
    assert sa2bwt.run([str(fa), str(tmp_path / "g.sa.npz"),
                       str(tmp_path / "g.bwt.npz")]) == 0
    assert blasr.run([str(rd), str(fa), "-m", "4",
                      "--bwt", str(tmp_path / "g.bwt.npz"),
                      "--out", str(tmp_path / "out.m4")]) == 0
    lines = open(tmp_path / "out.m4").read().strip().splitlines()
    assert len(lines) >= 3
    assert all(len(l.split()) == 13 for l in lines)
    # reference binary .bwt input: same alignments (index rebuilt from
    # the genome argument, mirroring the reference-format .sa path)
    assert sa2bwt.run([str(fa), str(tmp_path / "g.sa.npz"),
                       str(tmp_path / "g.bwt")]) == 0
    assert blasr.run([str(rd), str(fa), "-m", "4",
                      "--bwt", str(tmp_path / "g.bwt"),
                      "--out", str(tmp_path / "out2.m4")]) == 0
    assert open(tmp_path / "out2.m4").read() == \
        open(tmp_path / "out.m4").read()
