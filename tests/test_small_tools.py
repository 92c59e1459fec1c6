"""Small companion tools (SURVEY.md §2.7: toAfg, printTupleCountTable,
sals, samodify, evolve, exciseRepeats, simpleShredder, bsdb)."""

import numpy as np
import pytest

from blasr_tpu.cli import small_tools as st
from blasr_tpu.io.fasta import read_fasta, read_fastq, write_fasta
from blasr_tpu.sim import random_genome


@pytest.fixture(scope="module")
def genome_fa(tmp_path_factory):
    d = tmp_path_factory.mktemp("smalltools")
    contigs = random_genome(8000, seed=81, n_contigs=2)
    write_fasta(d / "g.fa", contigs)
    return d, contigs


def test_to_afg(genome_fa, tmp_path):
    d, contigs = genome_fa
    out = tmp_path / "reads.afg"
    assert st.run_to_afg([str(d / "g.fa"), str(out), "-uniformQV", "15"]) == 0
    text = open(out).read()
    assert text.count("{RED") == 2
    assert "iid:1" in text and "eid:" in text and "qlt:" in text


def test_print_tuple_count_table_and_load(genome_fa, tmp_path):
    d, contigs = genome_fa
    # plain .ctab name -> reference binary layout (TupleCountTable::Write,
    # read back through the Blasr.cpp:1136-1147 ct.Read dispatch)
    tab = tmp_path / "g.ctab"
    assert st.run_print_tuple_count_table(
        [str(tab), str(d / "g.fa"), "-wordsize", "6"]) == 0
    from blasr_tpu.io.refbin import is_ref_ctab
    assert is_ref_ctab(str(tab))
    k, counts = st.load_ctab(str(tab))
    assert k == 6 and len(counts) == 4 ** 6
    total = sum(max(len(c.seq) - 5, 0) for c in contigs)
    assert counts.sum() == total
    # .npz name -> our artifact; same counts through the same loader
    assert st.run_print_tuple_count_table(
        [str(tmp_path / "g.ctab.npz"), str(d / "g.fa"),
         "-wordsize", "6"]) == 0
    k2, counts2 = st.load_ctab(str(tmp_path / "g.ctab.npz"))
    assert k2 == 6
    import numpy as np
    np.testing.assert_array_equal(counts, counts2)


def test_ref_ctab_error_paths(tmp_path):
    import numpy as np

    from blasr_tpu.io.refbin import (is_ref_ctab, read_ref_ctab,
                                     write_ref_ctab)
    p = tmp_path / "bad.ctab"
    # inconsistent header: countTableLength != 4^k
    np.asarray([17, 0, 2] + [0] * 17, dtype="<i4").tofile(str(p))
    assert not is_ref_ctab(str(p))
    with pytest.raises(ValueError):
        read_ref_ctab(str(p))
    # truncated counts section
    good = tmp_path / "t.ctab"
    write_ref_ctab(str(good), 2, np.arange(16, dtype=np.int32))
    data = open(good, "rb").read()
    open(p, "wb").write(data[:-8])
    with pytest.raises(ValueError):
        read_ref_ctab(str(p))


def test_sals_and_samodify(genome_fa, tmp_path, capsys):
    from blasr_tpu.cli.sawriter import run as sawriter
    d, contigs = genome_fa
    sa = tmp_path / "g.sa"
    assert sawriter([str(sa), str(d / "g.fa"), "--fullSuffixArray"]) == 0
    assert st.run_sals([str(sa) + ".npz"]) == 0
    out = capsys.readouterr().out
    assert "has a suffix array" in out and "lookup table" in out
    out_sa = tmp_path / "g2.sa"
    assert st.run_samodify([str(sa) + ".npz", str(d / "g.fa"),
                            str(out_sa), "-blt", "10"]) == 0
    from blasr_tpu.index.genome import GenomeIndex
    gi = GenomeIndex.load(str(out_sa) + ".npz")
    assert gi.k == 10


def test_evolve_writes_gff_and_mutations(genome_fa, tmp_path):
    d, contigs = genome_fa
    mut = tmp_path / "mut.fa"
    gff = tmp_path / "vars.gff"
    assert st.run_evolve([str(d / "g.fa"), str(mut), "-sub", "0.02",
                          "-ins", "0.01", "-del", "0.01",
                          "-gff", str(gff), "-seed", "3"]) == 0
    out = read_fasta(mut)
    assert len(out) == 2
    lines = open(gff).read().strip().splitlines()
    assert len(lines) > 50
    kinds = {l.split("\t")[2] for l in lines}
    assert kinds == {"SNV", "deletion", "insertion"}
    # mutated genome differs but lengths are close
    assert abs(len(out[0].seq) - len(contigs[0].seq)) < len(contigs[0].seq) * 0.05


def test_excise_repeats(genome_fa, tmp_path):
    d, contigs = genome_fa
    rm = tmp_path / "rep.out"
    rm.write_text("header\nheader\n\n"
                  "100 1.0 0.0 0.0 contig0 100 200 x + rep cls 1 2 3 1\n"
                  "100 1.0 0.0 0.0 contig0 500 600 x + rep cls 1 2 3 2\n")
    out = tmp_path / "ex.fa"
    assert st.run_excise_repeats([str(d / "g.fa"), str(rm), str(out)]) == 0
    ex = read_fasta(out)[0]
    assert len(ex.seq) == len(contigs[0].seq) - 200


def test_simple_shredder(genome_fa, tmp_path):
    d, contigs = genome_fa
    out = tmp_path / "shred.fq"
    assert st.run_simple_shredder(
        [str(d / "g.fa"), "-readsFile", str(out), "-readLength", "150",
         "-nReads", "20", "-fastq", "-nonRandInit"]) == 0
    recs = read_fastq(out)
    assert len(recs) == 20
    assert all(len(r.seq) == 150 for r in recs)
    assert all((r.qual == 20).all() for r in recs)
    # stratify mode
    out2 = tmp_path / "strat.fa"
    assert st.run_simple_shredder(
        [str(d / "g.fa"), "-readsFile", str(out2), "-readLength", "100",
         "-stratify", "1000", "-nonRandInit"]) == 0
    n = sum(len(c.seq) for c in contigs)
    assert len(read_fasta(out2)) == len(range(0, n - 100, 1000))


def test_bsdb(genome_fa, tmp_path):
    d, contigs = genome_fa
    out = tmp_path / "db"
    assert st.run_bsdb([str(d / "g.fa"), str(out)]) == 0
    z = np.load(str(out) + ".npz")
    assert list(z["names"]) == [c.name for c in contigs]
    assert list(z["lengths"]) == [len(c.seq) for c in contigs]


def test_ref_sa_roundtrip_and_tools(genome_fa, tmp_path, capsys):
    """Reference binary .sa layout (SuffixArray::Write reconstruction,
    utils/SAWriter.cpp:239): write -> sniff -> read round trip; sals and
    samodify speak it; the lookup table brackets every p-mer."""
    from blasr_tpu.cli.sawriter import run as sawriter
    from blasr_tpu.index.genome import concat_contigs
    from blasr_tpu.io.refsa import (is_ref_sa, lookup_table_from_sa,
                                    read_ref_sa, write_ref_sa)

    d, contigs = genome_fa
    ref_sa = tmp_path / "g.ref.sa"
    assert sawriter([str(ref_sa), str(d / "g.fa"), "--saFormat", "ref",
                     "-blt", "6"]) == 0
    assert is_ref_sa(str(ref_sa))
    sa, p, table = read_ref_sa(str(ref_sa))
    assert sa is not None and p == 6 and len(table) == 4 ** 6 + 1

    genome, _ = concat_contigs(contigs)
    # every bucket's SA range holds exactly the suffixes starting with
    # that p-mer
    G = len(genome)
    got = 0
    for key in (0, 5, 4 ** 6 - 1):
        lo, hi = int(table[key]), int(table[key + 1])
        for slot in range(lo, min(hi, lo + 50)):
            t = int(sa[slot])
            if t + p <= G and all(int(genome[t + j]) < 4 for j in range(p)):
                kk = 0
                for j in range(p):
                    kk = (kk << 2) | int(genome[t + j])
                assert kk == key
                got += 1
    assert table[-1] >= table[0]

    # sals reports the components of the binary layout
    assert st.run_sals([str(ref_sa)]) == 0
    out = capsys.readouterr().out
    assert "has a suffix array" in out and "word size. 6" in out

    # samodify rebuilds the lookup table in place (format preserved)
    out_sa = tmp_path / "g.ref2.sa"
    assert st.run_samodify([str(ref_sa), str(d / "g.fa"), str(out_sa),
                            "-blt", "8"]) == 0
    sa2, p2, table2 = read_ref_sa(str(out_sa))
    assert p2 == 8 and np.array_equal(sa2, sa)
    assert len(table2) == 4 ** 8 + 1

    # a truncated file is rejected with a reason, not misparsed
    bad = tmp_path / "trunc.sa"
    bad.write_bytes(open(ref_sa, "rb").read()[:40])
    with pytest.raises(ValueError):
        read_ref_sa(str(bad))

    # .npz artifacts never sniff as reference .sa
    npz_sa = tmp_path / "g.npz.sa"
    assert sawriter([str(npz_sa), str(d / "g.fa")]) == 0
    assert not is_ref_sa(str(npz_sa) + ".npz")
