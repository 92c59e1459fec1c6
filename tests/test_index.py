"""Index layer: packing, seqdb, k-mer table, suffix array vs brute oracle."""

import numpy as np
import pytest

from blasr_tpu.index.genome import (
    SeqDB, build_ctab, build_genome_index, build_kmer_index, concat_contigs)
from blasr_tpu.index.suffix_array import (
    build_suffix_array_numpy, kmer_keys)
from blasr_tpu.io.fasta import FastaRecord, decode, encode, revcomp
from blasr_tpu.sim import random_genome


def brute_suffix_array(s):
    n = len(s)
    suf = sorted(range(n), key=lambda i: tuple(s[i:]))
    return np.array(suf)


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    e = encode(s)
    assert decode(e) == "ACGTNACGTN"
    assert list(e) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]


def test_revcomp():
    assert decode(revcomp(encode("ACGTN"))) == "NACGT"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_suffix_array_matches_brute(seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 4, 500, dtype=np.int8)
    sa = build_suffix_array_numpy(s)
    assert np.array_equal(sa, brute_suffix_array(list(s)))


def test_suffix_array_repetitive():
    s = encode("ACACACACACACAC")
    sa = build_suffix_array_numpy(s)
    assert np.array_equal(sa, brute_suffix_array(list(s)))


def test_kmer_keys_oracle():
    s = encode("ACGTACGTNACGT")
    k = 4
    keys, valid = kmer_keys(s, k)
    for i in range(len(s)):
        window = s[i:i + k]
        expect_valid = len(window) == k and all(b < 4 for b in window)
        assert valid[i] == expect_valid, i
        if expect_valid:
            expect = 0
            for b in window:
                expect = expect * 4 + int(b)
            assert keys[i] == expect


def test_kmer_index_finds_all_occurrences():
    contigs = random_genome(5000, seed=3)
    genome, _ = concat_contigs(contigs)
    keys_sorted, pos_sorted = build_kmer_index(genome, 12)
    # pick a 12-mer and check the index returns exactly its positions
    keys, valid = kmer_keys(genome, 12)
    target = keys[100]
    expect = np.sort(np.nonzero((keys == target) & valid)[0])
    lo = np.searchsorted(keys_sorted, target, side="left")
    hi = np.searchsorted(keys_sorted, target, side="right")
    got = np.sort(pos_sorted[lo:hi])
    assert np.array_equal(got, expect)


def test_seqdb_mapping():
    contigs = random_genome(1000, seed=4, n_contigs=3)
    genome, db = concat_contigs(contigs)
    assert db.n_contigs == 3
    for ci in range(3):
        s, e = db.contig_bounds(ci)
        assert np.array_equal(genome[s:e], contigs[ci].seq)
        assert db.search_for_index(s) == ci
        assert db.search_for_index(e - 1) == ci
        c2, off = db.genome_to_chrom(s + 5)
        assert (c2, off) == (ci, 5)
        assert db.chrom_to_genome(ci, 5) == s + 5


def test_ctab_counts():
    contigs = [FastaRecord("c", encode("AAAAAACA"))]
    genome, _ = concat_contigs(contigs)
    ctab = build_ctab(genome, ctab_k=2)
    # windows: AA AA AA AA AA AC CA -> AA:5 AC:1 CA:1
    assert ctab[0] == 5          # AA
    assert ctab[1] == 1          # AC
    assert ctab[4] == 1          # CA
    assert ctab.sum() == 7


def test_index_save_load(tmp_path, small_index):
    p = str(tmp_path / "idx.npz")
    small_index.save(p)
    from blasr_tpu.index.genome import GenomeIndex
    gi = GenomeIndex.load(p)
    assert np.array_equal(gi.genome, small_index.genome)
    assert np.array_equal(gi.keys_sorted, small_index.keys_sorted)
    assert gi.seqdb.names == small_index.seqdb.names
    assert gi.k == small_index.k


def test_sa_lookup_table_ranges_are_exact():
    """build_lookup_table's SA ranges are directly usable by external .sa
    consumers: sa[starts[b]:ends[b]] enumerates exactly the positions of
    p-mer b, even with interleaved N-containing suffixes."""
    import numpy as np
    from blasr_tpu.index.suffix_array import (build_lookup_table,
                                              build_suffix_array)
    rng = np.random.default_rng(17)
    codes = rng.integers(0, 4, 3000).astype(np.int8)
    codes[100:105] = 4   # an N run to force interleaving
    codes[1700] = 4
    sa = build_suffix_array(codes)
    p = 4
    starts, ends = build_lookup_table(codes, sa, prefix_len=p)
    n = len(codes)
    for b in (0, 3, 77, 201, 255):
        want = sorted(
            i for i in range(n - p + 1)
            if (codes[i:i + p] < 4).all()
            and int("".join(str(x) for x in codes[i:i + p]), 4) == b)
        got = sorted(int(x) for x in sa[starts[b]:ends[b]])
        assert got == want, (b, got[:5], want[:5])
