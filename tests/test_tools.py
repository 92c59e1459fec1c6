"""Companion tools: sawriter, sdpMatcher, samtom4, samFilter
(reference utils/ctest analog on synthetic data)."""

import os

import numpy as np
import pytest

from blasr_tpu.io.fasta import write_fasta
from blasr_tpu.sim import random_genome, simulate_reads


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    contigs = random_genome(60_000, seed=51, n_contigs=2)
    sims = simulate_reads(contigs, 8, read_len=(300, 700), accuracy=0.88,
                          seed=52)
    genome = str(d / "genome.fa")
    reads = str(d / "reads.fa")
    write_fasta(genome, contigs)
    write_fasta(reads, [s.rec for s in sims])
    return d, genome, reads, contigs, sims


def test_sawriter_and_mapping_with_prebuilt_index(files, capsys):
    d, genome, reads, contigs, sims = files
    from blasr_tpu.cli.sawriter import run as sawriter
    idx = str(d / "index")
    assert sawriter([idx, genome, "--fullSuffixArray"]) == 0
    assert os.path.exists(idx + ".npz")
    # full SA stored and valid
    from blasr_tpu.index.genome import GenomeIndex
    gi = GenomeIndex.load(idx + ".npz")
    assert gi.suffix_array is not None
    sa = gi.suffix_array
    g = gi.genome
    # spot check lexicographic order of a few adjacent suffix pairs
    for i in range(0, len(sa) - 1, len(sa) // 50):
        a, b = sa[i], sa[i + 1]
        sl = 30
        assert tuple(g[a:a + sl]) <= tuple(g[b:b + sl])
    # mapping with --sa produces output
    from blasr_tpu.cli.blasr import run as blasr
    out = str(d / "with_sa.m4")
    assert blasr([reads, genome, "--sa", idx + ".npz", "-m", "4",
                  "--out", out]) == 0
    assert sum(1 for _ in open(out)) >= 6


def test_samtom4_roundtrip(files):
    d, genome, reads, contigs, sims = files
    from blasr_tpu.cli.blasr import run as blasr
    from blasr_tpu.cli.sam_to_m4 import run as samtom4
    sam = str(d / "out.sam")
    m4_direct = str(d / "direct.m4")
    m4_from_sam = str(d / "from_sam.m4")
    assert blasr([reads, genome, "--sam", "--clipping", "soft",
                  "--out", sam]) == 0
    assert blasr([reads, genome, "-m", "4", "--out", m4_direct]) == 0
    assert samtom4([sam, genome, m4_from_sam]) == 0
    direct = sorted(open(m4_direct).read().splitlines())
    converted = sorted(open(m4_from_sam).read().splitlines())
    assert len(direct) == len(converted)
    # coordinates/strand columns must round-trip (score may differ: the SAM
    # AS tag is authoritative there)
    for a, b in zip(direct, converted):
        fa, fb = a.split(), b.split()
        assert fa[0].split("/")[0] == fb[0].split("/")[0]
        assert fa[1] == fb[1]          # tname
        assert fa[4:12] == fb[4:12]    # strands + coords


def test_sam_filter_bestn(files):
    d, genome, reads, contigs, sims = files
    from blasr_tpu.cli.blasr import run as blasr
    from blasr_tpu.cli.sam_filter import run as samfilter
    sam = str(d / "all.sam")
    filtered = str(d / "filtered.sam")
    assert blasr([reads, genome, "--sam", "--clipping", "soft",
                  "--bestn", "5", "--out", sam]) == 0
    assert samfilter([sam, filtered, "--hitPolicy", "allbest"]) == 0
    recs_in = [l for l in open(sam) if not l.startswith("@")]
    recs_out = [l for l in open(filtered) if not l.startswith("@")]
    assert 0 < len(recs_out) <= len(recs_in)
    # every emitted line must be an original line
    in_set = set(recs_in)
    assert all(l in in_set for l in recs_out)


def test_sdp_matcher(files, capsys):
    d, genome, reads, contigs, sims = files
    from blasr_tpu.cli.sdp_matcher import run as sdp
    # align a read against the contig it came from (reference CSV format:
    # qid,tid,qstart,qend,qlen,tstart,tend,tlen,score)
    q = str(d / "q.fa")
    t = str(d / "t.fa")
    write_fasta(q, [sims[0].rec])
    write_fasta(t, [contigs[sims[0].contig]])
    assert sdp([q, t, "11"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "qid,tid,qstart,qend,qlen,tstart,tend,tlen,score"
    assert len(lines) == 2
    f = lines[1].split(",")
    assert int(f[8]) < 0  # aligned with negative-better score
