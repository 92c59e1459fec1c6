"""BGZF + BAM codec tests: roundtrip, BAM-out from the CLI, BAM-in parity
(ctest/bamOut.t, bamIn.t analogs)."""

import io as _io
import struct
import zlib

import numpy as np
import pytest

from blasr_tpu.io.bam import BamRecord, BamWriter, read_bam, read_bam_records
from blasr_tpu.io.bgzf import BgzfWriter, read_bgzf
from blasr_tpu.io.fasta import decode, encode, write_fasta
from blasr_tpu.sim import random_genome, simulate_reads


def test_bgzf_roundtrip(tmp_path):
    data = bytes(range(256)) * 1000  # spans multiple blocks
    p = tmp_path / "t.bgzf"
    with open(p, "wb") as f:
        w = BgzfWriter(f)
        w.write(data)
        w.close()
    with open(p, "rb") as f:
        assert read_bgzf(f) == data
    # standard gzip can also read it
    import gzip
    with gzip.open(p, "rb") as f:
        assert f.read() == data


def test_bam_record_roundtrip(tmp_path):
    p = tmp_path / "t.bam"
    recs = [
        BamRecord("read/1/0_50", 0, 0, 100, 254,
                  [("S", 5), ("M", 40), ("I", 2), ("D", 3), ("M", 3)],
                  encode("ACGT" * 12 + "AC"), np.arange(50) % 40,
                  {"AS": -123, "NM": 5, "RG": "grp1"}),
        BamRecord("read/2/0_8", 16, 1, 0, 7, [("M", 8)],
                  encode("ACGTACGT"), None, {"AS": -40}),
    ]
    with open(p, "wb") as f:
        w = BamWriter(f, "@HD\tVN:1.5\n@SQ\tSN:c0\tLN:500\n@SQ\tSN:c1\tLN:300\n",
                      ["c0", "c1"], [500, 300])
        for r in recs:
            w.write_record(r)
        w.close()
    text, names, lengths, got = read_bam(str(p))
    assert names == ["c0", "c1"] and lengths == [500, 300]
    assert "@HD" in text
    assert len(got) == 2
    g0, g1 = got
    assert g0.qname == "read/1/0_50" and g0.flag == 0 and g0.pos == 100
    assert g0.cigar == recs[0].cigar
    assert decode(g0.seq) == decode(recs[0].seq)
    assert list(g0.qual) == list(recs[0].qual)
    assert g0.tags["AS"] == -123 and g0.tags["NM"] == 5
    assert g0.tags["RG"] == "grp1"
    assert g1.qual is None
    assert g1.flag == 16


def test_cli_bam_out_matches_sam(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from blasr_tpu.cli.blasr import run
    contigs = random_genome(50_000, seed=61)
    sims = simulate_reads(contigs, 5, read_len=(300, 600), accuracy=0.9,
                          seed=62)
    genome = str(tmp_path / "g.fa")
    reads = str(tmp_path / "r.fa")
    write_fasta(genome, contigs)
    write_fasta(reads, [s.rec for s in sims])
    sam = str(tmp_path / "o.sam")
    bam = str(tmp_path / "o.bam")
    assert run([reads, genome, "--sam", "--clipping", "soft", "--out", sam]) == 0
    assert run([reads, genome, "--bam", "--clipping", "soft", "--out", bam]) == 0
    _, names, _, brecs = read_bam(bam)
    srecs = [l.split("\t") for l in open(sam) if not l.startswith("@")]
    assert len(brecs) == len(srecs)
    for b, s in zip(brecs, srecs):
        assert b.qname == s[0]
        assert b.flag == int(s[1])
        assert names[b.ref_id] == s[2]
        assert b.pos + 1 == int(s[3])
        assert b.mapq == int(s[4])
        cig = "".join(f"{n}{op}" for op, n in b.cigar)
        assert cig == s[5]
        assert decode(b.seq) == s[9]

    # BAM-in: mapping the BAM reads reproduces fasta-input alignments
    # (ctest/bamIn.t contract)
    m4a = str(tmp_path / "a.m4")
    m4b = str(tmp_path / "b.m4")
    assert run([reads, genome, "-m", "4", "--out", m4a]) == 0
    assert run([bam, genome, "-m", "4", "--out", m4b]) == 0
    ca = sorted(" ".join(l.split()[1:]) for l in open(m4a))
    cb = sorted(" ".join(l.split()[1:]) for l in open(m4b))
    assert ca == cb
