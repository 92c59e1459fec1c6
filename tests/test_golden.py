"""Cram-style golden-output regression tests.

The reference's whole test strategy is golden-file diffs of real runs
(SURVEY.md §4: ctest/*.t compare dated golden outputs exactly).  Here
fixed-seed synthetic workloads are mapped through the real CLI and the
outputs diffed byte-for-byte against checked-in goldens
(tests/golden/*) — the bit-identical-output contract across refactors.

Coverage (the ctest contract, SURVEY.md §4): every output format m0-m5 +
SAM; soft/hard/subread clipping; randombest determinism; affine mode;
--bwt index input; an E. coli-scale genome; concordant subread mapping;
a CCS-passes workload; FASTQ --useQuality; bax.h5 subread splitting with
--noSplitSubreads and --holeNumbers; multipart bas.h5; dataset-XML
filters.

Regenerate (only when an intentional behavior change is reviewed):
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# (name, world, extra flags); world decides reads/genome/index inputs
CASES = [
    # -- small world (60 kb, 2 contigs, 12 reads): format/mode coverage --
    ("m4", "small", ["-m", "4"]),
    ("m1", "small", ["-m", "1"]),
    ("m5", "small", ["-m", "5"]),
    ("sam", "small", ["--sam", "--clipping", "soft"]),
    ("m4.rb", "small", ["-m", "4", "--hitPolicy", "randombest",
                        "--randomSeed", "1"]),
    ("m4.affine", "small", ["-m", "4", "--affineAlign", "--affineOpen", "8",
                            "--affineExtend", "1"]),
    ("m0", "small", ["-m", "0"]),
    ("m2", "small", ["-m", "2"]),
    ("m3", "small", ["-m", "3"]),
    ("sam.hard", "small", ["--sam", "--clipping", "hard"]),
    ("sam.subread", "small", ["--sam", "--clipping", "subread"]),
    ("m4.bwt", "small_bwt", ["-m", "4"]),
    # -- custom score function (ctest/alignScore.t role) --
    ("m4.scores", "small", ["-m", "4", "--match", "-2", "--mismatch", "3",
                            "--insertion", "6", "--deletion", "7"]),
    # -- E. coli-scale world (4.6 Mbp, 10 reads): long deletions, ends --
    ("m4.big", "big", ["-m", "4"]),
    ("sam.big", "big", ["--sam", "--clipping", "soft"]),
    # -- multi-subread ZMWs: concordant mode (ctest/concordant.t role) --
    ("m4.concordant", "zmw", ["-m", "4", "--concordant", "--bestn", "1"]),
    # -- ccs.h5 with Passes (ctest/useccsall.t role) --
    ("m4.ccs", "ccs", ["-m", "4", "--useccs"]),
    # -- ccs.h5 as plain input maps the consensus calls (ctest/ccsH5.t:
    #    default is the same as --useccsdenovo) --
    ("m4.ccsdenovo", "ccs", ["-m", "4"]),
    # -- every pass, best hit only (ctest/useccsallBestN1.t role) --
    ("m4.ccsall.b1", "ccs", ["-m", "4", "--useccsall", "--bestn", "1"]),
    # -- FASTQ input with QVs (ctest/deterministic.t QV-present role):
    #    --useQuality turns on QV-aware rescoring; SAM emits QUAL --
    ("m4.fastq", "fastq", ["-m", "4", "--useQuality"]),
    ("sam.fastq", "fastq", ["--sam", "--clipping", "soft", "--useQuality"]),
    # -- QV-steered DP (PairwiseLocalAlign QV branch): IDS tracks move an
    #    ambiguous homopolymer insertion, so the CIGAR (not just the
    #    score) differs between these two runs (test_qv_changes_cigar) --
    ("sam.qv", "qvsteer", ["--sam", "--clipping", "soft", "--useQuality"]),
    ("sam.qv.noqv", "qvsteer", ["--sam", "--clipping", "soft"]),
    # -- bax.h5 polymerase reads: region-table subread splitting
    #    (ctest/noSplitSubreads.t + holeNumbers.t roles) --
    ("m4.bax", "bax", ["-m", "4"]),
    ("m4.nosplit", "bax", ["-m", "4", "--noSplitSubreads"]),
    ("m4.holes", "bax", ["-m", "4", "--holeNumbers", "4-11"]),
    # -- new-style bas.h5 with /MultiPart/Parts (ctest/multipart.t) --
    ("m4.multipart", "multipart", ["-m", "4"]),
    # -- dataset XML input with a length filter (ctest/dataset.t) --
    ("m4.xml", "dataset", ["-m", "4"]),
    # -- heuristic interval-search variants (ctest/fastMaxInterval.t +
    #    aggressiveIntervalCut.t roles) pinned on the big world --
    ("m4.fastmax", "big", ["-m", "4", "--fastMaxInterval"]),
    ("m4.aggressive", "big", ["-m", "4", "--aggressiveIntervalCut"]),
    # -- output filter criteria (ctest/filtercriteria.t role) --
    ("m4.filter", "small", ["-m", "4", "--minPctSimilarity", "82",
                            "--minAlnLength", "500"]),
    # -- FOFN input (ctest/fofn.t role) --
    ("m4.fofn", "fofn", ["-m", "4"]),
    # -- unaligned BAM input (ctest/bamIn.t role; equivalence with the
    #    FASTA run is asserted by test_bamin_equals_fasta) --
    ("m4.bamin", "bamin", ["-m", "4"]),
    # -- unaligned-read listing (ctest/unaligned.t role); the golden
    #    includes the --unaligned file contents --
    ("m4.unal", "unal", ["-m", "4", "--unaligned", "@D@/unal.txt"]),
    ("m4.unal.names", "unal", ["-m", "4", "--unaligned", "@D@/unal2.txt",
                               "--noPrintUnalignedSeqs"]),
    # -- hp-biased CLR errors over STR arrays + fat homopolymer runs:
    #    the workload the hp-insertion band (--affineAlign,
    #    BlasrAlignImpl.hpp:1262-1266) and QV steering exist for --
    ("m4.hpstr.affine", "hpstr", ["-m", "4", "--affineAlign"]),
    ("sam.hpstr.qv", "hpstr", ["--sam", "--clipping", "soft",
                               "--useQuality"]),
]


def make_small(d):
    from blasr_tpu.io.fasta import FastaRecord, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    reads = os.path.join(d, "reads.fa")
    genome = os.path.join(d, "genome.fa")
    if os.path.exists(reads) and os.path.exists(genome):
        # the bwt/fofn/bamin worlds reuse the small world; don't rebuild
        # the identical fixture (ADVICE r3)
        return reads, genome, []
    contigs = random_genome(60_000, seed=777, n_contigs=2)
    sims = simulate_reads(contigs, 12, read_len=(250, 900), accuracy=0.87,
                          seed=778)
    recs = [FastaRecord(f"movie/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    write_fasta(os.path.join(d, "genome.fa"), contigs)
    write_fasta(os.path.join(d, "reads.fa"), recs)
    return os.path.join(d, "reads.fa"), os.path.join(d, "genome.fa"), []


def make_small_bwt(d):
    """--bwt input: sawriter -> sa2bwt artifacts over the small genome."""
    reads, genome, _ = make_small(d)
    from blasr_tpu.cli.sa2bwt import run as sa2bwt_run
    from blasr_tpu.cli.sawriter import run as sawriter_run
    sa = os.path.join(d, "genome.sa.npz")
    bwt = os.path.join(d, "genome.bwt.npz")
    assert sawriter_run([sa, genome, "--fullSuffixArray"]) == 0
    assert sa2bwt_run([genome, sa, bwt]) == 0
    return reads, genome, ["--bwt", bwt]


def make_big(d):
    from blasr_tpu.io.fasta import FastaRecord, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(4_600_000, seed=4600)
    sims = simulate_reads(contigs, 10, read_len=(400, 2200), accuracy=0.85,
                          seed=4601)
    recs = [FastaRecord(f"movie/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    # one read overlapping the contig end (end clamping edge case)
    g = contigs[0].seq
    recs.append(FastaRecord(f"movie/{len(recs)}/0_900", g[-900:].copy()))
    write_fasta(os.path.join(d, "genome_big.fa"), contigs)
    write_fasta(os.path.join(d, "reads_big.fa"), recs)
    return (os.path.join(d, "reads_big.fa"),
            os.path.join(d, "genome_big.fa"), [])


def make_zmw(d):
    from blasr_tpu.io.fasta import FastaRecord, revcomp, write_fasta
    from blasr_tpu.sim import mutate, random_genome
    rng = np.random.default_rng(901)
    contigs = random_genome(80_000, seed=900)
    g = contigs[0].seq
    insert = g[30_000:30_600]
    recs = []
    pos = 0
    for p in range(4):
        frag = insert if p % 2 == 0 else revcomp(insert)
        sub = mutate(frag, rng, 0.03, 0.07, 0.04)
        recs.append(FastaRecord(f"mov/7/{pos}_{pos + len(sub)}", sub))
        pos += len(sub) + 40
    sub2 = mutate(g[60_000:60_500], rng, 0.03, 0.07, 0.04)
    recs.append(FastaRecord(f"mov/9/0_{len(sub2)}", sub2))
    write_fasta(os.path.join(d, "genome_zmw.fa"), contigs)
    write_fasta(os.path.join(d, "reads_zmw.fa"), recs)
    return (os.path.join(d, "reads_zmw.fa"),
            os.path.join(d, "genome_zmw.fa"), [])


def make_ccs(d):
    from blasr_tpu.io.fasta import revcomp, write_fasta
    from blasr_tpu.io.hdf import ZmwRead, write_ccs
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(30_000, seed=111)
    rng = np.random.default_rng(112)
    sims = simulate_reads(contigs, 2, read_len=(300, 320), accuracy=0.99,
                          seed=113)
    ccs_zmws, raw_zmws, passes = [], [], []
    for hole, s in zip((3, 8), sims):
        tmpl = s.rec.seq
        adapter = rng.integers(0, 4, 40).astype(np.int8)

        def noisy(x):
            y = x.copy()
            idx = rng.random(len(y)) < 0.03
            y[idx] = rng.integers(0, 4, int(idx.sum()))
            return y

        p1 = noisy(tmpl)
        p2 = revcomp(noisy(tmpl))
        p3 = noisy(tmpl[:120])
        raw = np.concatenate([p1, adapter, p2, adapter, p3])
        o2 = len(p1) + 40
        o3 = o2 + len(p2) + 40
        passes.append([(0, 0, len(p1), 1, 1), (1, o2, len(p2), 1, 1),
                       (0, o3, len(p3), 1, 0)])
        ccs_zmws.append(ZmwRead(hole, tmpl, {}))
        raw_zmws.append(ZmwRead(hole, raw, {}))
    path = os.path.join(d, "movie.ccs.h5")
    write_ccs(path, "mccs", ccs_zmws, raw_zmws, passes)
    write_fasta(os.path.join(d, "genome_ccs.fa"), contigs)
    return path, os.path.join(d, "genome_ccs.fa"), []


def make_fastq(d):
    """FASTQ reads over a genome with a near-duplicate repeat: ambiguous
    placements make mapQV depend on the QV-aware log-prob rescore, so the
    golden actually pins the --useQuality path."""
    from blasr_tpu.io.fasta import FastaRecord, decode, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(60_000, seed=555, n_contigs=2)
    g = contigs[0].seq
    rng = np.random.default_rng(557)
    # second copy of a 3 kb block, ~1.5% diverged
    block = g[5_000:8_000].copy()
    mut = rng.random(len(block)) < 0.015
    block[mut] = rng.integers(0, 4, int(mut.sum()))
    g[20_000:23_000] = block
    sims = simulate_reads([FastaRecord("rep", g[4_500:8_500])], 5,
                          read_len=(300, 900), accuracy=0.87, seed=556)
    sims += simulate_reads(contigs, 3, read_len=(250, 800), accuracy=0.87,
                           seed=558)
    path = os.path.join(d, "reads.fastq")
    with open(path, "w") as f:
        for i, s in enumerate(sims):
            seq = s.rec.seq
            qual = rng.integers(8, 40, len(seq))
            f.write(f"@movie/{i}/0_{len(seq)}\n{decode(seq)}\n+\n")
            f.write("".join(chr(int(x) + 33) for x in qual) + "\n")
    write_fasta(os.path.join(d, "genome_fq.fa"), contigs)
    return path, os.path.join(d, "genome_fq.fa"), []


def make_hpstr(d):
    """Homopolymer-insertion-biased reads (sim.mutate hp_ins_mult) over a
    genome with short-period STR arrays and planted fat hp runs: real
    PacBio CLR error concentrates insertions in homopolymers, the case
    the affine hp-insertion band and the IDS QV steering are for."""
    from blasr_tpu.io.fasta import decode, write_fasta
    from blasr_tpu.sim import mutate, structured_genome
    contigs, features = structured_genome(
        80_000, seed=901, n_str=4, str_period=(2, 6), str_len=(400, 1200))
    g = contigs[0].seq
    rng = np.random.default_rng(902)
    for pos, ln in ((12_000, 12), (33_000, 9), (61_000, 15)):
        g[pos:pos + ln] = g[pos]
    targets = [12_000 - 200, 33_000 - 350, 61_000 - 100]
    targets += [f.start - 150 for f in features if f.kind == "str"][:3]
    path = os.path.join(d, "reads_hp.fastq")
    with open(path, "w") as f:
        for i, ts in enumerate(targets):
            ln = int(rng.integers(500, 800))
            ts = max(0, min(ts, len(g) - ln))
            seq = mutate(g[ts:ts + ln], rng, 0.02, 0.06, 0.03,
                         hp_ins_mult=6.0)
            qual = rng.integers(8, 40, len(seq))
            f.write(f"@movie/{i}/0_{len(seq)}\n{decode(seq)}\n+\n")
            f.write("".join(chr(int(x) + 33) for x in qual) + "\n")
    write_fasta(os.path.join(d, "genome_hp.fa"), contigs)
    return path, os.path.join(d, "genome_hp.fa"), []


def _bax_movie(d, movie, holes, genome_seed, read_seed, junk_seed):
    """One deterministic bax.h5 movie: per-ZMW polymerase reads of
    junk + insert + adapter + insert + junk, with Insert/HQRegion rows."""
    from blasr_tpu.io.hdf import REGION_TYPES, ZmwRead, write_bax
    from blasr_tpu.sim import random_genome, simulate_reads
    ins_t = REGION_TYPES.index("Insert")
    hq_t = REGION_TYPES.index("HQRegion")
    contigs = random_genome(30_000, seed=genome_seed)
    sims = simulate_reads(contigs, 2 * len(holes), read_len=(200, 400),
                          accuracy=0.9, seed=read_seed)
    rng = np.random.default_rng(junk_seed)
    zmws, regions = [], []
    si = 0
    for hole in holes:
        parts, rows = [], []
        pos = 0
        parts.append(rng.integers(0, 4, 50).astype(np.int8))
        pos += 50
        for _ in range(2):
            ins = sims[si].rec.seq
            si += 1
            rows.append([hole, ins_t, pos, pos + len(ins), -1])
            parts.append(ins)
            pos += len(ins)
            parts.append(rng.integers(0, 4, 45).astype(np.int8))
            pos += 45
        seq = np.concatenate(parts)
        rows.append([hole, hq_t, 30, len(seq) - 20, 850])
        zmws.append(ZmwRead(hole, seq, {}))
        regions.extend(rows)
    path = os.path.join(d, f"{movie}.bax.h5")
    write_bax(path, movie, zmws, np.asarray(regions, np.int32))
    return path, contigs


def make_bax(d):
    from blasr_tpu.io.fasta import write_fasta
    path, contigs = _bax_movie(d, "m_gold", (4, 11, 19), 4441, 4442, 4443)
    write_fasta(os.path.join(d, "genome_bax.fa"), contigs)
    return path, os.path.join(d, "genome_bax.fa"), ["--minReadLength", "50"]


def make_multipart(d):
    """bas.h5 with no /PulseData and a /MultiPart/Parts dataset naming two
    bax.h5 parts: the run must map the union of both parts' ZMWs."""
    import h5py
    from blasr_tpu.io.fasta import write_fasta
    p1, contigs = _bax_movie(d, "m_part1", (3, 12), 4441, 5551, 5552)
    # part 2 shares the genome (same seed) so both parts' reads map to it
    p2, _ = _bax_movie(d, "m_part2", (21, 30), 4441, 5553, 5554)
    bas = os.path.join(d, "m_mp.bas.h5")
    with h5py.File(bas, "w") as f:
        f.create_dataset(
            "MultiPart/Parts",
            data=np.array([os.path.basename(p1).encode(),
                           os.path.basename(p2).encode()]))
    write_fasta(os.path.join(d, "genome_mp.fa"), contigs)
    return bas, os.path.join(d, "genome_mp.fa"), ["--minReadLength", "50"]


def make_dataset(d):
    """subreadset XML over FASTA reads with a length >= 300 filter."""
    from blasr_tpu.io.fasta import FastaRecord, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(40_000, seed=6661)
    sims = simulate_reads(contigs, 8, read_len=(150, 700), accuracy=0.88,
                          seed=6662)
    recs = [FastaRecord(f"movie/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    write_fasta(os.path.join(d, "ds_reads.fa"), recs)
    write_fasta(os.path.join(d, "genome_ds.fa"), contigs)
    xml = os.path.join(d, "ds.subreadset.xml")
    with open(xml, "w") as f:
        f.write("""<?xml version="1.0" encoding="utf-8"?>
<pbds:SubreadSet xmlns:pbbase="http://pacificbiosciences.com/PacBioBaseDataModel.xsd"
  xmlns:pbds="http://pacificbiosciences.com/PacBioDatasets.xsd">
  <pbbase:ExternalResources>
    <pbbase:ExternalResource ResourceId="ds_reads.fa"/>
  </pbbase:ExternalResources>
  <pbds:Filters>
    <pbds:Filter>
      <pbbase:Properties>
        <pbbase:Property Name="length" Value="300" Operator="&gt;="/>
      </pbbase:Properties>
    </pbds:Filter>
  </pbds:Filters>
</pbds:SubreadSet>
""")
    return xml, os.path.join(d, "genome_ds.fa"), []


def make_fofn(d):
    """FOFN input naming two FASTA parts (ctest/fofn.t role): the run must
    map the concatenation of both files' reads."""
    from blasr_tpu.io.fasta import read_fasta, write_fasta
    reads, genome, _ = make_small(d)
    recs = read_fasta(reads)
    p1 = os.path.join(d, "fofn_part1.fa")
    p2 = os.path.join(d, "fofn_part2.fa")
    write_fasta(p1, recs[:7])
    write_fasta(p2, recs[7:])
    fofn = os.path.join(d, "reads.fofn")
    with open(fofn, "w") as f:
        f.write(p1 + "\n" + p2 + "\n")
    return fofn, genome, []


def make_bamin(d):
    """Unaligned-BAM input with the SAME reads as the small world
    (ctest/bamIn.t role: fasta-vs-bam input equivalence; see
    test_bamin_equals_fasta)."""
    from blasr_tpu.io.bam import BamRecord, BamWriter
    from blasr_tpu.io.fasta import read_fasta
    reads, genome, _ = make_small(d)
    recs = read_fasta(reads)
    bam = os.path.join(d, "reads_in.bam")
    with open(bam, "wb") as f:
        w = BamWriter(f, "@HD\tVN:1.5\tSO:unknown\n", [], [])
        for r in recs:
            w.write_record(BamRecord(r.name, 4, -1, -1, 255, [],
                                     r.seq, None))
        w.close()
    return bam, genome, []


def make_unal(d):
    """Small world plus two unmappable junk reads (ctest/unaligned.t
    role): --unaligned must list exactly those reads."""
    from blasr_tpu.io.fasta import FastaRecord, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(60_000, seed=881, n_contigs=2)
    sims = simulate_reads(contigs, 6, read_len=(300, 800), accuracy=0.87,
                          seed=882)
    recs = [FastaRecord(f"movie/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    rng = np.random.default_rng(883)
    for j in range(2):
        junk = rng.integers(0, 4, 450).astype(np.int8)
        recs.append(FastaRecord(f"movie/{90 + j}/0_450", junk))
    write_fasta(os.path.join(d, "genome_un.fa"), contigs)
    write_fasta(os.path.join(d, "reads_un.fa"), recs)
    return (os.path.join(d, "reads_un.fa"),
            os.path.join(d, "genome_un.fa"), [])


def make_qvsteer(d):
    """bax.h5 with full IDS tracks and a planted 8-T homopolymer: each
    read carries one extra T whose placement inside the run is ambiguous
    at flat costs; a low InsertionQV at one run column steers it there
    when --useQuality is on (KBandAlign + IDSScoreFunction,
    BlasrAlignImpl.hpp:1276-1298)."""
    from blasr_tpu.io.fasta import write_fasta
    from blasr_tpu.io.hdf import REGION_TYPES, ZmwRead, write_bax
    from blasr_tpu.sim import random_genome
    ins_t = REGION_TYPES.index("Insert")
    hq_t = REGION_TYPES.index("HQRegion")
    contigs = random_genome(30_000, seed=9911)
    g = contigs[0].seq
    g[4999] = 0
    g[5000:5008] = 3
    g[5008] = 1
    zmws, regions = [], []
    for k, hole in enumerate((5, 9)):
        start = 4800 + 40 * k
        seg = np.asarray(g[start:start + 400])
        run0 = 5000 - start
        read = np.concatenate(
            [seg[:run0 + 4], [3], seg[run0 + 4:]]).astype(np.int8)
        n = len(read)
        insq = np.full(n, 18, np.uint8)
        # cheap insertion at opposite ends of the run per read
        insq[run0 + 1 + 7 * (k % 2)] = 2
        tracks = {
            "QualityValue": np.full(n, 30, np.uint8),
            "InsertionQV": insq,
            "DeletionQV": np.full(n, 13, np.uint8),
            "SubstitutionQV": np.full(n, 21, np.uint8),
            "DeletionTag": np.full(n, ord("N"), np.uint8),
            "SubstitutionTag": np.full(n, ord("N"), np.uint8),
        }
        zmws.append(ZmwRead(hole, read, tracks))
        regions.append([hole, ins_t, 0, n, -1])
        regions.append([hole, hq_t, 0, n, 900])
    path = os.path.join(d, "m_qv.bax.h5")
    write_bax(path, "m_qv", zmws, np.asarray(regions, np.int32))
    write_fasta(os.path.join(d, "genome_qv.fa"), contigs)
    return path, os.path.join(d, "genome_qv.fa"), []


WORLDS = {"small": make_small, "small_bwt": make_small_bwt,
          "big": make_big, "zmw": make_zmw, "ccs": make_ccs,
          "fastq": make_fastq, "bax": make_bax,
          "multipart": make_multipart, "dataset": make_dataset,
          "fofn": make_fofn, "bamin": make_bamin, "unal": make_unal,
          "qvsteer": make_qvsteer, "hpstr": make_hpstr}


def run_case(d, name, world, flags, world_cache):
    from blasr_tpu.cli.blasr import run
    if world not in world_cache:
        world_cache[world] = WORLDS[world](d)
    reads, genome, extra = world_cache[world]
    out = os.path.join(d, f"out.{name}")
    flags = [f.replace("@D@", d) for f in flags]
    assert run([reads, genome, "--out", out] + extra + flags) == 0
    text = open(out).read()
    if "--unaligned" in flags:
        unal = flags[flags.index("--unaligned") + 1]
        text += "== unaligned ==\n" + open(unal).read()
    if name.startswith("sam"):
        # drop the @PG line (embeds the command line / output path)
        text = "\n".join(l for l in text.splitlines()
                         if not l.startswith("@PG")) + "\n"
    return text


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("golden")), {}


@pytest.mark.parametrize("name,world,flags", CASES)
def test_golden(world_dir, name, world, flags):
    d, cache = world_dir
    golden = os.path.join(GOLDEN_DIR, f"golden.{name}")
    if not os.path.exists(golden):
        pytest.skip("golden missing; run: python tests/test_golden.py regen")
    got = run_case(d, name, world, flags, cache)
    want = open(golden).read()
    assert got == want, f"output for {name} differs from {golden}"


def test_qv_changes_cigar():
    """QV-steered DP contract: with --useQuality the CIGAR differs (the
    planted low-InsertionQV column moves the homopolymer insertion)
    while the mapping position stays identical."""
    a = os.path.join(GOLDEN_DIR, "golden.sam.qv")
    b = os.path.join(GOLDEN_DIR, "golden.sam.qv.noqv")
    if not (os.path.exists(a) and os.path.exists(b)):
        pytest.skip("goldens missing")

    def cigars(path):
        out = {}
        for line in open(path):
            if line.startswith("@"):
                continue
            f = line.split("\t")
            out[f[0]] = (f[3], f[5])
        return out

    ca, cb = cigars(a), cigars(b)
    assert ca and set(ca) == set(cb)
    assert all(ca[k][0] == cb[k][0] for k in ca), "positions moved"
    assert any(ca[k][1] != cb[k][1] for k in ca), \
        "QV steering changed no CIGAR"


def test_bamin_equals_fasta():
    """ctest/bamIn.t contract: the same reads via FASTA and via unaligned
    BAM produce identical alignments."""
    a = os.path.join(GOLDEN_DIR, "golden.m4")
    b = os.path.join(GOLDEN_DIR, "golden.m4.bamin")
    if not (os.path.exists(a) and os.path.exists(b)):
        pytest.skip("goldens missing")
    assert open(a).read() == open(b).read()


def regen(only_missing=False, only=None):
    import tempfile
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as d:
        cache = {}
        for name, world, flags in CASES:
            path = os.path.join(GOLDEN_DIR, f"golden.{name}")
            if only_missing and os.path.exists(path):
                continue
            if only and name not in only:
                continue
            text = run_case(d, name, world, flags, cache)
            with open(path, "w") as f:
                f.write(text)
            print(f"wrote golden.{name} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("regen", "regen-missing"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        regen(only_missing=sys.argv[1] == "regen-missing",
              only=set(sys.argv[2:]) or None)
