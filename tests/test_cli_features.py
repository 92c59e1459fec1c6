"""CLI feature coverage: holeNumbers, titleTable, metrics, debug taps,
expand retry, scoreMatrix parsing (reference flags in
RegisterBlasrOptions.h; taps BlasrAlignImpl.hpp:62-87,465-486)."""

import numpy as np
import pytest

from blasr_tpu.cli.blasr import (
    hole_of, parse_hole_numbers, parse_score_matrix, run)
from blasr_tpu.io.fasta import FastaRecord, write_fasta
from blasr_tpu.sim import random_genome, simulate_reads


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliw")
    contigs = random_genome(60_000, seed=61, n_contigs=2)
    sims = simulate_reads(contigs, 8, read_len=(300, 700), accuracy=0.87,
                          seed=62)
    recs = [FastaRecord(f"movie/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    write_fasta(d / "genome.fa", contigs)
    write_fasta(d / "reads.fa", recs)
    (d / "titles.txt").write_text(
        "\n".join(c.name for c in contigs) + "\n")
    return d, contigs


def test_parse_helpers():
    pred = parse_hole_numbers("1,3-5,9")
    assert [h for h in range(11) if pred(h)] == [1, 3, 4, 5, 9]
    assert hole_of("movie/42/0_100") == 42
    assert hole_of("plainname") is None
    m = parse_score_matrix(" ".join(["1"] * 25))
    assert len(m) == 5 and all(len(r) == 5 for r in m)
    with pytest.raises(ValueError):
        parse_score_matrix("1 2 3")


def test_hole_numbers_and_title_table(world, capsys):
    d, contigs = world
    assert run([str(d / "reads.fa"), str(d / "genome.fa"), "-m", "4",
                "--holeNumbers", "0-2,5",
                "--titleTable", str(d / "titles.txt"),
                "--out", str(d / "out.m4")]) == 0
    lines = open(d / "out.m4").read().strip().splitlines()
    holes = {int(l.split()[0].split("/")[1]) for l in lines}
    assert holes <= {0, 1, 2, 5}
    assert {l.split()[1] for l in lines} <= {"0", "1"}  # title indices


def test_metrics_and_taps(world):
    d, contigs = world
    assert run([str(d / "reads.fa"), str(d / "genome.fa"), "-m", "1",
                "--metrics", str(d / "met.txt"),
                "--anchors", str(d / "anch.txt"),
                "--clusters", str(d / "clus.txt"),
                "--out", str(d / "out.m1")]) == 0
    met = open(d / "met.txt").read()
    assert "mapToGenome" in met and "numReads" in met
    anch = open(d / "anch.txt").read().strip().splitlines()
    assert len(anch) > 10
    f = anch[0].split()
    assert len(f) == 5 and f[4] in "01"
    clus = open(d / "clus.txt").read().strip().splitlines()
    assert clus[0].startswith("nBases")


def test_score_matrix_flag_forces_xla_kernel(world):
    d, contigs = world
    # non-uniform matrix must still produce alignments (XLA fallback path)
    mat = []
    for i in range(5):
        for j in range(5):
            mat.append("-5" if i == j and i < 4 else str(6 + (i + j) % 2))
    assert run([str(d / "reads.fa"), str(d / "genome.fa"), "-m", "4",
                "--scoreMatrix", " ".join(mat),
                "--out", str(d / "sm.m4")]) == 0
    assert len(open(d / "sm.m4").read().strip().splitlines()) >= 5


def test_sam_subread_context_threading(world, tmp_path):
    """PrintAllReadAlignments threading (BlasrUtilsImpl.hpp:1127-1212):
    subreads of one ZMW link via RNEXT/PNEXT in SAM output."""
    import numpy as np
    from blasr_tpu.io.fasta import FastaRecord, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(40_000, seed=63)
    sims = simulate_reads(contigs, 4, read_len=(250, 350), accuracy=0.9,
                          seed=64)
    # two subreads per ZMW
    recs = []
    for z in range(2):
        a, b = sims[2 * z], sims[2 * z + 1]
        recs.append(FastaRecord(f"mv/{z}/0_{len(a.rec.seq)}", a.rec.seq))
        s0 = len(a.rec.seq) + 40
        recs.append(FastaRecord(f"mv/{z}/{s0}_{s0 + len(b.rec.seq)}",
                                b.rec.seq))
    write_fasta(tmp_path / "r.fa", recs)
    write_fasta(tmp_path / "g.fa", contigs)
    from blasr_tpu.cli.blasr import run
    out = tmp_path / "out.sam"
    assert run([str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "--sam",
                "--bestn", "1", "--hitPolicy", "randombest",
                "--out", str(out)]) == 0
    body = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert len(body) >= 3
    linked = [f for f in body if f[6] != "*"]
    assert linked, body
    for f in linked:
        assert int(f[7]) > 0  # PNEXT set (1-based)


def test_loud_rejects_for_unsupported_flags(world, capsys):
    d, contigs = world
    a = [str(d / "reads.fa"), str(d / "genome.fa")]
    # --scoreType 1 (sumQVScore) is supported since round 4
    assert run(a + ["--scoreType", "1", "--out", str(d / "st1.m4")]) == 0
    assert run(a + ["--ccsFofn", "x.fofn"]) == 1
    assert run(a + ["--lcpBounds", "b.txt"]) == 1
    assert run(a + ["--samplePaths"]) == 1


def test_min_avg_qual_gate(world, tmp_path):
    """--minAvgQual drops quality-carrying reads below the threshold
    (IsGoodRead, Blasr.cpp:81); reads without QVs are exempt."""
    d, contigs = world
    g = contigs[0].seq
    recs = [
        FastaRecord("m/0/0_400", g[1000:1400].copy(),
                    np.full(400, 30, np.int32)),
        FastaRecord("m/1/0_400", g[3000:3400].copy(),
                    np.full(400, 5, np.int32)),
    ]
    rd = tmp_path / "r.fq"
    with open(rd, "w") as f:
        for r in recs:
            f.write(f"@{r.name}\n")
            f.write("".join("ACGTN"[c] for c in r.seq) + "\n+\n")
            f.write("".join(chr(q + 33) for q in r.qual) + "\n")
    out = tmp_path / "o.m4"
    assert run([str(rd), str(d / "genome.fa"), "-m", "4",
                "--minAvgQual", "10", "--out", str(out)]) == 0
    names = {l.split()[0] for l in open(out)}
    assert any(n.startswith("m/0") for n in names)
    assert not any(n.startswith("m/1") for n in names)


def test_cigar_use_seq_match(world, tmp_path):
    """--cigarUseSeqMatch emits '='/'X' instead of 'M', and every '='
    column really matches the reference while every 'X' differs
    (SAMPrinter seq-match mode, RegisterBlasrOptions.h)."""
    import re
    d, contigs = world
    out = tmp_path / "o.sam"
    assert run([str(d / "reads.fa"), str(d / "genome.fa"), "--sam",
                "--cigarUseSeqMatch", "--clipping", "soft",
                "--out", str(out)]) == 0
    genome = {c.name: "".join("ACGTN"[b] for b in c.seq) for c in contigs}
    recs = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert recs
    strands = set()
    for f in recs:
        cig = f[5]
        assert "M" not in cig, cig
        strands.add(int(f[1]) & 16)
        ref = genome[f[2]]
        qi, ti = 0, int(f[3]) - 1
        seq = f[9]
        for n, op in re.findall(r"(\d+)([=XIDS])", cig):
            n = int(n)
            if op == "=":
                assert seq[qi:qi + n] == ref[ti:ti + n], (f[0], qi, ti)
                qi += n
                ti += n
            elif op == "X":
                assert all(seq[qi + j] != ref[ti + j] for j in range(n))
                qi += n
                ti += n
            elif op in "IS":
                qi += n
            else:
                ti += n
        assert qi == len(seq)
    assert strands == {0, 16}  # both strands exercised


def test_unaligned_listing(world, tmp_path):
    """--unaligned lists reads with no reported alignment; with
    --noPrintUnalignedSeqs names only (PrintUnaligned,
    BlasrUtilsImpl.hpp:1098-1114; ctest/unaligned.t)."""
    d, contigs = world
    rng = np.random.default_rng(99)
    junk = rng.integers(0, 4, 400).astype(np.int8)  # random, unmappable
    g = contigs[0].seq
    recs = [FastaRecord("m/0/0_400", g[5000:5400].copy()),
            FastaRecord("m/1/0_400", junk)]
    rd = tmp_path / "mix.fa"
    write_fasta(rd, recs)
    out = tmp_path / "o.m4"
    un = tmp_path / "un.txt"
    assert run([str(rd), str(d / "genome.fa"), "-m", "4",
                "--out", str(out), "--unaligned", str(un)]) == 0
    mapped = {l.split()[0] for l in open(out)}
    body = un.read_text()
    assert "m/1/0_400" in body and "m/1/0_400" not in mapped
    assert "m/0/0_400" not in body
    assert body.startswith(">")  # sequence printed by default
    assert run([str(rd), str(d / "genome.fa"), "-m", "4",
                "--out", str(out), "--unaligned", str(un),
                "--noPrintUnalignedSeqs"]) == 0
    assert un.read_text() == "m/1/0_400\n"


def test_fofn_input_and_stride_shards(world, tmp_path):
    """FOFN input maps the concatenation of its files; --start/--stride
    shards partition the read set exactly (ctest/fofn.t; ReaderAgglomerate
    startRead/stride, Blasr.cpp:1270)."""
    d, contigs = world
    full = tmp_path / "full.m4"
    assert run([str(d / "reads.fa"), str(d / "genome.fa"), "-m", "4",
                "--out", str(full)]) == 0
    want = sorted(open(full).read().splitlines())
    assert want
    # split reads across two files named by a fofn
    recs = list(_read_fasta_records(d / "reads.fa"))
    write_fasta(tmp_path / "a.fa", recs[:3])
    write_fasta(tmp_path / "b.fa", recs[3:])
    fofn = tmp_path / "reads.fofn"
    fofn.write_text(f"{tmp_path}/a.fa\n{tmp_path}/b.fa\n")
    out = tmp_path / "fofn.m4"
    assert run([str(fofn), str(d / "genome.fa"), "-m", "4",
                "--out", str(out)]) == 0
    assert sorted(open(out).read().splitlines()) == want
    # stride shards partition the fofn-expanded read list
    got = []
    for s in (0, 1):
        o = tmp_path / f"shard{s}.m4"
        assert run([str(fofn), str(d / "genome.fa"), "-m", "4",
                    "--start", str(s), "--stride", "2",
                    "--out", str(o)]) == 0
        got += open(o).read().splitlines()
    assert sorted(got) == want


def _read_fasta_records(path):
    from blasr_tpu.io.fasta import read_fasta
    return read_fasta(str(path))


def test_samqv_subset_tags(world, tmp_path):
    """--samQV restricts printed QV tags to the named tracks and implies
    --printSAMQV (samQVList.UseQV, MappingParameters.h:666-670)."""
    from blasr_tpu.io.bam import BamWriter
    from blasr_tpu.io.hdf import write_bax, ZmwRead
    d, contigs = world
    rng = np.random.default_rng(5)
    g = contigs[0].seq
    seq = g[2000:2500].copy()
    tracks = {n: rng.integers(5, 40, len(seq)).astype(np.uint8)
              for n in ("QualityValue", "InsertionQV", "DeletionQV",
                        "SubstitutionQV")}
    bx = tmp_path / "m1.bax.h5"
    regions = [[7, 1, 0, len(seq), 900], [7, 2, 0, len(seq), 900]]
    write_bax(str(bx), "m1", [ZmwRead(7, seq, tracks)],
              np.asarray(regions, np.int32))
    out_all = tmp_path / "all.sam"
    out_sub = tmp_path / "sub.sam"
    assert run([str(bx), str(d / "genome.fa"), "--sam", "--printSAMQV",
                "--minReadLength", "50", "--out", str(out_all)]) == 0
    assert run([str(bx), str(d / "genome.fa"), "--sam",
                "--samQV", "InsertionQV",
                "--minReadLength", "50", "--out", str(out_sub)]) == 0
    rec_all = [l for l in open(out_all) if not l.startswith("@")][0]
    rec_sub = [l for l in open(out_sub) if not l.startswith("@")][0]
    assert "iq:Z:" in rec_all and "dq:Z:" in rec_all
    assert "iq:Z:" in rec_sub and "dq:Z:" not in rec_sub


def test_open_fail_warns_and_continues(world, tmp_path, capsys):
    """An unopenable input file warns and processing continues with the
    remaining files (Blasr.cpp:1352-1355, ctest/open_fail.t)."""
    d, contigs = world
    fofn = tmp_path / "in.fofn"
    fofn.write_text(f"{tmp_path}/no_such_reads.fa\n{d}/reads.fa\n")
    out = tmp_path / "out.m4"
    assert run([str(fofn), str(d / "genome.fa"), "-m", "4",
                "--out", str(out)]) == 0
    err = capsys.readouterr().err
    assert "WARNING: Could not open" in err
    assert "no_such_reads.fa" in err
    assert open(out).read().strip()  # the good file still mapped


def test_score_type_1_reports_qv_sum_score(tmp_path):
    """--scoreType 1 + --useQuality reports the QV DP score itself
    (alignment.sumQVScore, BlasrAlignImpl.hpp:1306-1308) while the
    alignments (positions, CIGAR-bearing fields) stay those of the same
    QV-chosen path as --scoreType 0."""
    import sys
    sys.path.insert(0, "tests")
    from test_golden import make_qvsteer
    reads, genome, extra = make_qvsteer(str(tmp_path))
    out0 = tmp_path / "t0.m4"
    out1 = tmp_path / "t1.m4"
    assert run([reads, genome, "-m", "4", "--useQuality",
                "--out", str(out0)]) == 0
    assert run([reads, genome, "-m", "4", "--useQuality", "--scoreType",
                "1", "--out", str(out1)]) == 0
    l0 = [l.split() for l in open(out0)]
    l1 = [l.split() for l in open(out1)]
    assert len(l0) == len(l1) == 2
    for a, b in zip(l0, l1):
        assert a[0] == b[0] and a[9:12] == b[9:12]  # same placements
        assert int(float(a[2])) != int(float(b[2]))  # different score fn
    # bad values still fail loudly
    assert run([reads, genome, "-m", "4", "--scoreType", "2",
                "--out", str(tmp_path / "x.m4")]) == 1
