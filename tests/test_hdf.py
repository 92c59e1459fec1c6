"""HDF5 tool-chain tests: bax.h5 read/write, region-table subread
extraction, pls2fasta, bax2bam/bam2bax roundtrip, samtoh5 + loadPulses +
cmpH5StoreQualityByContext (reference utils/PulseToFasta.cpp, bax2bam/,
bam2bax/, SamToCmpH5.cpp, LoadPulses.cpp, CmpH5StoreQualityByContext)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from blasr_tpu.io.fasta import write_fasta
from blasr_tpu.io.hdf import (REGION_TYPES, BaxReader, RegionTable, ZmwRead,
                              write_bax)
from blasr_tpu.sim import random_genome, simulate_reads

INS = REGION_TYPES.index("Insert")
HQ = REGION_TYPES.index("HQRegion")


@pytest.fixture(scope="module")
def bax_world(tmp_path_factory):
    """A movie with 3 ZMWs whose inserts come from a genome."""
    d = tmp_path_factory.mktemp("bax")
    contigs = random_genome(30_000, seed=71)
    sims = simulate_reads(contigs, 6, read_len=(200, 400), accuracy=0.9,
                          seed=72)
    rng = np.random.default_rng(73)
    zmws, regions = [], []
    si = 0
    for hole in (9, 17, 23):
        # polymerase read = junk + insert + adapter + insert + junk
        parts, rows = [], []
        pos = 0
        parts.append(rng.integers(0, 4, 50).astype(np.int8))
        pos += 50
        for _ in range(2):
            ins = sims[si].rec.seq
            si += 1
            rows.append([hole, INS, pos, pos + len(ins), -1])
            parts.append(ins)
            pos += len(ins)
            parts.append(rng.integers(0, 4, 45).astype(np.int8))  # adapter
            pos += 45
        seq = np.concatenate(parts)
        hq_start, hq_end = 30, len(seq) - 20
        rows.append([hole, HQ, hq_start, hq_end, 850])
        tracks = {
            "QualityValue": rng.integers(10, 40, len(seq)).astype(np.uint8),
            "InsertionQV": rng.integers(5, 30, len(seq)).astype(np.uint8),
            "DeletionQV": rng.integers(5, 30, len(seq)).astype(np.uint8),
            "SubstitutionQV": rng.integers(5, 30, len(seq)).astype(np.uint8),
            "PreBaseFrames": rng.integers(
                0, 400, len(seq)).astype(np.uint16),
            "WidthInFrames": rng.integers(
                1, 300, len(seq)).astype(np.uint16),
            "MidSignal": rng.integers(100, 900, len(seq)).astype(np.uint16),
        }
        zmws.append(ZmwRead(hole, seq, tracks))
        regions.extend(rows)
    path = d / "movie1.bax.h5"
    write_bax(str(path), "m000001", zmws, np.asarray(regions, np.int32))
    write_fasta(d / "genome.fa", contigs)
    return d, path, contigs, zmws


def test_bax_roundtrip_and_regions(bax_world):
    d, path, contigs, zmws = bax_world
    rdr = BaxReader(str(path))
    assert rdr.movie == "m000001"
    assert list(rdr.holes) == [9, 17, 23]
    z = rdr.read_zmw(0)
    np.testing.assert_array_equal(z.seq, zmws[0].seq)
    np.testing.assert_array_equal(z.tracks["QualityValue"],
                                  zmws[0].tracks["QualityValue"])
    subs = rdr.subreads()
    assert len(subs) == 6  # 2 inserts x 3 holes, all inside HQ
    for s in subs:
        movie, hole, span = s.name.split("/")
        a, b = (int(x) for x in span.split("_"))
        assert b - a == len(s.seq)
        assert s.qual is not None
    # HQ clipping: an insert outside HQ is dropped
    rt = rdr.region_table
    assert rt.subread_intervals(9, min_score=900) == []  # score gate
    rdr.close()


def test_blasr_maps_bax_input(bax_world, tmp_path):
    from blasr_tpu.cli.blasr import run
    d, path, contigs, zmws = bax_world
    out = tmp_path / "out.m4"
    assert run([str(path), str(d / "genome.fa"), "-m", "4",
                "--minReadLength", "50", "--out", str(out)]) == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) >= 5
    assert all(l.split()[0].startswith("m000001/") for l in lines)


def test_multipart_bas_expansion(bax_world, tmp_path):
    """A new-style bas.h5 with /MultiPart/Parts (and no /PulseData) maps
    the union of its bax.h5 parts (ctest/multipart.t)."""
    import h5py

    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.hdf import expand_multipart
    d, path, contigs, zmws = bax_world
    bas = tmp_path / "movie1.bas.h5"
    with h5py.File(bas, "w") as f:
        f.create_dataset("MultiPart/Parts",
                         data=np.array([str(path).encode()]))
    assert expand_multipart(str(bas)) == [str(path)]
    assert expand_multipart(str(path)) == [str(path)]  # not multipart
    out_bas = tmp_path / "bas.m4"
    out_bax = tmp_path / "bax.m4"
    assert run([str(bas), str(d / "genome.fa"), "-m", "4",
                "--minReadLength", "50", "--out", str(out_bas)]) == 0
    assert run([str(path), str(d / "genome.fa"), "-m", "4",
                "--minReadLength", "50", "--out", str(out_bax)]) == 0
    assert out_bas.read_text() == out_bax.read_text()
    # relative part names resolve against the bas.h5 directory
    rel = tmp_path / "rel.bas.h5"
    import shutil
    shutil.copy(path, tmp_path / "p1.bax.h5")
    with h5py.File(rel, "w") as f:
        f.create_dataset("MultiPart/Parts", data=np.array([b"p1.bax.h5"]))
    assert expand_multipart(str(rel)) == [str(tmp_path / "p1.bax.h5")]


def test_min_raw_subread_score_gate(bax_world, tmp_path):
    """--minRawSubreadScore drops every subread of a ZMW whose HQ-region
    score falls below the threshold (bug25766.t contract; the gate is
    IsGoodRead, Blasr.cpp:56-85).  The fixture's HQ score is 850."""
    from blasr_tpu.cli.blasr import run
    d, path, contigs, zmws = bax_world
    keep = tmp_path / "keep.m4"
    drop = tmp_path / "drop.m4"
    assert run([str(path), str(d / "genome.fa"), "-m", "4",
                "--minReadLength", "50", "--minRawSubreadScore", "700",
                "--out", str(keep)]) == 0
    assert run([str(path), str(d / "genome.fa"), "-m", "4",
                "--minReadLength", "50", "--minRawSubreadScore", "900",
                "--out", str(drop)]) == 0
    assert len(open(keep).read().strip().splitlines()) >= 5
    assert open(drop).read().strip() == ""


def test_pls2fasta(bax_world, tmp_path):
    from blasr_tpu.cli.pls2fasta import run
    d, path, contigs, zmws = bax_world
    out = tmp_path / "reads.fq"
    assert run([str(path), str(out), "-trimByRegion", "-fastq"]) == 0
    text = open(out).read().splitlines()
    assert len(text) == 4 * 6
    assert text[0].startswith("@m000001/9/")
    # holeNumber filter
    out2 = tmp_path / "r2.fa"
    assert run([str(path), str(out2), "-trimByRegion",
                "-holeNumber", "17"]) == 0
    names = [l for l in open(out2) if l.startswith(">")]
    assert len(names) == 2 and all("/17/" in n for n in names)


def test_bax2bam_bam2bax_roundtrip(bax_world, tmp_path):
    from blasr_tpu.cli.bam2bax import run as b2x
    from blasr_tpu.cli.bax2bam import run as x2b
    d, path, contigs, zmws = bax_world
    pre = str(tmp_path / "rt")
    assert x2b([str(path), "-o", pre]) == 0
    from blasr_tpu.io.bam import read_bam
    _, _, _, recs = read_bam(pre + ".subreads.bam")
    assert len(recs) == 6
    assert all(r.flag == 4 for r in recs)
    assert all("iq" in r.tags and "dq" in r.tags for r in recs)
    assert b2x([pre + ".subreads.bam", "-o", pre]) == 0
    rdr = BaxReader(pre + ".bax.h5")
    subs = rdr.subreads()
    assert len(subs) == 6
    orig = BaxReader(str(path)).subreads()
    for a, b in zip(sorted(subs, key=lambda r: r.name),
                    sorted(orig, key=lambda r: r.name)):
        assert a.name == b.name
        np.testing.assert_array_equal(a.seq, b.seq)
    rdr.close()


def test_samtoh5_loadpulses_context(bax_world, tmp_path):
    from blasr_tpu.cli.blasr import run as blasr_run
    from blasr_tpu.cli.cmph5_store_quality_by_context import run as ctx_run
    from blasr_tpu.cli.load_pulses import run as lp_run
    from blasr_tpu.cli.sam_to_h5 import run as s2h_run
    d, path, contigs, zmws = bax_world
    sam = tmp_path / "out.sam"
    assert blasr_run([str(path), str(d / "genome.fa"), "--sam",
                      "--clipping", "soft", "--minReadLength", "50",
                      "--out", str(sam)]) == 0
    cmp_path = tmp_path / "aln.cmp.h5"
    assert s2h_run([str(sam), str(d / "genome.fa"), str(cmp_path),
                    "-smrtTitle"]) == 0
    with h5py.File(cmp_path, "r") as h5:
        idx = np.asarray(h5["AlnInfo/AlnIndex"])
        assert idx.shape[0] >= 5 and idx.shape[1] == 22
        assert "RefGroup/Path" in h5
    assert lp_run([str(path), str(cmp_path)]) == 0
    with h5py.File(cmp_path, "r") as h5:
        paths = [p.decode() for p in h5["AlnGroup/Path"]]
        assert any(p + "/QualityValue" in h5 for p in paths)
    table = tmp_path / "ctx.txt"
    assert ctx_run([str(cmp_path), str(table)]) == 0
    lines = open(table).read().strip().splitlines()
    assert lines[0] == "context meanQV count"
    assert len(lines) > 10
    ctx, mean, cnt = lines[1].split()
    assert len(ctx) == 3 and 0 <= float(mean) <= 93


def test_load_pulses_pulse_metrics(bax_world, tmp_path):
    """loadPulses full metric breadth (utils/LoadPulses.cpp:141-171):
    frame/pulse metrics (PulseWidth, IPD, StartFrame, pkmid) load with
    their native dtypes; unsupported metric names fail loudly."""
    import h5py
    from blasr_tpu.cli.blasr import run as blasr_run
    from blasr_tpu.cli.load_pulses import run as lp_run
    from blasr_tpu.cli.sam_to_h5 import run as s2h_run
    d, path, contigs, zmws = bax_world
    sam = tmp_path / "out.sam"
    assert blasr_run([str(path), str(d / "genome.fa"), "--sam",
                      "--clipping", "soft", "--minReadLength", "50",
                      "--out", str(sam)]) == 0
    cmp_path = tmp_path / "aln2.cmp.h5"
    assert s2h_run([str(sam), str(d / "genome.fa"), str(cmp_path),
                    "-smrtTitle"]) == 0
    metrics = "QualityValue,PulseWidth,IPD,StartFrame,pkmid,WidthInFrames"
    assert lp_run([str(path), str(cmp_path), "-metrics", metrics]) == 0
    with h5py.File(cmp_path, "r") as h5:
        paths = [p.decode() for p in h5["AlnGroup/Path"]]
        g = next(p for p in paths if p + "/PulseWidth" in h5)
        pw = np.asarray(h5[g + "/PulseWidth"])
        ipd = np.asarray(h5[g + "/IPD"])
        sf = np.asarray(h5[g + "/StartFrame"])
        pk = np.asarray(h5[g + "/pkmid"])
        assert pw.dtype == np.uint16 and ipd.dtype == np.uint16
        assert sf.dtype == np.uint32 and pk.dtype == np.uint16
        assert pw.max() > 0 and pk.max() >= 100
        # StartFrame is cumulative -> larger than per-base widths
        assert sf.max() > pw.max()
        # PulseWidth mirrors WidthInFrames
        np.testing.assert_array_equal(
            pw, np.asarray(h5[g + "/WidthInFrames"]))
    # unsupported metric -> loud failure
    assert lp_run([str(path), str(cmp_path),
                   "-metrics", "NotAMetric"]) == 1


def test_bax2bam_scraps_full_roundtrip(tmp_path):
    """Subread mode emits subreads + scraps (adapter sc:A, LQ sc:L) with
    PacBio RG conventions; bam2bax over BOTH files reconstructs the full
    polymerase read, the Adapter rows and the HQ region (reference
    bax2bam SubreadConverter + scraps contract)."""
    import hashlib

    from blasr_tpu.cli.bam2bax import run as b2x
    from blasr_tpu.cli.bax2bam import run as x2b
    from blasr_tpu.io.bam import read_bam

    ADA = REGION_TYPES.index("Adapter")
    rng = np.random.default_rng(81)
    hole = 12
    ins1 = rng.integers(0, 4, 180).astype(np.int8)
    ins2 = rng.integers(0, 4, 220).astype(np.int8)
    adapter = rng.integers(0, 4, 45).astype(np.int8)
    lq_head = rng.integers(0, 4, 30).astype(np.int8)
    lq_tail = rng.integers(0, 4, 25).astype(np.int8)
    seq = np.concatenate([lq_head, ins1, adapter, ins2, lq_tail])
    n = len(seq)
    a0 = 30 + 180
    rows = [
        [hole, INS, 30, a0, -1],
        [hole, ADA, a0, a0 + 45, -1],
        [hole, INS, a0 + 45, a0 + 45 + 220, -1],
        [hole, HQ, 30, n - 25, 760],
    ]
    tracks = {
        "QualityValue": rng.integers(10, 40, n).astype(np.uint8),
        "InsertionQV": rng.integers(5, 30, n).astype(np.uint8),
        "DeletionTag": np.full(n, ord("N"), np.uint8),
    }
    path = tmp_path / "m_scr.bax.h5"
    write_bax(str(path), "m_scr", [ZmwRead(hole, seq, tracks)],
              np.asarray(rows, np.int32))
    pre = str(tmp_path / "rt")
    assert x2b([str(path), "-o", pre]) == 0
    hdr_s, _, _, subs = read_bam(pre + ".subreads.bam")
    hdr_c, _, _, scraps = read_bam(pre + ".scraps.bam")
    # RG convention: md5("movie//READTYPE")[:8]
    want_rg = hashlib.md5(b"m_scr//SUBREAD").hexdigest()[:8]
    assert f"ID:{want_rg}" in hdr_s and "PU:m_scr" in hdr_s
    assert "READTYPE=SUBREAD" in hdr_s and "READTYPE=SCRAP" in hdr_c
    assert "InsertionQV=iq" in hdr_s
    assert len(subs) == 2
    # the subread after the adapter carries ADAPTER_BEFORE, the one
    # before it ADAPTER_AFTER
    cx = {r.tags["qs"]: r.tags["cx"] for r in subs}
    assert cx[30] == 2 and cx[a0 + 45] == 1
    assert all(abs(float(r.tags["rq"]) - 0.76) < 1e-6 for r in subs)
    kinds = sorted(r.tags["sc"] for r in scraps)
    assert kinds == ["A", "L", "L"]
    # full-read reconstruction from subreads + scraps
    assert b2x([pre + ".subreads.bam", pre + ".scraps.bam",
                "-o", pre]) == 0
    rdr = BaxReader(pre + ".bax.h5")
    z = rdr.read_zmw(0)
    np.testing.assert_array_equal(z.seq, seq)
    np.testing.assert_array_equal(z.tracks["QualityValue"],
                                  tracks["QualityValue"])
    rt = rdr.region_table
    assert rt.hq_region(hole) == (30, n - 25, 760)
    arows = rt.for_hole(hole)
    arows = arows[arows[:, 1] == rt.types.index("Adapter")]
    assert [int(arows[0, 2]), int(arows[0, 3])] == [a0, a0 + 45]
    assert rt.subread_intervals(hole) == [(30, a0), (a0 + 45, n - 25)]
    rdr.close()
