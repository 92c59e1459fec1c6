"""One-gap alignment (reference OneGapAlignment role, --onegap;
BlasrAlignImpl.hpp:892-896): collinear hits across a large target gap are
joined into one alignment with a single 'N' skip run."""

import numpy as np

from blasr_tpu.io.fasta import FastaRecord, write_fasta
from blasr_tpu.params import MappingParams
from blasr_tpu.pipeline.map_read import Alignment
from blasr_tpu.pipeline.onegap import join_one_gap
from blasr_tpu.sim import random_genome


def mk(qs, qe, ts, te, strand=0, qlen=400):
    return Alignment("r", qlen, qs, qe, strand, 0, "c", 100_000, ts, te,
                     -5 * (qe - qs), qe - qs, 0, 0, 0,
                     cigar=[("M", qe - qs)])


def test_join_collinear_pair():
    p = MappingParams().make_sane()
    a = mk(0, 200, 1000, 1200)
    b = mk(200, 400, 6200, 6400)
    out = join_one_gap([a, b], p)
    assert len(out) == 1
    j = out[0]
    assert (j.qstart, j.qend, j.tstart, j.tend) == (0, 400, 1000, 6400)
    ops = dict((op, n) for op, n in j.cigar)
    assert ops["N"] == 5000
    assert j.n_del == 0           # the skip is not priced as deletions
    # query/target consumption invariants
    qc = sum(n for op, n in j.cigar if op in "MI=X")
    tc = sum(n for op, n in j.cigar if op in "MDN=X")
    assert qc == 400 and tc == 5400


def test_no_join_when_not_collinear():
    p = MappingParams().make_sane()
    a = mk(0, 200, 1000, 1200)
    b = mk(100, 300, 6200, 6400)     # query overlaps: not a one-gap pair
    assert len(join_one_gap([a, b], p)) == 2
    c = mk(200, 400, 900, 1100)      # target goes backward
    assert len(join_one_gap([a, c], p)) == 2


def test_cli_onegap_spliced_read(tmp_path):
    from blasr_tpu.cli.blasr import run
    contigs = random_genome(60_000, seed=201)
    g = contigs[0].seq
    # a read spanning a 4 kb "intron": 300 bp + 300 bp from distant loci
    read = np.concatenate([g[10_000:10_300], g[14_300:14_600]])
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa", [FastaRecord("spliced/1/0_600", read)])
    out = tmp_path / "out.sam"
    assert run([str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "--sam",
                "--onegap", "--bestn", "2", "--hitPolicy", "all",
                "--out", str(out)]) == 0
    recs = [l for l in open(out) if not l.startswith("@")]
    joined = [l for l in recs if "N" in l.split("\t")[5]]
    assert joined, recs
    cig = joined[0].split("\t")[5]
    assert "4000N" in cig


def test_join_reverse_strand_pair():
    """RC pairs join too (oriented-coordinate merge): a reverse-strand
    spliced hit produces one alignment with an 'N' run."""
    p = MappingParams().make_sane()
    # oriented query: piece at larger t has larger oriented q
    # strand 1: qo = qlen - qend, so the t-early piece must have high qend
    a = mk(200, 400, 1000, 1200, strand=1)   # qo = 0..200
    b = mk(0, 200, 6200, 6400, strand=1)     # qo = 200..400
    out = join_one_gap([a, b], p)
    assert len(out) == 1
    j = out[0]
    assert (j.qstart, j.qend, j.tstart, j.tend) == (0, 400, 1000, 6400)
    ops = dict((op, n) for op, n in j.cigar)
    assert ops["N"] == 5000


def test_cli_onegap_spliced_read_rc(tmp_path):
    from blasr_tpu.cli.blasr import run
    from blasr_tpu.io.fasta import revcomp
    contigs = random_genome(60_000, seed=202)
    g = contigs[0].seq
    read = revcomp(np.concatenate([g[10_000:10_300], g[14_300:14_600]]))
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa", [FastaRecord("splicedrc/1/0_600", read)])
    out = tmp_path / "out.sam"
    assert run([str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "--sam",
                "--onegap", "--bestn", "2", "--hitPolicy", "all",
                "--out", str(out)]) == 0
    recs = [l for l in open(out) if not l.startswith("@")]
    joined = [l for l in recs if "N" in l.split("\t")[5]]
    assert joined, recs
    assert "4000N" in joined[0].split("\t")[5]
