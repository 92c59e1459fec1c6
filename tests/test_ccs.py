"""CCS modes with ccs.h5 Passes (CCSIterator / FragmentCCSIterator role,
Blasr.cpp:550-729): consensus read maps as template; subread passes
re-align to the template windows; useccs keeps only adapter-bounded
(full) passes, useccsall keeps every pass."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from blasr_tpu.io.fasta import revcomp, write_fasta
from blasr_tpu.io.hdf import BaxReader, ZmwRead, write_ccs
from blasr_tpu.sim import random_genome, simulate_reads


@pytest.fixture(scope="module")
def ccs_world(tmp_path_factory):
    d = tmp_path_factory.mktemp("ccs")
    contigs = random_genome(30_000, seed=111)
    rng = np.random.default_rng(112)
    sims = simulate_reads(contigs, 2, read_len=(300, 320), accuracy=0.99,
                          seed=113)
    ccs_zmws, raw_zmws, passes = [], [], []
    for hole, s in zip((3, 8), sims):
        tmpl = s.rec.seq                       # consensus
        # polymerase read: fwd pass + adapter + rc pass + partial pass
        adapter = rng.integers(0, 4, 40).astype(np.int8)

        def noisy(x):
            y = x.copy()
            idx = rng.random(len(y)) < 0.03
            y[idx] = rng.integers(0, 4, int(idx.sum()))
            return y
        p1 = noisy(tmpl)
        p2 = revcomp(noisy(tmpl))
        p3 = noisy(tmpl[:120])                 # partial (no adapter after)
        raw = np.concatenate([p1, adapter, p2, adapter, p3])
        o1 = 0
        o2 = len(p1) + 40
        o3 = o2 + len(p2) + 40
        passes.append([
            (0, o1, len(p1), 1, 1),
            (1, o2, len(p2), 1, 1),
            (0, o3, len(p3), 1, 0),            # partial pass
        ])
        ccs_zmws.append(ZmwRead(hole, tmpl, {}))
        raw_zmws.append(ZmwRead(hole, raw, {}))
    path = d / "movie.ccs.h5"
    write_ccs(str(path), "mccs", ccs_zmws, raw_zmws, passes)
    write_fasta(d / "genome.fa", contigs)
    return d, path, contigs


def test_passes_read_back(ccs_world):
    d, path, contigs = ccs_world
    rdr = BaxReader(str(path))
    assert rdr.passes is not None and rdr.raw is not None
    all_passes = rdr.ccs_passes(0, full_only=False)
    full = rdr.ccs_passes(0, full_only=True)
    assert len(all_passes) == 3 and len(full) == 2
    groups = rdr.ccs_groups()
    assert len(groups) == 2
    ccs_rec, subs = groups[0]
    assert ccs_rec.name.endswith("/ccs")
    # reverse-direction pass comes back template-oriented: it should be
    # ~97% identical to the consensus
    same = (subs[1].seq[:300] == ccs_rec.seq[:300]).mean()
    assert same > 0.9
    rdr.close()


@pytest.mark.parametrize("flag,n_expected", [("--useccs", 2),
                                             ("--useccsall", 3)])
def test_cli_ccs_modes(ccs_world, tmp_path, flag, n_expected):
    from blasr_tpu.cli.blasr import run
    d, path, contigs = ccs_world
    out = tmp_path / f"out{flag}.m4"
    assert run([str(path), str(d / "genome.fa"), "-m", "4", flag,
                "--minReadLength", "50", "--bestn", "1",
                "--out", str(out)]) == 0
    lines = open(out).read().strip().splitlines()
    names = [l.split()[0] for l in lines]
    # both ZMWs' consensus plus their passes must align (the m4 qname
    # convention appends /qstart_qend to the title)
    ccs_hits = [n for n in names if "/ccs" in n]
    pass_hits = [n for n in names if "/ccs" not in n]
    assert len(ccs_hits) == 2
    assert len(pass_hits) >= n_expected  # per ZMW passes (>= because 2 ZMWs)


def test_cli_ccsdenovo(ccs_world, tmp_path):
    from blasr_tpu.cli.blasr import run
    d, path, contigs = ccs_world
    out = tmp_path / "denovo.m4"
    assert run([str(path), str(d / "genome.fa"), "-m", "4", "--useccsdenovo",
                "--minReadLength", "50", "--out", str(out)]) == 0
    names = [l.split()[0] for l in open(out).read().strip().splitlines()]
    # de novo mode reports only the consensus reads
    assert names and all("/" in n for n in names)
    assert len(names) >= 2
