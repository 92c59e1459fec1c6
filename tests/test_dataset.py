"""DataSet XML input with filters (PBDATASET file type,
MappingParameters.h:406-415; filter semantics per ctest/dataset.t)."""

import numpy as np

from blasr_tpu.io.dataset import DatasetFilter, parse_dataset, read_dataset
from blasr_tpu.io.fasta import FastaRecord, read_sequences, write_fasta
from blasr_tpu.sim import random_genome, simulate_reads

XML = """<?xml version="1.0" encoding="utf-8"?>
<pbds:SubreadSet xmlns:pbbase="http://pacificbiosciences.com/PacBioBaseDataModel.xsd"
  xmlns:pbds="http://pacificbiosciences.com/PacBioDatasets.xsd">
  <pbbase:ExternalResources>
    <pbbase:ExternalResource ResourceId="{res}"/>
  </pbbase:ExternalResources>
  <pbds:Filters>
    <pbds:Filter>
      <pbbase:Properties>
        {props}
      </pbbase:Properties>
    </pbds:Filter>
  </pbds:Filters>
</pbds:SubreadSet>
"""


def make_reads(tmp_path):
    rng = np.random.default_rng(101)
    recs = [FastaRecord(f"movie/{h}/0_{n}",
                        rng.integers(0, 4, n).astype(np.int8))
            for h, n in [(1, 100), (2, 300), (5, 500), (9, 250)]]
    write_fasta(tmp_path / "reads.fa", recs)
    return recs


def test_zm_set_filter(tmp_path):
    make_reads(tmp_path)
    xml = tmp_path / "ds.subreadset.xml"
    xml.write_text(XML.format(
        res="reads.fa",
        props='<pbbase:Property Name="zm" Value="[1,5]" Operator="=="/>'))
    recs = read_dataset(str(xml))
    assert sorted(r.name.split("/")[1] for r in recs) == ["1", "5"]


def test_length_filter_and_sniff(tmp_path):
    make_reads(tmp_path)
    xml = tmp_path / "ds.subreadset.xml"
    xml.write_text(XML.format(
        res="reads.fa",
        props='<pbbase:Property Name="length" Value="250" Operator="&gt;="/>'))
    recs = read_sequences(str(xml))   # via format sniffing
    assert sorted(len(r.seq) for r in recs) == [250, 300, 500]


def test_zm_range_filter(tmp_path):
    make_reads(tmp_path)
    xml = tmp_path / "ds.subreadset.xml"
    xml.write_text(XML.format(
        res="reads.fa",
        props='<pbbase:Property Name="zm" Value="[2-9]" Operator="=="/>'))
    recs = read_dataset(str(xml))
    assert sorted(int(r.name.split("/")[1]) for r in recs) == [2, 5, 9]


def test_blasr_maps_dataset(tmp_path):
    from blasr_tpu.cli.blasr import run
    contigs = random_genome(40_000, seed=103)
    sims = simulate_reads(contigs, 6, read_len=(200, 400), accuracy=0.9,
                          seed=104)
    recs = [FastaRecord(f"m/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    write_fasta(tmp_path / "r.fa", recs)
    write_fasta(tmp_path / "g.fa", contigs)
    xml = tmp_path / "in.subreadset.xml"
    xml.write_text(XML.format(
        res="r.fa",
        props='<pbbase:Property Name="zm" Value="[0-2]" Operator="=="/>'))
    assert run([str(xml), str(tmp_path / "g.fa"), "-m", "4",
                "--out", str(tmp_path / "out.m4")]) == 0
    lines = open(tmp_path / "out.m4").read().strip().splitlines()
    holes = {int(l.split()[0].split("/")[1]) for l in lines}
    assert holes <= {0, 1, 2} and len(lines) >= 2
