"""Multi-host sharding + deterministic merge (SURVEY.md §2.9: data
parallel across nodes via --start/--stride analog; deterministic merged
output regardless of host count)."""

import os

import numpy as np
import pytest

from blasr_tpu.dist.multihost import merge_outputs, shard_path, shard_reads
from blasr_tpu.io.fasta import write_fasta
from blasr_tpu.sim import random_genome, simulate_reads


def test_shard_reads_partitions():
    all_idx = sorted(
        i for h in range(3) for i in shard_reads(20, h, 3))
    assert all_idx == list(range(20))
    # composed with stride
    s0 = shard_reads(20, 0, 2, start=1, stride=2)
    s1 = shard_reads(20, 1, 2, start=1, stride=2)
    assert sorted(s0 + s1) == list(range(1, 20, 2))
    assert not (set(s0) & set(s1))


def test_two_host_merge_equals_single_host(tmp_path):
    from blasr_tpu.cli.blasr import run
    contigs = random_genome(50_000, seed=91)
    sims = simulate_reads(contigs, 10, read_len=(200, 500), accuracy=0.9,
                          seed=92)
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa", [s.rec for s in sims])
    base = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4",
            "--hitPolicy", "randombest", "--randomSeed", "1"]

    single = tmp_path / "single.m4"
    assert run(base + ["--out", str(single)]) == 0

    merged = tmp_path / "merged.m4"
    try:
        os.environ["BLASR_TPU_NUM_HOSTS"] = "2"
        for h in range(2):
            os.environ["BLASR_TPU_HOST_ID"] = str(h)
            assert run(base + ["--out", str(merged)]) == 0
    finally:
        os.environ.pop("BLASR_TPU_NUM_HOSTS", None)
        os.environ.pop("BLASR_TPU_HOST_ID", None)
    merge_outputs(str(merged), 2, [])
    assert open(merged).read() == open(single).read()
    assert not os.path.exists(shard_path(str(merged), 0, 2))


def test_run_sharded_merges_automatically(tmp_path, monkeypatch):
    """run_sharded: host 0 merges the per-host parts after the sentinel
    barrier — no manual merge_outputs call needed."""
    from blasr_tpu.dist.multihost import run_sharded
    contigs = random_genome(50_000, seed=93)
    sims = simulate_reads(contigs, 8, read_len=(200, 500), accuracy=0.9,
                          seed=94)
    write_fasta(tmp_path / "g.fa", contigs)
    write_fasta(tmp_path / "r.fa", [s.rec for s in sims])
    from blasr_tpu.cli.blasr import run
    single = tmp_path / "single.m4"
    args1 = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4",
             "--out", str(single)]
    monkeypatch.setenv("BLASR_TPU_NUM_HOSTS", "1")
    monkeypatch.setenv("BLASR_TPU_HOST_ID", "0")
    assert run(args1) == 0

    merged = tmp_path / "merged.m4"
    args2 = [str(tmp_path / "r.fa"), str(tmp_path / "g.fa"), "-m", "4",
             "--out", str(merged)]
    monkeypatch.setenv("BLASR_TPU_NUM_HOSTS", "2")
    # host 1 first (writes its part + sentinel), then host 0 merges
    monkeypatch.setenv("BLASR_TPU_HOST_ID", "1")
    assert run_sharded(list(args2)) == 0
    monkeypatch.setenv("BLASR_TPU_HOST_ID", "0")
    assert run_sharded(list(args2), barrier_timeout=30) == 0
    assert merged.exists()
    assert merged.read_text() == single.read_text()
    # parts and sentinels cleaned up
    assert not list(tmp_path.glob("merged.m4.host*"))
