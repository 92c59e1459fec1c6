"""Cram-style golden-output regression tests.

The reference's whole test strategy is golden-file diffs of real runs
(SURVEY.md §4: ctest/*.t compare dated golden outputs exactly).  Here a
fixed-seed synthetic workload is mapped through the real CLI and the
outputs diffed byte-for-byte against checked-in goldens
(tests/golden/*) — the bit-identical-output contract across refactors.

Regenerate (only when an intentional behavior change is reviewed):
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = [
    ("m4", ["-m", "4"]),
    ("m1", ["-m", "1"]),
    ("m5", ["-m", "5"]),
    ("sam", ["--sam", "--clipping", "soft"]),
    ("m4.rb", ["-m", "4", "--hitPolicy", "randombest", "--randomSeed", "1"]),
    ("m4.affine", ["-m", "4", "--affineAlign", "--affineOpen", "8",
                   "--affineExtend", "1"]),
]


def make_world(d):
    from blasr_tpu.io.fasta import FastaRecord, write_fasta
    from blasr_tpu.sim import random_genome, simulate_reads
    contigs = random_genome(60_000, seed=777, n_contigs=2)
    sims = simulate_reads(contigs, 12, read_len=(250, 900), accuracy=0.87,
                          seed=778)
    recs = [FastaRecord(f"movie/{i}/0_{len(s.rec.seq)}", s.rec.seq)
            for i, s in enumerate(sims)]
    write_fasta(os.path.join(d, "genome.fa"), contigs)
    write_fasta(os.path.join(d, "reads.fa"), recs)


def run_case(d, name, flags):
    from blasr_tpu.cli.blasr import run
    out = os.path.join(d, f"out.{name}")
    assert run([os.path.join(d, "reads.fa"), os.path.join(d, "genome.fa"),
                "--out", out] + flags) == 0
    text = open(out).read()
    if name == "sam":
        # drop the @PG line (embeds the command line / output path)
        text = "\n".join(l for l in text.splitlines()
                         if not l.startswith("@PG")) + "\n"
    return text


@pytest.mark.parametrize("name,flags", CASES)
def test_golden(tmp_path, name, flags):
    golden = os.path.join(GOLDEN_DIR, f"golden.{name}")
    if not os.path.exists(golden):
        pytest.skip("golden missing; run: python tests/test_golden.py regen")
    make_world(str(tmp_path))
    got = run_case(str(tmp_path), name, flags)
    want = open(golden).read()
    assert got == want, f"output for {name} differs from {golden}"


def regen():
    import tempfile
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as d:
        make_world(d)
        for name, flags in CASES:
            text = run_case(d, name, flags)
            with open(os.path.join(GOLDEN_DIR, f"golden.{name}"), "w") as f:
                f.write(text)
            print(f"wrote golden.{name} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax
        jax.config.update("jax_platforms", "cpu")
        regen()
