"""On-device index derivation (DeviceIndex.from_host warm-start path)
must be bit-identical to the host-built arrays it replaces.

The derive path transfers only genome + pos_sorted and rebuilds
keys_sorted / bucket LUT / packed words / gather records on device
(map_read._derive_index); these pins guarantee the transfer optimization
can never change mapping output.
"""

import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.index.genome import build_packed_words
from blasr_tpu.pipeline.map_read import DeviceIndex
from blasr_tpu.sim import random_genome


def _host_reference(gi):
    """The pre-round-4 host construction of every derived array."""
    sentinel = np.full(1, 4, dtype=gi.genome.dtype)
    gsent = np.concatenate([sentinel, gi.genome])
    gw, gn = build_packed_words(gsent)
    out = {
        "keys_sorted": np.asarray(gi.keys_sorted),
        "pos_sorted": np.asarray(gi.pos_sorted).astype(np.int32) + 1,
        "gwords": gw,
        "gnwords": gn,
        "bucket_starts": (np.asarray(gi.bucket_starts)
                          if gi.bucket_starts is not None else None),
        "bucket_pairs": (np.stack([gi.bucket_starts[:-1],
                                   gi.bucket_starts[1:]], axis=1)
                         if gi.bucket_starts is not None
                         and gi.bucket_starts.shape[0] <= (1 << 25)
                         else None),
    }
    return gsent, out


def _check(gi):
    gsent, ref = _host_reference(gi)
    dev = DeviceIndex.from_host(gi)
    for name, want in ref.items():
        got = getattr(dev, name)
        if want is None:
            assert got is None, name
            continue
        got = np.asarray(got)
        assert got.dtype == want.dtype, (name, got.dtype, want.dtype)
        np.testing.assert_array_equal(got, want, err_msg=name)
    if gi.pos_sorted.shape[0] <= DeviceIndex.RECORDS_MAX_SLOTS:
        # records reference: built from the host arrays (old path)
        import jax.numpy as jnp
        want_rec = np.asarray(DeviceIndex._build_records(
            jnp.asarray(gsent), jnp.asarray(ref["pos_sorted"]),
            jnp.asarray(ref["gwords"]), jnp.asarray(ref["gnwords"]), gi.k))
        np.testing.assert_array_equal(
            np.asarray(dev.pos_records), want_rec, err_msg="pos_records")


def test_derive_matches_host_k12():
    # multi-contig world (N spacers between contigs exercise the invalid-
    # window masking) at the default k
    contigs = random_genome(120_000, seed=41, n_contigs=3)
    _check(build_genome_index(contigs, k=12))


def test_derive_matches_host_k8_with_ns():
    # plant explicit N runs inside a contig: keys covering them must be
    # absent from pos_sorted and the packed gnwords must flag them
    contigs = random_genome(50_000, seed=42)
    contigs[0].seq[1000:1040] = 4
    contigs[0].seq[30_000:30_005] = 4
    _check(build_genome_index(contigs, k=8))


def test_synthetic_rows_disable_derivation():
    # zmw._pad_mini_index appends sentinel (key=0xFFFFFFFF, pos=0) rows
    # that are not genome windows; from_host must fall back to host
    # transfer for such an index (the derive path would reconstruct the
    # real key at position 0 for every pad row)
    contigs = random_genome(20_000, seed=44)
    gi = build_genome_index(contigs, k=12)
    m = len(gi.keys_sorted)
    gi.keys_sorted = np.concatenate(
        [gi.keys_sorted, np.full(16, 0xFFFFFFFF, np.uint32)])
    gi.pos_sorted = np.concatenate(
        [gi.pos_sorted, np.zeros(16, gi.pos_sorted.dtype)])
    gi.synthetic_kmer_rows = True
    dev = DeviceIndex.from_host(gi)
    ks = np.asarray(dev.keys_sorted)
    assert ks.shape[0] == m + 16
    np.testing.assert_array_equal(ks[m:], np.full(16, 0xFFFFFFFF, np.uint32))


def test_derive_matches_host_k15_no_lut():
    # k > 14: no direct LUT — the searchsorted fallback consumes the
    # derived keys_sorted, which must still equal the host sort output
    contigs = random_genome(30_000, seed=43)
    gi = build_genome_index(contigs, k=15)
    assert gi.bucket_starts is None
    _check(gi)
