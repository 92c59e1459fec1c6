"""Anchor kernel vs brute-force NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from blasr_tpu.index.genome import build_kmer_index, concat_contigs
from blasr_tpu.io.fasta import encode
from blasr_tpu.kernels.anchor import find_anchors
from blasr_tpu.sim import random_genome


def brute_anchors(genome, read, k, min_match, max_per_pos=10**9, max_ext=32):
    """All (q, t, maximal-match-length >= min_match) anchors, excluding
    anchors contained in a longer same-diagonal anchor.  Lengths are capped
    at k + max_ext, matching the kernel's bounded extension."""
    out = []
    G, L = len(genome), len(read)
    for q in range(L - k + 1):
        if np.any(read[q:q + k] >= 4):
            continue
        hits = []
        for t in range(G - k + 1):
            if np.array_equal(genome[t:t + k], read[q:q + k]) and \
                    not np.any(genome[t:t + k] >= 4):
                hits.append(t)
        if not hits or len(hits) > max_per_pos:
            continue
        for t in hits:
            # containment: previous diagonal position also matches
            if q > 0 and t > 0 and genome[t - 1] == read[q - 1] and read[q - 1] < 4:
                continue
            l = k
            while l < k + max_ext and q + l < L and t + l < G \
                    and read[q + l] < 4 and genome[t + l] == read[q + l]:
                l += 1
            if l >= min_match:
                out.append((q, t, l))
    return sorted(out)


def run_find(genome, reads_list, k=8, min_match=8, **kw):
    keys_sorted, pos_sorted = build_kmer_index(genome, k)
    L = max(len(r) for r in reads_list)
    L = -(-L // 8) * 8
    B = len(reads_list)
    arr = np.full((B, L), 4, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads_list):
        arr[i, :len(r)] = r
        lens[i] = len(r)
    defaults = dict(k=k, occ_per_pos=8, max_anchors=128, anchor_ext=32,
                    min_match=min_match, max_anchors_per_pos=1000)
    defaults.update(kw)
    return find_anchors(jnp.asarray(genome), jnp.asarray(keys_sorted),
                        jnp.asarray(pos_sorted), jnp.asarray(arr),
                        jnp.asarray(lens), **defaults)


def anchors_to_set(a, row):
    out = []
    for j in range(a.q.shape[1]):
        if a.valid[row, j]:
            out.append((int(a.q[row, j]), int(a.t[row, j]), int(a.l[row, j])))
    return sorted(out)


def test_exact_read_single_hit():
    genome = encode("ACGTACGGTTCAGGACTGACGTTTGCAT")
    read = genome[5:20].copy()
    a = run_find(genome, [read], k=8, min_match=8)
    got = anchors_to_set(a, 0)
    expect = brute_anchors(genome, read, 8, 8)
    assert got == expect
    # the full-length anchor must be present
    assert (0, 5, 15) in got


@pytest.mark.parametrize("seed", [0, 1])
def test_random_reads_match_oracle(seed):
    rng = np.random.default_rng(seed)
    contigs = random_genome(800, seed=seed)
    genome, _ = concat_contigs(contigs)
    reads = []
    for i in range(3):
        s = rng.integers(0, 700)
        ln = rng.integers(40, 90)
        r = genome[s:s + ln].copy()
        # sprinkle a couple of errors
        for _ in range(2):
            p = rng.integers(0, len(r))
            r[p] = (r[p] + 1) % 4
        reads.append(r)
    a = run_find(genome, reads, k=8, min_match=10)
    for i, r in enumerate(reads):
        got = anchors_to_set(a, i)
        expect = brute_anchors(genome, r, 8, 10)
        # the kernel may additionally keep periodic representatives
        # inside long exact runs (q % (anchor_ext//2) == 0) so chains
        # can span runs longer than the extension cap
        extras = [x for x in got if x not in expect]
        assert all(q % 16 == 0 for q, _, _ in extras), extras
        assert all(x in got for x in expect), f"read {i}"


def test_min_match_filter():
    genome = encode("ACGTACGGTTCAGGACTGACGTTTGCAT")
    read = genome[5:20].copy()
    a = run_find(genome, [read], k=8, min_match=15)
    got = anchors_to_set(a, 0)
    assert all(l >= 15 for _, _, l in got)
    expect = brute_anchors(genome, read, 8, 15)
    assert got == expect


def test_max_anchors_per_pos_skips_repeats():
    # genome of pure AT repeats: every position over-abundant
    genome = encode("ATATATATATATATATATATATATATATATAT")
    read = genome[:16].copy()
    a = run_find(genome, [read], k=8, min_match=8, max_anchors_per_pos=2)
    assert anchors_to_set(a, 0) == []


def test_n_in_read_blocks_anchor():
    genome = encode("ACGTACGGTTCAGGACTGACGTTTGCAT")
    read = genome[5:20].copy()
    read[7] = 4  # N
    a = run_find(genome, [read], k=8, min_match=8)
    got = anchors_to_set(a, 0)
    expect = brute_anchors(genome, read, 8, 8)
    assert got == expect
    for q, t, l in got:
        assert not (q <= 7 < q + l)


def test_anchors_sorted_by_t():
    contigs = random_genome(500, seed=9)
    genome, _ = concat_contigs(contigs)
    read = genome[100:160].copy()
    a = run_find(genome, [read], k=8, min_match=8)
    ts = [int(a.t[0, j]) for j in range(a.q.shape[1]) if a.valid[0, j]]
    assert ts == sorted(ts)


def test_word_extension_matches_byte_path():
    """gwords-based extension must equal the byte-at-a-time path."""
    import jax.numpy as jnp
    from blasr_tpu.index.genome import build_kmer_index, build_packed_words
    rng = np.random.default_rng(5)
    contigs = random_genome(2000, seed=5)
    genome, _ = concat_contigs(contigs)
    genome[500:520] = 4  # an N block to stress N handling
    reads = []
    for i in range(4):
        s = rng.integers(0, 1800)
        r = genome[s:s + 120].copy()
        for _ in range(3):
            p = rng.integers(0, len(r))
            r[p] = (r[p] + 1) % 4
        reads.append(r)
    keys_sorted, pos_sorted = build_kmer_index(genome, 8)
    gw, gn = build_packed_words(genome)
    L = 128
    B = len(reads)
    arr = np.full((B, L), 4, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads):
        arr[i, :len(r)] = r
        lens[i] = len(r)
    kw = dict(k=8, occ_per_pos=8, max_anchors=128, anchor_ext=36,
              min_match=10, max_anchors_per_pos=1000)
    a_byte = find_anchors(jnp.asarray(genome), jnp.asarray(keys_sorted),
                          jnp.asarray(pos_sorted), jnp.asarray(arr),
                          jnp.asarray(lens), **kw)
    a_word = find_anchors(jnp.asarray(genome), jnp.asarray(keys_sorted),
                          jnp.asarray(pos_sorted), jnp.asarray(arr),
                          jnp.asarray(lens), gwords=jnp.asarray(gw),
                          gnwords=jnp.asarray(gn), **kw)
    for i in range(B):
        assert anchors_to_set(a_byte, i) == anchors_to_set(a_word, i), i


def test_occ_block_sample_identical_when_within_capacity():
    """With every seed's occurrence count <= O the rotating-window block
    gather must produce exactly the strided path's anchors (the window
    base is 0 there, and the block fetch reads the same rows)."""
    rng = np.random.default_rng(41)
    genome = rng.integers(0, 4, 4000).astype(np.int8)
    reads = [genome[s:s + 160].copy() for s in (100, 900, 2400)]
    a = run_find(genome, reads, k=10, min_match=12)
    b = run_find(genome, reads, k=10, min_match=12, occ_block_sample=True)
    for row in range(len(reads)):
        assert anchors_to_set(a, row) == anchors_to_set(b, row)
    np.testing.assert_array_equal(np.asarray(a.n_total),
                                  np.asarray(b.n_total))


def test_occ_block_sample_covers_repeat_copies():
    """On a multi-copy repeat with nocc > O, the rotating window must
    spread anchors over every copy across the read positions (the
    coverage property the strided picket provides)."""
    rng = np.random.default_rng(42)
    unit = rng.integers(0, 4, 300).astype(np.int8)
    spacer = [rng.integers(0, 4, 120).astype(np.int8) for _ in range(8)]
    parts = []
    starts = []
    pos = 0
    for i in range(8):
        parts.append(spacer[i])
        pos += len(spacer[i])
        starts.append(pos)
        parts.append(unit.copy())
        pos += len(unit)
    genome = np.concatenate(parts)
    read = unit[:260].copy()
    a = run_find(genome, [read], k=10, min_match=12, occ_per_pos=3,
                 occ_block_sample=True)
    hit_copies = set()
    for j in range(a.q.shape[1]):
        if a.valid[0, j]:
            t = int(a.t[0, j])
            for ci, s in enumerate(starts):
                if s <= t < s + 300:
                    hit_copies.add(ci)
    assert len(hit_copies) >= 6, f"only copies {sorted(hit_copies)} anchored"
