"""Micro-bisect the LUT stage: keys vs gathers vs paired gather (dev)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.kernels.anchor import read_kmer_keys
from blasr_tpu.pipeline.map_read import DeviceIndex
from blasr_tpu.sim import random_genome, simulate_reads


def bench(name, fn, n=20, trials=3):
    """Amortized timing: queue n dispatches, fetch once (the tunnel adds a
    ~30 ms round-trip floor to any single dispatch+fetch)."""
    float(fn())  # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn()
        float(out)
        best = min(best, (time.time() - t0) / n)
    print(f"{name:28s} {best*1000:8.2f} ms", flush=True)


def main():
    B, L = 64, 2048
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    dev = DeviceIndex.from_host(gi)
    sims = simulate_reads(contigs, B, read_len=(500, L - 60), accuracy=0.85,
                          seed=12)
    reads = np.full((B, L), 4, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(sims):
        n = min(len(s.rec.seq), L)
        reads[i, :n] = s.rec.seq[:n]
        lens[i] = n
    reads_j, lens_j = jnp.asarray(reads), jnp.asarray(lens)
    print(f"platform={jax.devices()[0].platform}", flush=True)

    @jax.jit
    def keys_only(r, ln):
        keys, ok = read_kmer_keys(r, ln, 12)
        return jnp.sum(keys.astype(jnp.float32)) + jnp.sum(ok)

    @jax.jit
    def keys_gather2(r, ln):
        keys, ok = read_kmer_keys(r, ln, 12)
        flatk = keys.reshape(-1).astype(jnp.int32)
        lo = jnp.take(dev.bucket_starts, flatk)
        hi = jnp.take(dev.bucket_starts, flatk + 1)
        return (jnp.sum(lo.astype(jnp.float32))
                + jnp.sum(hi.astype(jnp.float32)) + jnp.sum(ok))

    @jax.jit
    def keys_gather_pair(r, ln):
        keys, ok = read_kmer_keys(r, ln, 12)
        flatk = keys.reshape(-1).astype(jnp.int32)
        pair = jnp.take(dev.bucket_pairs, flatk, axis=0)
        return jnp.sum(pair.astype(jnp.float32)) + jnp.sum(ok)

    @jax.jit
    def keys_gather1(r, ln):
        keys, ok = read_kmer_keys(r, ln, 12)
        flatk = keys.reshape(-1).astype(jnp.int32)
        lo = jnp.take(dev.bucket_starts, flatk)
        return jnp.sum(lo.astype(jnp.float32)) + jnp.sum(ok)

    # sorted-index gather: does locality matter?
    @jax.jit
    def keys_gather1_sorted(r, ln):
        keys, ok = read_kmer_keys(r, ln, 12)
        flatk = jnp.sort(keys.reshape(-1)).astype(jnp.int32)
        lo = jnp.take(dev.bucket_starts, flatk)
        return jnp.sum(lo.astype(jnp.float32)) + jnp.sum(ok)

    for name, fn in [("keys_only", keys_only),
                     ("keys+2 gathers", keys_gather2),
                     ("keys+pair row-gather", keys_gather_pair),
                     ("keys+1 gather", keys_gather1),
                     ("keys+1 gather (sorted)", keys_gather1_sorted)]:
        bench(name, lambda fn=fn: fn(reads_j, lens_j))


if __name__ == "__main__":
    main()
