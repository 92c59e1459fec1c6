"""Micro-profile find_anchors sub-stages on the current backend (dev tool)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from blasr_tpu.index import build_genome_index
from blasr_tpu.kernels.anchor import read_kmer_keys
from blasr_tpu.pipeline.map_read import DeviceIndex
from blasr_tpu.sim import random_genome, simulate_reads

BIG = jnp.int32(0x3FFFFFFF)


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/n*1000:9.1f} ms")
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    O, A, E, k = 4, 512, 36, 12
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=k)
    dev = DeviceIndex.from_host(gi)
    sims = simulate_reads(contigs, B, read_len=(500, L - 60), accuracy=0.85,
                          seed=12)
    reads = np.full((B, L), 4, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(sims):
        n = min(len(s.rec.seq), L)
        reads[i, :n] = s.rec.seq[:n]
        lens[i] = n
    reads = jnp.asarray(np.concatenate([reads, reads]))  # 2B like pipeline
    lens = jnp.asarray(np.concatenate([lens, lens]))
    B2 = 2 * B
    G = dev.genome.shape[0]

    @jax.jit
    def stage_keys(reads, lens):
        return read_kmer_keys(reads, lens, k)

    keys, kvalid = timeit("read_kmer_keys", lambda: stage_keys(reads, lens))

    @jax.jit
    def stage_lut(keys):
        flatk = keys.reshape(-1).astype(jnp.int32)
        lo = jnp.take(dev.bucket_starts, flatk).reshape(B2, L)
        hi = jnp.take(dev.bucket_starts, flatk + 1).reshape(B2, L)
        return lo.astype(jnp.int32), hi.astype(jnp.int32)

    lo, hi = timeit("lut gathers", lambda: stage_lut(keys))

    @jax.jit
    def stage_occ(lo, hi, kvalid):
        nocc = hi - lo
        pos_ok = kvalid & (nocc > 0) & (nocc <= 10000)
        occ = jnp.arange(O, dtype=jnp.int32)
        idx = lo[:, :, None] + occ[None, None, :]
        cand_valid = pos_ok[:, :, None] & (occ[None, None, :] < nocc[:, :, None])
        idx = jnp.clip(idx, 0, dev.pos_sorted.shape[0] - 1)
        t = jnp.take(dev.pos_sorted, idx).astype(jnp.int32)
        return t, cand_valid, nocc

    t, cand_valid, nocc = timeit("pos_sorted gathers", lambda: stage_occ(lo, hi, kvalid))

    @jax.jit
    def stage_ext(t, reads):
        rw = jnp.zeros((B2, L), dtype=jnp.uint32)
        rn = jnp.zeros((B2, L), dtype=jnp.uint32)
        r32 = reads.astype(jnp.int32)
        for j16 in range(16):
            shifted = jnp.concatenate(
                [r32[:, j16:], jnp.full((B2, j16), 4, jnp.int32)], axis=1)
            rw = rw | ((shifted & 3).astype(jnp.uint32) << (2 * j16))
            rn = rn | (jnp.where(shifted >= 4, jnp.uint32(3),
                                 jnp.uint32(0)) << (2 * j16))
        n_words = -(-E // 16)
        ext = jnp.zeros((B2, L, O), dtype=jnp.int32)
        full_prev = jnp.ones((B2, L, O), dtype=jnp.int32)
        allN = jnp.uint32(0xFFFFFFFF)
        for j in range(n_words):
            off = k + 16 * j
            gidx = jnp.clip(t + off, 0, G - 1)
            gw_j = jnp.take(dev.gwords, gidx)
            gn_j = jnp.take(dev.gnwords, gidx)
            gn_j = jnp.where(t + off < G, gn_j, allN)
            rw_sh = jnp.concatenate(
                [rw[:, off:], jnp.zeros((B2, min(off, L)), jnp.uint32)],
                axis=1)[:, :L]
            rn_sh = jnp.concatenate(
                [rn[:, off:], jnp.full((B2, min(off, L)), allN)],
                axis=1)[:, :L]
            diff = (gw_j ^ rw_sh[:, :, None]) | gn_j | rn_sh[:, :, None]
            lsb = diff & (~diff + jnp.uint32(1))
            tz = jax.lax.population_count(lsb - jnp.uint32(1))
            mlen = (tz >> 1).astype(jnp.int32)
            ext = ext + mlen * full_prev
            full_prev = full_prev * (mlen == 16).astype(jnp.int32)
        return k + jnp.minimum(ext, E)

    length = timeit("word extension", lambda: stage_ext(t, reads))

    @jax.jit
    def stage_sort(length, cand_valid):
        flat_valid = cand_valid.reshape(B2, L * O)
        flat_len = length.reshape(B2, L * O)
        rank = jnp.where(flat_valid, -flat_len, BIG)
        order = jnp.argsort(rank, axis=1, stable=True)[:, :A]
        return order

    order = timeit("argsort top-A", lambda: stage_sort(length, cand_valid))

    @jax.jit
    def stage_topk(length, cand_valid):
        flat_valid = cand_valid.reshape(B2, L * O)
        flat_len = length.reshape(B2, L * O)
        rank = jnp.where(flat_valid, flat_len, -1)
        _, idx = jax.lax.top_k(rank, A)
        return idx

    idx = timeit("top_k top-A", lambda: stage_topk(length, cand_valid))

    @jax.jit
    def stage_sort2(order, length):
        flat_len = length.reshape(B2, L * O)
        sel_l = jnp.take_along_axis(flat_len, order, axis=1)
        tkey = jnp.where(sel_l > 0, sel_l, BIG)
        return jnp.argsort(tkey, axis=1, stable=True)

    timeit("argsort A resort", lambda: stage_sort2(order, length))


if __name__ == "__main__":
    main()
