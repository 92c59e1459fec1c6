"""Per-stage TPU timing for the mapping pipeline (dev tool)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from blasr_tpu.index import build_genome_index
from blasr_tpu.kernels.anchor import find_anchors
from blasr_tpu.kernels.banded import banded_align, banded_traceback
from blasr_tpu.kernels.chain import chain_anchors, chain_members
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import DeviceIndex, map_batch, unpack_batch
from blasr_tpu.sim import random_genome, simulate_reads


def timeit(name, fn, n=3):
    fn()  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:24s} {dt*1000:9.1f} ms")
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    sims = simulate_reads(contigs, B, read_len=(500, L - 60), accuracy=0.85,
                          seed=12)
    reads = np.full((B, L), 4, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(sims):
        n = min(len(s.rec.seq), L)
        reads[i, :n] = s.rec.seq[:n]
        lens[i] = n
    dev = DeviceIndex.from_host(gi)
    p = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(L,))
    W = cfg.window_len(L)
    submat = jnp.asarray(np.asarray(p.score_matrix, np.float32).reshape(25))
    gaps = jnp.asarray([4, 4, 5, 5], jnp.float32)
    static = dict(cfg_k=12, L=L, W=W, w_b=128, C=cfg.n_candidates,
                  A=cfg.max_anchors, O=cfg.occ_per_pos, E=cfg.anchor_ext,
                  T=L + W, max_chain=cfg.max_anchors, min_match=12,
                  max_anchors_per_pos=10000, max_lcp=0, indel_rate=0.3)
    reads_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    print(f"B={B} L={L} W={W} C={static['C']} A={static['A']} "
          f"platform={jax.devices()[0].platform}")

    t0 = time.time()
    full = timeit("map_batch (full)", lambda: map_batch(
        dev, reads_j, lens_j, submat, gaps, 20.0, C_dp=4, use_pallas=True,
        **static))

    reads2 = jnp.concatenate([reads_j, reads_j], axis=0)
    rlen2 = jnp.concatenate([lens_j, lens_j], axis=0)
    anchors = timeit("find_anchors", lambda: find_anchors(
        dev.genome, dev.keys_sorted, dev.pos_sorted, reads2, rlen2,
        k=12, occ_per_pos=static["O"], max_anchors=static["A"],
        anchor_ext=static["E"], min_match=12, max_anchors_per_pos=10000,
        max_lcp=0, bucket_starts=dev.bucket_starts,
        gwords=dev.gwords, gnwords=dev.gnwords))
    cands = timeit("chain_anchors", lambda: chain_anchors(
        anchors, rlen2, n_cand=static["C"], indel_rate=0.3))
    memb = timeit("chain_members", lambda: chain_members(
        cands, anchors, max_chain=static["A"]))

    # fabricate alignment inputs from candidates like map_batch does
    n_items = 2 * B * 4
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 4, (n_items, W), dtype=np.int8))
    reads_rep = jnp.repeat(reads2, static["C"], axis=0)[:n_items]
    qa = jnp.zeros(n_items, jnp.int32)
    qb = jnp.maximum(jnp.repeat(rlen2, static["C"])[:n_items], 1)
    ta = jnp.full(n_items, 128, jnp.int32)
    tb = ta + qb  # diagonal-ish
    r = np.arange(L)
    offs = jnp.asarray(
        np.clip(128 + r[None, :] - 64, 0, W - 128).astype(np.int32)
        * np.ones((n_items, 1), np.int32))
    from blasr_tpu.kernels.pallas_banded import pallas_banded_align
    reads_rep = reads_rep[:n_items]
    res = timeit("pallas_banded_align", lambda: pallas_banded_align(
        reads_rep, windows, offs, qa, qb, ta, tb, submat,
        4.0, 4.0, 5.0, 5.0, w_b=128))
    tbk = timeit("banded_traceback", lambda: banded_traceback(
        res, offs, qa, qb, ta, tb, t_max=L + W, w_b=128))

    # host collect cost
    t0 = time.time()
    host = unpack_batch(full)
    print(f"{'device->host':24s} {(time.time()-t0)*1000:9.1f} ms "
          f"(ops bytes={host.ops.nbytes})")
    # host cigar-assembly cost
    from blasr_tpu.pipeline.map_read import pairs_to_cigar, merge_adjacent_indels
    t0 = time.time()
    nal = 0
    for row in range(host.dp_slot.shape[0]):
        for c in range(host.dp_slot.shape[1]):
            if host.valid[row, c] and host.dp_slot[row, c] >= 0:
                cg = pairs_to_cigar(host.ops[host.dp_slot[row, c]])
                cg = merge_adjacent_indels(cg)
                nal += 1
    print(f"{'host cigar assembly':24s} {(time.time()-t0)*1000:9.1f} ms "
          f"({nal} alignments)")


if __name__ == "__main__":
    main()
