"""Cumulative sub-stage timing inside find_anchors (dev tool).

Stage cost = difference of adjacent cumulative truncated-graph times;
scalar-fetch timing (reliable over the axon tunnel)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.kernels.anchor import find_anchors
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.sim import random_genome, simulate_reads

STOPS = [(1, "lut-lookup"), (2, "occ-sampling"), (3, "record-gather"),
         (4, "word-extension"), (5, "topA-argsort"), (0, "full")]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64   # rows incl. strands
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 5
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
    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(L,), batch_size=B, max_anchors=512)
    mapper = Mapper(gi, params, cfg)
    dev = mapper.dev
    reads_j, lens_j = jnp.asarray(reads), jnp.asarray(lens)
    print(f"B={B} L={L} O={cfg.occ_per_pos} A={cfg.max_anchors} "
          f"platform={jax.devices()[0].platform}", flush=True)

    prev = 0.0
    for stop, name in STOPS:
        def call():
            return find_anchors(
                dev.genome, dev.keys_sorted, dev.pos_sorted, reads_j, lens_j,
                k=gi.k, occ_per_pos=cfg.occ_per_pos,
                max_anchors=cfg.max_anchors, anchor_ext=cfg.anchor_ext,
                min_match=12, max_anchors_per_pos=10000, max_lcp=0,
                bucket_starts=dev.bucket_starts,
                bucket_pairs=dev.bucket_pairs, gwords=dev.gwords,
                gnwords=dev.gnwords, pos_records=dev.pos_records,
                profile_stop=stop)
        float(call().q.ravel()[0].astype(jnp.float32))  # compile
        best = float("inf")
        for _ in range(n_iter):
            t0 = time.time()
            float(call().q.ravel()[0].astype(jnp.float32))
            best = min(best, time.time() - t0)
        print(f"{name:16s} cum {best*1000:8.1f} ms   "
              f"stage {(best-prev)*1000:8.1f} ms", flush=True)
        prev = best


if __name__ == "__main__":
    main()
