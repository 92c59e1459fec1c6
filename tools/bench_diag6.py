"""True RL-pair counts per collected candidate (dense traceback). (dev)"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper, map_batch, unpack_batch
from blasr_tpu.sim import random_genome, simulate_reads


def main():
    B, L = 64, 2048
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    sims = simulate_reads(contigs, 512, read_len=(500, L - 60),
                          accuracy=0.85, seed=12)
    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(L,), batch_size=B, max_anchors=512)
    mapper = Mapper(gi, params, cfg)
    T = L + cfg.window_len(L)
    pos, kw = mapper._batch_call_args(L, tb_cap=T)
    allp = []
    for bi in range(8):
        arr = np.full((B, L), 4, dtype=np.int8)
        lens = np.zeros(B, dtype=np.int32)
        for i, s in enumerate(sims[bi * B:(bi + 1) * B]):
            n = min(len(s.rec.seq), L)
            arr[i, :n] = s.rec.seq[:n]
            lens[i] = n
        res = unpack_batch(map_batch(mapper.dev, jnp.asarray(arr),
                                     jnp.asarray(lens), *pos, **kw))
        rows, cols = np.nonzero(res.valid & (res.dp_slot >= 0))
        halves0 = res.ops & 0xFFFF
        halves1 = (res.ops >> 16) & 0xFFFF
        np_per_slot = (np.count_nonzero(halves0 & 3, axis=1)
                       + np.count_nonzero(halves1 & 3, axis=1))
        for r, c in zip(rows, cols):
            allp.append(np_per_slot[res.dp_slot[r, c]])
    a = np.array(allp)
    print(f"n={a.size} mean={a.mean():.0f} p50={np.percentile(a,50):.0f} "
          f"p90={np.percentile(a,90):.0f} p99={np.percentile(a,99):.0f} "
          f"p99.9={np.percentile(a,99.9):.0f} max={a.max()}")
    for cap in (640, 1280, 1920, 2560, 3840, 5120):
        over = int((a > cap).sum())
        print(f"cap {cap}: {over} candidates overflow "
              f"({over/a.size*100:.2f}%)")


if __name__ == "__main__":
    main()
