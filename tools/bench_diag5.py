"""Which traceback rows overflow, and how many pairs do they need? (dev)"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
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
    pos, kw = mapper._batch_call_args(L)
    T = L + cfg.window_len(L)
    for bi in range(4):
        arr = np.full((B, L), 4, dtype=np.int8)
        lens = np.zeros(B, dtype=np.int32)
        for i, s in enumerate(sims[bi * B:(bi + 1) * B]):
            n = min(len(s.rec.seq), L)
            arr[i, :n] = s.rec.seq[:n]
            lens[i] = n
        res = unpack_batch(map_batch(mapper.dev, jnp.asarray(arr),
                                     jnp.asarray(lens), *pos, **kw))
        ov = res.overflow
        print(f"batch {bi}: overflow rows {int(ov.sum())} "
              f"(of valid {int(res.valid.sum())})")
        rows, cols = np.nonzero(ov)
        for r, c in list(zip(rows, cols))[:8]:
            # count RL pairs emitted for this slot from res.ops
            slot = res.dp_slot[r, c]
            opsrow = res.ops[slot] if slot >= 0 else None
            npairs = 0
            if opsrow is not None:
                halves = np.empty(opsrow.size * 2, np.int32)
                halves[0::2] = opsrow & 0xFFFF
                halves[1::2] = (opsrow >> 16) & 0xFFFF
                npairs = int(np.count_nonzero(halves & 3))
            print(f"  row {r} cand {c}: valid={bool(res.valid[r,c])} "
                  f"slot={slot} q=[{res.q_start[r,c]},{res.q_end[r,c]}] "
                  f"t=[{res.t_start[r,c]},{res.t_end[r,c]}] "
                  f"score={res.score[r,c]:.0f} pairs_emitted={npairs} "
                  f"cap={max(128, T // 4)}")


if __name__ == "__main__":
    main()
