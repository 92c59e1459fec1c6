"""Cumulative per-stage TPU timing via map_batch's profile_stop hook.

Unlike tools/profile_stages.py (which times kernels standalone and is
unreliable over the axon tunnel), this times the REAL fused graph truncated
after each stage; stage cost = difference of adjacent cumulative times.
Timing forces a scalar fetch (block_until_ready is unreliable over axon).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from blasr_tpu.index import build_genome_index
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper, map_batch
from blasr_tpu.sim import random_genome, simulate_reads

STOPS = [(1, "anchors"), (2, "chain"), (3, "members"), (40, "windows"),
         (41, "sdp-guide"), (4, "band-offsets"), (5, "banded-dp"),
         (6, "traceback"), (0, "full")]


def fetch(res):
    # map_batch always returns a PackedBatch; force a scalar round trip
    return float(res.ints.ravel()[0].astype(jnp.float32))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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
    pos, kw = mapper._batch_call_args(L)
    reads_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    print(f"B={B} L={L} platform={jax.devices()[0].platform}", flush=True)

    prev, prev_name = 0.0, "start"
    for stop, name in STOPS:
        kw2 = dict(kw, profile_stop=stop)
        call = lambda: map_batch(mapper.dev, reads_j, lens_j, *pos, **kw2)
        fetch(call())  # compile
        best = min(
            (lambda t0: (fetch(call()), time.time() - t0)[1])(time.time())
            for _ in range(n_iter))
        print(f"{name:14s} cum {best*1000:8.1f} ms   "
              f"stage {((best-prev))*1000:8.1f} ms", flush=True)
        prev = best


if __name__ == "__main__":
    main()
