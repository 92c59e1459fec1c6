"""Per-phase wall breakdown of the batch dispatch loop over the tunnel.

Compares: (a) direct numpy-arg dispatch (JAX transfers args at call),
(b) pre-staged jax.device_put args (what _run_bucket does), for a
single-bucket stream of batches, timing host-prep / put / dispatch-return /
fetch separately."""

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = 2048
    NB = 8  # batches
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    sims = simulate_reads(contigs, B * NB, read_len=(500, L - 60),
                          accuracy=0.85, seed=12)
    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(L,), batch_size=B, max_anchors=512)
    mapper = Mapper(gi, params, cfg)
    pos, kw = mapper._batch_call_args(L)

    batches = []
    for bi in range(NB):
        arr = np.full((B, L), 4, dtype=np.int8)
        lens = np.zeros(B, dtype=np.int32)
        for i, s in enumerate(sims[bi * B:(bi + 1) * B]):
            n = min(len(s.rec.seq), L)
            arr[i, :n] = s.rec.seq[:n]
            lens[i] = n
        batches.append((arr, lens))

    # warm
    r = map_batch(mapper.dev, jnp.asarray(batches[0][0]),
                  jnp.asarray(batches[0][1]), *pos, **kw)
    _ = unpack_batch(r)
    print(f"B={B} NB={NB} platform={jax.devices()[0].platform}", flush=True)

    for mode in ("numpy-serial", "staged-serial", "numpy-pipelined",
                 "staged-pipelined"):
        for trial in range(3):
            t_put = t_disp = t_fetch = 0.0
            t0 = time.time()
            if mode == "numpy-serial":
                for arr, lens in batches:
                    t1 = time.time()
                    res = map_batch(mapper.dev, jnp.asarray(arr),
                                    jnp.asarray(lens), *pos, **kw)
                    t_disp += time.time() - t1
                    t1 = time.time()
                    _ = unpack_batch(res)
                    t_fetch += time.time() - t1
            elif mode == "staged-serial":
                for arr, lens in batches:
                    t1 = time.time()
                    a_d, l_d = jax.device_put(arr), jax.device_put(lens)
                    t_put += time.time() - t1
                    t1 = time.time()
                    res = map_batch(mapper.dev, a_d, l_d, *pos, **kw)
                    t_disp += time.time() - t1
                    t1 = time.time()
                    _ = unpack_batch(res)
                    t_fetch += time.time() - t1
            elif mode == "numpy-pipelined":
                pend = []
                for arr, lens in batches:
                    t1 = time.time()
                    pend.append(map_batch(mapper.dev, jnp.asarray(arr),
                                          jnp.asarray(lens), *pos, **kw))
                    t_disp += time.time() - t1
                    if len(pend) > 4:
                        t1 = time.time()
                        _ = unpack_batch(pend.pop(0))
                        t_fetch += time.time() - t1
                while pend:
                    t1 = time.time()
                    _ = unpack_batch(pend.pop(0))
                    t_fetch += time.time() - t1
            else:  # staged-pipelined (what _run_bucket does)
                staged = [(jax.device_put(a), jax.device_put(l))
                          for a, l in batches[:4]]
                pend = []
                for i in range(NB):
                    if i + 4 < NB:
                        a, l = batches[i + 4]
                        t1 = time.time()
                        staged.append((jax.device_put(a), jax.device_put(l)))
                        t_put += time.time() - t1
                    a_d, l_d = staged.pop(0)
                    t1 = time.time()
                    pend.append(map_batch(mapper.dev, a_d, l_d, *pos, **kw))
                    t_disp += time.time() - t1
                    if len(pend) > 4:
                        t1 = time.time()
                        _ = unpack_batch(pend.pop(0))
                        t_fetch += time.time() - t1
                while pend:
                    t1 = time.time()
                    _ = unpack_batch(pend.pop(0))
                    t_fetch += time.time() - t1
            dt = time.time() - t0
            print(f"{mode:18s} trial{trial}: total {dt*1000:7.0f} ms  "
                  f"put {t_put*1000:6.0f}  disp {t_disp*1000:6.0f}  "
                  f"fetch {t_fetch*1000:6.0f}  "
                  f"({B*NB/dt:.1f} r/s)", flush=True)


if __name__ == "__main__":
    main()
