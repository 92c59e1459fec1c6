"""Replicate bench.py exactly (two candidate mappers alive) with per-pass
timing, to decide whether the r02 probe-vs-measured collapse is mapper
coexistence or tunnel degradation (dev tool)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    from blasr_tpu.hostcache import host_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      host_cache_dir(os.path.join(
                          os.path.dirname(__file__), "..", ".jax_cache_tpu")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from blasr_tpu.index import build_genome_index
    from blasr_tpu.params import MappingParams, ShapeConfig
    from blasr_tpu.pipeline.map_read import Mapper
    from blasr_tpu.sim import random_genome, simulate_reads

    t0 = time.time()
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    print(f"# index built in {time.time()-t0:.1f}s", file=sys.stderr)

    n_reads = 512
    sims = simulate_reads(contigs, n_reads, read_len=(500, 1980),
                          accuracy=0.85, seed=12)
    recs = [s.rec for s in sims]

    params = MappingParams().make_sane()
    candidates = [
        ShapeConfig(buckets=(1024, 2048), batch_size=32, max_anchors=512),
        ShapeConfig(buckets=(1024, 2048), batch_size=64, max_anchors=512,
                    hbm_budget=1 << 29),
    ]
    t0 = time.time()
    order = sorted(range(len(recs)), key=lambda i: len(recs[i].seq))
    warm_recs = [recs[i] for i in order[:16] + order[-16:]]
    probe = recs[:256]
    mappers = []
    for cfg in candidates:
        m = Mapper(gi, params, cfg)
        t1 = time.time()
        m.map_reads(warm_recs)
        print(f"# batch {cfg.batch_size} warm {time.time()-t1:.1f}s",
              file=sys.stderr)
        dt = float("inf")
        for j in range(2):
            t1 = time.time()
            m.map_reads(probe)
            d = time.time() - t1
            print(f"# batch {cfg.batch_size} probe{j}: {d:.2f}s "
                  f"({len(probe)/d:.1f} r/s)", file=sys.stderr)
            dt = min(dt, d)
        mappers.append((dt, m))
    print(f"# warmup+select {time.time()-t0:.1f}s", file=sys.stderr)

    mappers.sort(key=lambda t: t[0])
    mapper = mappers[0][1]
    print(f"# measuring with batch {mapper.cfg.batch_size}; BOTH mappers "
          f"alive (bench.py behavior)", file=sys.stderr)
    for i in range(3):
        t0 = time.time()
        mapper.map_reads(recs)
        d = time.time() - t0
        print(f"# pass{i}: {d:.2f}s ({n_reads/d:.1f} r/s)", file=sys.stderr)

    # now drop the loser and re-measure
    loser = mappers[1][1]
    del mappers, loser
    import gc
    gc.collect()
    print("# loser deleted", file=sys.stderr)
    for i in range(3):
        t0 = time.time()
        mapper.map_reads(recs)
        d = time.time() - t0
        print(f"# pass{i} (solo): {d:.2f}s ({n_reads/d:.1f} r/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
