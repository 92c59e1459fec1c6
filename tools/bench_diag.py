"""Diagnose the probe-vs-measured bench collapse (dev tool).

Replicates bench.py's child flow but times every map_reads pass, every
bucket, and every batch dispatch/collect, then prints the metrics clocks.
"""

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
    print(f"# index built in {time.time()-t0:.1f}s "
          f"({jax.devices()[0].platform})", file=sys.stderr)

    n_reads = 512
    sims = simulate_reads(contigs, n_reads, read_len=(500, 1980),
                          accuracy=0.85, seed=12)
    recs = [s.rec for s in sims]

    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(1024, 2048), batch_size=64, max_anchors=512,
                      hbm_budget=1 << 29)
    order = sorted(range(len(recs)), key=lambda i: len(recs[i].seq))
    warm_ids = order[:16] + order[-16:]
    warm_recs = [recs[i] for i in warm_ids]

    t0 = time.time()
    mapper = Mapper(gi, params, cfg)
    mapper.map_reads(warm_recs)
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)

    probe = recs[:256]
    for tag, group in (("probe256", probe), ("full512", recs),
                       ("full512", recs), ("full512", recs),
                       ("probe256", probe)):
        mapper.metrics.clocks.clear()
        mapper.metrics.counters.clear()
        t0 = time.time()
        res = mapper.map_reads(group)
        dt = time.time() - t0
        n_mapped = sum(1 for r in res if r)
        clocks = {k: round(v, 2) for k, v in
                  sorted(mapper.metrics.clocks.items())}
        print(f"# {tag}: {dt:.2f}s = {len(group)/dt:.1f} r/s "
              f"mapped={n_mapped} clocks={clocks}", file=sys.stderr)

    # bucket distribution
    from collections import Counter
    c = Counter(cfg.bucket_for(len(r.seq)) for r in recs)
    print(f"# bucket distribution (512): {dict(c)}", file=sys.stderr)
    c = Counter(cfg.bucket_for(len(r.seq)) for r in probe)
    print(f"# bucket distribution (256): {dict(c)}", file=sys.stderr)


if __name__ == "__main__":
    main()
