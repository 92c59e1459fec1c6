"""First-run latency table: cold vs warm warmup over the TPU tunnel.

VERDICT r2 weak #6 / item 8: publish a measured cold/warm warmup table at
HEAD.  "Warmup" = the bench workload's compile phase (Mapper.map_reads on
the 32 shape-covering reads, two buckets).  Cold uses a throwaway
compilation-cache dir (every executable compiles from scratch); warm
reuses the repo's persistent host-keyed cache (populated by bench runs).

    python tools/measure_warmup.py            # parent: runs both children
    python tools/measure_warmup.py --child cold|warm   # one measurement

Each measurement runs in its own process because JAX binds the backend and
compilation cache per-process.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(mode: str) -> None:
    import jax
    if mode == "warm":
        from blasr_tpu.hostcache import host_cache_dir
        cache = host_cache_dir(os.path.join(REPO, ".jax_cache_tpu"))
    else:
        cache = tempfile.mkdtemp(prefix="jax_cold_cache_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from blasr_tpu.index import build_genome_index
    from blasr_tpu.params import MappingParams, ShapeConfig
    from blasr_tpu.pipeline.map_read import Mapper
    from blasr_tpu.sim import random_genome, simulate_reads

    t0 = time.time()
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    t_index = time.time() - t0

    sims = simulate_reads(contigs, 512, read_len=(500, 1980), accuracy=0.85,
                          seed=12)
    recs = [s.rec for s in sims]
    order = sorted(range(len(recs)), key=lambda i: len(recs[i].seq))
    warm_recs = [recs[i] for i in order[:16] + order[-16:]]

    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(1024, 2048), batch_size=32, max_anchors=512)
    t0 = time.time()
    mapper = Mapper(gi, params, cfg)
    mapper.map_reads(warm_recs)
    t_warmup = time.time() - t0
    t0 = time.time()
    mapper.map_reads(recs[:256])
    t_steady = time.time() - t0
    print(json.dumps({
        "mode": mode, "backend": jax.default_backend(),
        "index_s": round(t_index, 1), "warmup_s": round(t_warmup, 1),
        "first_256_reads_s": round(t_steady, 1),
        "reads_per_sec_after": round(256 / t_steady, 1)}))


def main() -> int:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return 0
    for mode in ("cold", "warm"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            stdout=subprocess.PIPE, text=True, timeout=3600)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
