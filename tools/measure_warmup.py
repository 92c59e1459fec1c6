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


def child_phases() -> None:
    """Warm-path phase decomposition (VERDICT r3 item 3): split the warm
    first-call cost into lowering (host), persistent-cache disk read,
    decompress, executable deserialize + remote program load (one step
    over the axon tunnel: deserialization SENDS the program to the
    service), and the first real dispatch."""
    import jax

    from blasr_tpu.hostcache import host_cache_dir
    cache = host_cache_dir(os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # instrument the compilation cache: re-implement get_executable_and_time
    # with per-step clocks (the structure is pinned by the jax version in
    # this image; fall back to the uninstrumented path on mismatch)
    from jax._src import compilation_cache as cc
    stats = {"disk_s": 0.0, "decompress_s": 0.0, "deserialize_s": 0.0,
             "hits": 0, "misses": 0, "bytes": 0}
    orig = cc.get_executable_and_time

    def timed(cache_key, compile_options, backend, executable_devices):
        cache_obj = cc._get_cache(backend)
        if cache_obj is None:
            return orig(cache_key, compile_options, backend,
                        executable_devices)
        t0 = time.time()
        item = cache_obj.get(cache_key)
        stats["disk_s"] += time.time() - t0
        if item is None:
            stats["misses"] += 1
            return None, None
        stats["hits"] += 1
        stats["bytes"] += len(item)
        t0 = time.time()
        item = cc.decompress_executable(item)
        stats["decompress_s"] += time.time() - t0
        serialized, compile_time = cc.extract_executable_and_time(item)
        t0 = time.time()
        ex = backend.deserialize_executable(
            serialized, executable_devices, compile_options)
        stats["deserialize_s"] += time.time() - t0
        return ex, compile_time

    cc.get_executable_and_time = timed

    import jax.numpy as jnp

    from blasr_tpu.index import build_genome_index
    from blasr_tpu.params import MappingParams, ShapeConfig
    from blasr_tpu.pipeline.map_read import Mapper, map_batch
    from blasr_tpu.sim import random_genome, simulate_reads

    t0 = time.time()
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    t_index = time.time() - t0

    params = MappingParams().make_sane()
    t0 = time.time()
    cfg = ShapeConfig(buckets=(1024, 2048), batch_size=32, max_anchors=512)
    mapper = Mapper(gi, params, cfg)
    t_ctor = time.time() - t0
    # force index transfer + on-device derivation to completion so the
    # per-bucket lower/compile clocks below don't absorb queue-wait
    # behind in-flight transfers (round-4 finding: this phase, not
    # lowering, is the variable 180-560 s warm-start cost)
    t0 = time.time()
    for name in mapper.dev._fields:
        a = getattr(mapper.dev, name)
        if a is not None and hasattr(a, "block_until_ready"):
            a.block_until_ready()
    _ = float(mapper.dev.pos_sorted.ravel()[0].astype(jnp.float32))
    t_resident = time.time() - t0
    per_bucket = []
    for L in cfg.buckets:
        batch = mapper.batch_size_for(L)
        arr = jnp.zeros((batch, L), dtype=jnp.int8)
        lens = jnp.full((batch,), L, dtype=jnp.int32)
        pos, kw = mapper._batch_call_args(L)
        t0 = time.time()
        lowered = map_batch.lower(mapper.dev, arr, lens, *pos, **kw)
        t_lower = time.time() - t0
        before = dict(stats)
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        per_bucket.append({
            "bucket": L, "lower_s": round(t_lower, 1),
            "compile_total_s": round(t_compile, 1),
            "cache_disk_s": round(stats["disk_s"] - before["disk_s"], 2),
            "decompress_s": round(
                stats["decompress_s"] - before["decompress_s"], 2),
            "deserialize_remote_load_s": round(
                stats["deserialize_s"] - before["deserialize_s"], 1),
            "hit": stats["hits"] > before["hits"],
        })
    # first dispatch: executables are built; this measures data transfer
    # + first execution + fetch over the tunnel
    sims = simulate_reads(contigs, 32, read_len=(500, 1000),
                          accuracy=0.85, seed=12)
    t0 = time.time()
    mapper.map_reads([s.rec for s in sims])
    t_first = time.time() - t0
    print(json.dumps({
        "mode": "phases", "backend":
        __import__("jax").default_backend(),
        "index_s": round(t_index, 1),
        "mapper_ctor_s": round(t_ctor, 1),
        "index_transfer_s": round(t_resident, 1),
        "buckets": per_bucket,
        "cache": {k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in stats.items()},
        "first_dispatch_s": round(t_first, 1)}))


def main() -> int:
    if "--phases" in sys.argv:
        child_phases()
        return 0
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
