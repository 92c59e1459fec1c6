"""cProfile a warm map_reads pass to find host-side hotspots (dev tool)."""

import cProfile
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from blasr_tpu.index import build_genome_index
from blasr_tpu.params import MappingParams, ShapeConfig
from blasr_tpu.pipeline.map_read import Mapper
from blasr_tpu.sim import random_genome, simulate_reads


def main():
    contigs = random_genome(4_600_000, seed=11)
    gi = build_genome_index(contigs, k=12)
    sims = simulate_reads(contigs, 512, read_len=(500, 1980), accuracy=0.85,
                          seed=12)
    recs = [s.rec for s in sims]
    params = MappingParams().make_sane()
    cfg = ShapeConfig(buckets=(1024, 2048), batch_size=64, max_anchors=512,
                      hbm_budget=1 << 29)
    mapper = Mapper(gi, params, cfg)
    mapper.map_reads(recs)  # warm
    t0 = time.time(); mapper.map_reads(recs); print(f"warm pass {time.time()-t0:.2f}s", flush=True)

    prof = cProfile.Profile()
    prof.enable()
    mapper.map_reads(recs)
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(40)


if __name__ == "__main__":
    main()
