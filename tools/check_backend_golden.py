"""Cross-backend determinism check: run the golden workload on the
CURRENT backend (TPU under axon, CPU under JAX_PLATFORMS=cpu) and diff
against the checked-in CPU goldens byte-for-byte.

Integer-exact scores + stable selection are supposed to make output
independent of the backend; this script proves it on real hardware.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

# persistent compile cache: identity runs at HEAD may need fresh TPU
# compiles (HLO changes since the last run); over a degraded tunnel a
# compile can take many minutes — never pay for it twice
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    from blasr_tpu.hostcache import host_cache_dir
    _cache = host_cache_dir("/root/repo/tests/.jax_cache")
else:
    _cache = "/root/repo/.jax_cache_tpu"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import test_golden as tg


def main() -> int:
    print(f"backend: {jax.default_backend()}")
    bad = 0
    only = set(sys.argv[1:])
    with tempfile.TemporaryDirectory() as d:
        cache = {}
        for name, world, flags in tg.CASES:
            if only and name not in only:
                continue
            golden = os.path.join(tg.GOLDEN_DIR, f"golden.{name}")
            if not os.path.exists(golden):
                print(f"{name}: NO GOLDEN")
                continue
            got = tg.run_case(d, name, world, flags, cache)
            want = open(golden).read()
            ok = got == want
            print(f"{name}: {'IDENTICAL' if ok else 'DIFFERS'}")
            bad += 0 if ok else 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
