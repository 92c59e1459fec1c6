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
