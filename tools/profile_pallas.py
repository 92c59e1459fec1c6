"""TPU timing + compiled-correctness for the Pallas banded kernel."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blasr_tpu.kernels.banded import banded_align
from blasr_tpu.kernels.pallas_banded import pallas_banded_align
from blasr_tpu.params import default_score_matrix


def make(N, L, W, wb, seed=0):
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 4, (N, L), dtype=np.int8)
    windows = rng.integers(0, 4, (N, W), dtype=np.int8)
    for i in range(N):
        windows[i, 130:130 + L - 10] = reads[i, 5:L - 5]
    qa = jnp.full(N, 5, jnp.int32)
    qb = jnp.full(N, L - 5, jnp.int32)
    ta = jnp.full(N, 130, jnp.int32)
    tb = jnp.full(N, 130 + L - 10, jnp.int32)
    r = np.arange(L)
    offs = np.clip(130 + (r[None, :] - 5) - wb // 2, 0, W - wb).astype(
        np.int32) * np.ones((N, 1), np.int32)
    offs = jnp.asarray(np.maximum.accumulate(offs, axis=1))
    submat = jnp.asarray(
        np.asarray(default_score_matrix(), np.float32).reshape(25))
    return (jnp.asarray(reads), jnp.asarray(windows), offs, qa, qb, ta, tb,
            submat)


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    print(f"{name:32s} {(time.time()-t0)/n*1000:9.1f} ms", flush=True)
    return out


def main():
    N, L, W, wb = 640, 2048, 3072, 128
    args = make(N, L, W, wb)
    a2 = timeit("pallas_banded_align N=640",
                lambda: pallas_banded_align(*args, 4.0, 4.0, 5.0, 5.0,
                                            w_b=wb))
    # compiled-vs-XLA correctness on a small slab
    args_s = make(16, 512, 1024, wb, seed=1)
    r1 = banded_align(*args_s, 4.0, 4.0, 5.0, 5.0, w_b=wb)
    r2 = pallas_banded_align(*args_s, 4.0, 4.0, 5.0, 5.0, w_b=wb)
    print("scores equal:",
          np.array_equal(np.asarray(r1.score), np.asarray(r2.score)))
    print("bits equal:",
          np.array_equal(np.asarray(r1.tbbits), np.asarray(r2.tbbits)))
    print("valid equal:",
          np.array_equal(np.asarray(r1.valid), np.asarray(r2.valid)))


if __name__ == "__main__":
    main()
