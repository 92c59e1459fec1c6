"""Isolate banded_align's TPU cost: N scaling, output-write cost,
shift-vs-static variants."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from blasr_tpu.kernels import banded as bd


def timeit(name, fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    print(f"{name:40s} {(time.time()-t0)/n*1000:9.1f} ms", flush=True)


def make(N, L, W):
    rng = np.random.default_rng(0)
    reads = jnp.asarray(rng.integers(0, 4, (N, L), dtype=np.int8))
    windows = jnp.asarray(rng.integers(0, 4, (N, W), dtype=np.int8))
    r = np.arange(L)
    offs = jnp.asarray(np.broadcast_to(
        np.clip(128 + r - 64, 0, W - 128).astype(np.int32), (N, L)).copy())
    qa = jnp.zeros(N, jnp.int32)
    qb = jnp.full(N, L, jnp.int32)
    ta = jnp.full(N, 128, jnp.int32)
    tb = ta + L
    submat = jnp.asarray(np.where(np.eye(5, dtype=np.float32), -5, 6)
                         .reshape(25))
    return reads, windows, offs, qa, qb, ta, tb, submat


def main():
    L, W = 2048, 3072
    for N in (64, 640):
        args = make(N, L, W)
        timeit(f"banded_align N={N}",
               lambda a=args: bd.banded_align(*a, 4.0, 4.0, 5.0, 5.0,
                                              w_b=128))

    # variant: no traceback bits emitted (score only)
    import functools

    def _align_score_only(read, window, offsets, qa, qb, ta, tb, submat,
                          io, ie, do, de, w_b):
        score, tbbits, state, ok = bd._align_one(
            read, window, offsets, qa, qb, ta, tb, submat, io, ie, do, de,
            w_b)
        return score, ok

    @functools.partial(jax.jit, static_argnames=("w_b",))
    def score_only(reads, windows, offsets, qa, qb, ta, tb, submat,
                   io, ie, do, de, w_b=128):
        f = jax.vmap(_align_score_only,
                     in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None,
                              None, None))
        return f(reads, windows, offsets, qa, qb, ta, tb, submat,
                 jnp.float32(io), jnp.float32(ie), jnp.float32(do),
                 jnp.float32(de), w_b)

    args = make(640, L, W)
    timeit("score_only N=640 (tbbits dead-coded?)",
           lambda: score_only(*args, 4.0, 4.0, 5.0, 5.0))


if __name__ == "__main__":
    main()
