"""One-shot TPU tunnel health probe: init backend, run a tiny matmul,
print timings.  Exit 0 = healthy.  Run under `timeout` from a watcher."""
import time


def main() -> int:
    t0 = time.time()
    import jax
    d = jax.devices()
    t_init = time.time() - t0
    import jax.numpy as jnp
    t0 = time.time()
    x = jnp.ones((256, 256))
    s = float((x @ x).sum())
    t_mm = time.time() - t0
    t0 = time.time()
    float(jnp.zeros(()).sum())
    rtt = time.time() - t0
    print(f"OK {d[0].platform} init={t_init:.1f}s matmul={t_mm:.1f}s "
          f"rtt={rtt*1000:.0f}ms sum={s:.0f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
