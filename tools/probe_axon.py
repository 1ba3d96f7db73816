#!/usr/bin/env python
"""Re-probe the axon TPU backend bug list each round (NOTES_ROUND2.md item 2).

Probes, each printed as one line `PROBE <name>: <verdict> <detail>`:
  1. donation      — buffer donation raises InvalidArgument?
  2. block         — block_until_ready returns before execution finishes?
  3. h2d_leak      — host->device staging buffers leak native memory?
  4. bg_device_put — device_put from a background thread deadlocks?
  5. xla_flags     — TPU-side --xla_tpu_* flags rejected?

Run on the real chip:  python tools/probe_axon.py   (no JAX_PLATFORMS=cpu)
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    import psutil

    return psutil.Process().memory_info().rss / 1e6


def main():
    from mcvd_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"PROBE backend: {dev.platform} {dev}", flush=True)

    # ---- 1. donation
    try:
        f = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
        x = jnp.ones((256, 256))
        y = f(x)
        _ = float(jnp.sum(y))
        print("PROBE donation: OK (donated buffer accepted)", flush=True)
    except Exception as e:
        print(f"PROBE donation: BROKEN ({type(e).__name__}: {str(e)[:120]})",
              flush=True)

    # ---- 2. block_until_ready
    big = jax.jit(lambda x: jnp.linalg.matrix_power(x, 32))
    x = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048))
    r = big(x)
    _ = float(jnp.sum(r))  # warm compile
    t0 = time.time()
    r = big(x)
    r.block_until_ready()
    t_block = time.time() - t0
    t0 = time.time()
    _ = float(jnp.sum(r))
    t_force = time.time() - t0
    verdict = "NO-OP" if t_force > max(4 * t_block, 0.05) else "OK"
    print(f"PROBE block: {verdict} (block={t_block*1e3:.1f}ms, "
          f"later force={t_force*1e3:.1f}ms)", flush=True)

    # ---- 3. H2D staging leak
    import numpy as np

    batch = np.ones((1, 64, 64, 64), np.float16)  # 0.5 MB
    g = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = float(g(batch))
    base = rss_mb()
    n = 200
    for i in range(n):
        _ = float(g(batch))
    growth = rss_mb() - base
    per_step = growth / n
    verdict = "LEAKING" if per_step > 0.25 else "OK"
    print(f"PROBE h2d_leak: {verdict} ({growth:.1f}MB over {n} puts, "
          f"{per_step*1e3:.0f}KB/step for a 0.5MB wire batch)", flush=True)

    # ---- 4. background-thread device_put
    done = threading.Event()
    err = []

    def worker():
        try:
            y = jax.device_put(np.ones((128, 128), np.float32))
            _ = float(jnp.sum(y))
            done.set()
        except Exception as e:  # pragma: no cover
            err.append(e)
            done.set()

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    # keep the main thread dispatching meanwhile (the deadlock trigger)
    for _ in range(5):
        _ = float(g(batch))
    ok = done.wait(timeout=60)
    if not ok:
        print("PROBE bg_device_put: DEADLOCK (worker stuck >60s)", flush=True)
    elif err:
        print(f"PROBE bg_device_put: ERROR ({err[0]})", flush=True)
    else:
        print("PROBE bg_device_put: OK", flush=True)

    print("PROBE done", flush=True)


if __name__ == "__main__":
    main()
