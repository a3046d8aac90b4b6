"""Compare Pallas vs XLA kNN on TPU (in-graph loops)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time

import numpy as np
import jax
import jax.numpy as jnp

from glio_tpu.lidar import neighbors
from glio_tpu.ops.knn_pallas import knn_pallas


def timeit_loop(name, fn, reps):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {((time.perf_counter()-t0-0.03)/reps)*1e3:.3f} ms/iter",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(5120, 3)), jnp.float32) * 10
    p = jnp.asarray(rng.normal(size=(20480, 3)), jnp.float32) * 10
    qv = jnp.ones(5120, bool)
    pv = jnp.ones(20480, bool)

    # Correctness on hardware first.
    d1, i1 = neighbors.knn(q, qv, p, pv, k=5)
    d2, i2 = knn_pallas(q, qv, p, pv, k=5)
    same = np.mean([set(np.asarray(a)) == set(np.asarray(b))
                    for a, b in zip(np.asarray(i1), np.asarray(i2))])
    print(f"index agreement: {100*same:.2f}%", flush=True)

    @jax.jit
    def xla_loop():
        def body(c, _):
            d, i = neighbors.knn(q + c, qv, p, pv, k=5)
            return c + 1e-9 * d[0, 0].astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
        return s

    @jax.jit
    def pallas_loop():
        def body(c, _):
            d, i = knn_pallas(q + c, qv, p, pv, k=5)
            return c + 1e-9 * d[0, 0], None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
        return s

    timeit_loop("XLA knn 5120x20k", xla_loop, 20)
    timeit_loop("Pallas knn 5120x20k", pallas_loop, 20)


if __name__ == "__main__":
    main()
