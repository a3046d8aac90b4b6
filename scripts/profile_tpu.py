"""In-graph TPU profiling: per-iteration costs of the sliding-window step's
components, measured inside one dispatch (the remote tunnel has ~30 ms
fixed per-call latency, so loops must live inside jit)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import time

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from glio_tpu.utils import quat
from glio_tpu.solver.manifold import WindowState, retract
from glio_tpu.solver import dense, marginalization
from glio_tpu.lidar import neighbors
from glio_tpu.factors import imu as imu_factors


def timeit_loop(name, fn, reps):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0 - 0.03) / reps * 1e3
    print(f"{name}: {dt:.3f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(5, 100, 3)))
    nrm = jnp.asarray(rng.normal(size=(5, 100, 3)))
    dvals = jnp.asarray(rng.normal(size=(5, 100)))
    x0 = WindowState.identity(5)

    def window_res(s):
        pw = quat.rotate(s.q[:, None, :], pts) + s.p[:, None, :]
        r_l = (jnp.sum(nrm * pw, -1) + dvals).reshape(-1)
        r_i = (s.v[1:] - s.v[:-1] + s.ba[:-1] - s.bg[:-1]).reshape(-1)
        return jnp.concatenate([r_l, r_i])

    @jax.jit
    def lm_50():
        def body(c, _):
            out = dense.lm_solve(window_res, retract, x0, 75, max_iters=1)
            return c + out.cost, None
        s, _ = jax.lax.scan(body, 0.0, None, length=50)
        return s
    timeit_loop("LM 1-iteration (jacfwd+JtJ+chol)", lm_50, 50)

    q = jnp.asarray(rng.normal(size=(5120, 3)), jnp.float32)
    p2 = jnp.asarray(rng.normal(size=(20480, 3)), jnp.float32)

    @jax.jit
    def knn_20():
        def body(c, _):
            d2, idx = neighbors.knn(q + c, jnp.ones(5120, bool), p2,
                                    jnp.ones(20480, bool), k=5)
            return c + 1e-9 * d2[0, 0].astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
        return s
    timeit_loop("knn 5120x20k", knn_20, 20)

    acc = jnp.asarray(rng.normal(size=(4, 40, 3)))
    gyr = acc * 0.01
    dts = jnp.full((4, 40), 0.01)
    val = jnp.ones((4, 40), bool)

    @jax.jit
    def pre_50():
        def body(c, _):
            pre = jax.vmap(lambda a, g, d, v: imu_factors.preintegrate(
                a, g, d, v, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
                jnp.zeros(3)))(acc + c, gyr, dts, val)
            return c + 1e-12 * pre.delta_p[0, 0], None
        s, _ = jax.lax.scan(body, 0.0, None, length=50)
        return s
    timeit_loop("preintegrate 4x40", pre_50, 50)

    H = jnp.asarray(rng.normal(size=(75, 75)))
    H = H @ H.T + 10 * jnp.eye(75)
    b = jnp.asarray(rng.normal(size=(75,)))

    @jax.jit
    def marg_50():
        def body(c, _):
            pr = marginalization.marginalize(H + c, b, 15)
            return c + 1e-12 * pr.sqrt_res[0], None
        s, _ = jax.lax.scan(body, 0.0, None, length=50)
        return s
    timeit_loop("marginalize (2x eigh 60-75)", marg_50, 50)


if __name__ == "__main__":
    main()
