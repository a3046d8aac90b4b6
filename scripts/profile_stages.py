"""Per-stage timing of the sliding-window step on the accelerator.

Times the fixed per-keyframe work (everything outside the LM iterations)
piece by piece: IMU propagation + preintegration, the local-map
transform, kNN association + plane fits + top-k, and marginalization.
Feeds the bench.py breakdown and the optimization roadmap.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
from glio_tpu.data.simulator import simulate_episode
from glio_tpu.factors import imu as imu_factors
from glio_tpu.factors import lidar as lidar_factors
from glio_tpu.lidar import neighbors, plane_fit
from glio_tpu.utils import quat

F64 = jnp.float64
F32 = jnp.float32

cfg = GlioConfig().replace(
    shapes=ShapeConfig(max_imu_per_interval=40, scan_points=1024,
                       map_points=16384),
    estimator=EstimatorConfig(local_map_width=20, sw_max_iter=15))
est = cfg.estimator
K, S, M, NI = 5, 1024, 20, 40
params = imu_factors.ImuParams(cfg.imu.acc_n, cfg.imu.gyr_n,
                               cfg.imu.acc_w, cfg.imu.gyr_w,
                               cfg.imu.gravity)

rng = np.random.default_rng(0)
q_lb = jnp.asarray(est.ql2b, F64)
t_lb = jnp.asarray(est.tl2b, F64)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    return 1e3 * (time.perf_counter() - t0) / n


# --- 1. preintegration (K-1 edges, NI samples each) ---
acc = jnp.asarray(rng.normal(size=(K - 1, NI, 3)))
gyr = jnp.asarray(rng.normal(size=(K - 1, NI, 3)) * 0.1)
dts = jnp.full((K - 1, NI), 0.01)
val = jnp.ones((K - 1, NI), bool)
zero3 = jnp.zeros((K - 1, 3))


def make_preint(cov_dtype):
    @jax.jit
    def preint_all(acc, gyr, dts, val):
        def one(a, g, d, v, ba, bg):
            return imu_factors.preintegrate(a, g, d, v, ba, bg, a[0], g[0],
                                            params=params,
                                            cov_dtype=cov_dtype)
        pres = jax.vmap(one)(acc, gyr, dts, val, zero3, zero3)
        return jax.vmap(imu_factors.sqrt_info)(pres)
    return preint_all


print("preint seq f64         %.2f ms" % timeit(
    make_preint(jnp.float64), acc, gyr, dts, val))
print("preint assoc-scan f32  %.2f ms" % timeit(
    make_preint(jnp.float32), acc, gyr, dts, val))

# --- 2. map transform (M scans, f64 vs f32) ---
map_scans = jnp.asarray(rng.normal(size=(M, S, 3)), F32)
map_p = jnp.asarray(rng.normal(size=(M, 3)))
map_q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (M, 1))


@jax.jit
def map_tf_f64(scans, p, q):
    body = lidar_factors.body_from_lidar(scans.astype(F64), q_lb, t_lb)
    return (quat.rotate(q[:, None, :], body) + p[:, None, :]).astype(F32)


@jax.jit
def map_tf_f32(scans, p, q):
    body = lidar_factors.body_from_lidar(scans, q_lb.astype(F32),
                                         t_lb.astype(F32))
    return (quat.rotate(q[:, None, :].astype(F32), body)
            + p[:, None, :].astype(F32))


print("map transform f64      %.2f ms" % timeit(map_tf_f64, map_scans, map_p, map_q))
print("map transform f32      %.2f ms" % timeit(map_tf_f32, map_scans, map_p, map_q))

# --- 3. association: knn + plane fits + topk ---
world = jnp.asarray(rng.normal(size=(K * S, 3)) * 20, F32)
wvalid = jnp.ones((K * S,), bool)
mpts = jnp.asarray(rng.normal(size=(M * S, 3)) * 20, F32)
mvalid = jnp.ones((M * S,), bool)


@jax.jit
def assoc(world, wvalid, mpts, mvalid):
    d2, idx = neighbors.knn(world, wvalid, mpts, mvalid, k=5)
    neigh = neighbors.gather_neighbors(mpts, idx)
    fit = plane_fit.fit_planes(neigh, idx >= 0, world,
                               plane_tol=est.surf_dist_thres)
    w = jnp.where(fit.valid, fit.weight, -1.0).reshape(K, S)
    return jax.lax.top_k(w, 100)


print("knn+planes+topk        %.2f ms" % timeit(assoc, world, wvalid, mpts, mvalid))


@jax.jit
def knn_only(world, wvalid, mpts, mvalid):
    return neighbors.knn(world, wvalid, mpts, mvalid, k=5)


print("  knn only             %.2f ms" % timeit(knn_only, world, wvalid, mpts, mvalid))

# --- 4. marginalization-style jacfwd (75-dim f32 J of ~700 rows) ---
from glio_tpu.solver.manifold import WindowState, retract, POSE_DOF
w0 = WindowState.identity(K)
pts = jnp.asarray(rng.normal(size=(100, 3)))
nrm = jnp.asarray(rng.normal(size=(100, 3)))
dpl = jnp.asarray(rng.normal(size=(100,)))
sc = jnp.ones((100,))
msk = jnp.ones((100,), bool)


@jax.jit
def marg_jac(w):
    def res_fn(d32):
        s = retract(w, d32.astype(F64))
        s32 = jax.tree.map(lambda a: a.astype(F32), s)
        r = lidar_factors.plane_norm_residual(
            pts.astype(F32), nrm.astype(F32), dpl.astype(F32),
            sc.astype(F32), s32.p[0], s32.q[0], q_lb.astype(F32),
            t_lb.astype(F32), msk)
        return r
    return jax.jacfwd(res_fn)(jnp.zeros(K * POSE_DOF, F32))


print("marg-style jacfwd      %.2f ms" % timeit(marg_jac, w0))

# --- 5. 75-dim refined Cholesky solve ---
from glio_tpu.solver import linalg
A = jnp.asarray(rng.normal(size=(75, 75)))
H = A @ A.T + 75 * jnp.eye(75)
b = jnp.asarray(rng.normal(size=(75,)))


@jax.jit
def solve(H, b):
    return linalg.spd_solve_refined(H, b)


print("75-dim refined solve   %.2f ms" % timeit(solve, H, b))

# --- 6. full marginalization (15-dof drop from the 75-dim window H) ---
from glio_tpu.solver import marginalization


@jax.jit
def marg(H, b):
    pr = marginalization.marginalize(H, b, 15)
    return pr.sqrt_jac, pr.sqrt_res


print("marginalize 75→60      %.2f ms" % timeit(marg, H, b))


@jax.jit
def eigh15(H):
    return jnp.linalg.eigh(H[:15, :15].astype(jnp.float32))


print("  15-dim f32 eigh      %.2f ms" % timeit(eigh15, H))

# --- 7. f64 window residual evaluation (cost check per LM accept) ---
@jax.jit
def quat_chain(q):
    # Stand-in for the f64 quaternion-heavy residual path: K·S rotations.
    return quat.rotate(q[:, None, :], jnp.ones((K, S, 3)))


print("K·S f64 quat rotate    %.2f ms" % timeit(
    quat_chain, jnp.tile(jnp.array([1.0, 0, 0, 0]), (K, 1))))
