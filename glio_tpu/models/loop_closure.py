"""Loop-closure detection, ICP verification, and pose-graph correction.

Counterpart of the reference's ``loopClosureThread``
(``Estimator.cpp:5090-5273``, params ``loop_closure_on``,
``lc_search_radius``=25 m, ``lc_map_width``=25, ``lc_icp_thres``=0.2,
``lc_time_thres``=30 s):

* detection: nearest past keyframe within the search radius and older
  than the time threshold — here vectorized over ALL keyframe pairs at
  once instead of a 1 Hz scan thread,
* verification: scan-to-local-map ICP around the candidate (same
  kNN + plane-fit + 6-dof LM machinery as the odometry frontend),
  accepting on mean point-to-plane fitness < ``lc_icp_thres``,
* correction: the chain pose graph plus accepted loop edges — loop
  edges break the banded structure, so the solve uses the
  banded-Cholesky + Woodbury low-rank update (``solver.banded``)
  instead of the reference's iSAM2 re-linearization.
"""

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GlioConfig
from ..lidar import neighbors, plane_fit
from ..solver import banded, dense
from ..utils import quat

F64 = jnp.float64
DOF = 6


class LoopCandidate(NamedTuple):
    cur: int
    old: int


def detect_loops(p, kf_time, search_radius=25.0, time_thresh=30.0,
                 stride: int = 10, max_loops: int = 10) -> List[LoopCandidate]:
    """Vectorized loop candidate detection (host-side, numpy).

    For every `stride`-th keyframe, the nearest keyframe at least
    `time_thresh` seconds older and within `search_radius` metres.
    """
    p = np.asarray(p)
    t = np.asarray(kf_time)
    out = []
    for i in range(0, p.shape[0], stride):
        old_mask = t < t[i] - time_thresh
        if not old_mask.any():
            continue
        d = np.linalg.norm(p[old_mask] - p[i], axis=-1)
        j = np.argmin(d)
        if d[j] < search_radius:
            out.append(LoopCandidate(cur=i, old=int(np.nonzero(old_mask)[0][j])))
    # Keep the best-spread few.
    return out[:max_loops]


def verify_loop(cfg: GlioConfig, scan_cur, scan_cur_valid, scans_old,
                scans_old_valid, p_old, q_old, p_init, q_init):
    """ICP the current scan against a local map around the old keyframe.

    scans_old: (W, S, 3) clouds of keyframes near the loop target with
    poses (p_old, q_old): (W, 3), (W, 4). Returns (rel_p, rel_q, fitness,
    accepted) where the relative pose maps old-keyframe frame → current.
    """
    est = cfg.estimator
    map_world = (quat.rotate(jnp.asarray(q_old)[:, None, :],
                             jnp.asarray(scans_old, F64))
                 + jnp.asarray(p_old)[:, None, :]).astype(jnp.float32)
    W, S = scans_old_valid.shape
    map_flat = map_world.reshape(W * S, 3)
    mv = jnp.asarray(scans_old_valid).reshape(W * S)
    scan64 = jnp.asarray(scan_cur, F64)
    sv = jnp.asarray(scan_cur_valid)

    def retract(x, dx):
        p, q = x
        return (p + dx[:3], quat.normalize(quat.mul(q, quat.exp(dx[3:6]))))

    p_c, q_c = jnp.asarray(p_init, F64), jnp.asarray(q_init, F64)
    fitness = jnp.asarray(1e9, F64)
    for _ in range(3):  # ICP outer rounds
        world_q = (quat.rotate(q_c, scan64) + p_c).astype(jnp.float32)
        d2, idx = neighbors.knn(world_q, sv, map_flat, mv, k=5)
        neigh = neighbors.gather_neighbors(map_flat, idx)
        fit = plane_fit.fit_planes(neigh, idx >= 0, world_q, plane_tol=0.1)
        good = fit.valid & sv & (fit.weight > 0.4)
        nrm = fit.normal.astype(F64)
        dpl = fit.d.astype(F64)

        def residual(x):
            p, q = x
            pw = quat.rotate(q, scan64) + p
            r = jnp.sum(nrm * pw, -1) + dpl
            r = jnp.where(good, r, 0.0)
            return r * dense.huber_weight(r, 0.2)

        out = dense.lm_solve(residual, retract, (p_c, q_c), 6, max_iters=8)
        p_c, q_c = out.x
        n = jnp.maximum(jnp.sum(good), 1)
        r = residual((p_c, q_c))
        fitness = jnp.sqrt(jnp.sum(r * r) / n)

    accepted = (fitness < est.lc_icp_thres) & (jnp.sum(sv) > 50)
    return p_c, q_c, fitness, accepted


def solve_with_loops(p_odo, q_odo, loop_edges: List[Tuple[int, int, np.ndarray, np.ndarray]],
                     w_rel_p=10.0, w_rel_q=100.0, w_loop=10.0,
                     gn_iters: int = 6):
    """Pose-graph solve: odometry chain + loop-closure edges.

    loop_edges: list of (i, j, dp_meas, dq_meas) with the measured relative
    pose of j in i's frame. Banded chain + Woodbury for loop rows.
    """
    p = jnp.asarray(p_odo, F64)
    q = jnp.asarray(q_odo, F64)
    T = p.shape[0]
    qj0 = q
    rel_dq = quat.mul(quat.conj(qj0[:-1]), qj0[1:])
    rel_dp = quat.rotate(quat.conj(qj0[:-1]), p[1:] - p[:-1])
    zero = jnp.zeros(DOF, F64)

    def edge_res(di, dj, pi, qi, pj, qj, dpm, dqm, wq, wp):
        qi2 = quat.mul(qi, quat.exp(di[3:6]))
        qj2 = quat.mul(qj, quat.exp(dj[3:6]))
        rq = wq * 2.0 * quat.mul(quat.conj(dqm),
                                 quat.mul(quat.conj(qi2), qj2))[1:]
        rp = wp * (quat.rotate(quat.conj(qi2), (pj + dj[:3]) - (pi + di[:3]))
                   - dpm)
        return jnp.concatenate([rq, rp])

    for _ in range(gn_iters):
        hw = 1
        band = jnp.zeros((T, 3, DOF, DOF), F64)
        grad = jnp.zeros((T, DOF), F64)
        res, (Ji, Jj) = jax.vmap(
            lambda pi, qi, pj, qj, dpm, dqm: (
                edge_res(zero, zero, pi, qi, pj, qj, dpm, dqm, w_rel_q, w_rel_p),
                jax.jacfwd(edge_res, argnums=(0, 1))(
                    zero, zero, pi, qi, pj, qj, dpm, dqm, w_rel_q, w_rel_p)))(
            p[:-1], q[:-1], p[1:], q[1:], rel_dp, rel_dq)
        i_idx = jnp.arange(T - 1, dtype=jnp.int32)
        j_idx = i_idx + 1
        Hij = jnp.einsum("nri,nrj->nij", Ji, Jj)
        band = banded.scatter_add_blocks(
            band, i_idx, i_idx, jnp.einsum("nri,nrj->nij", Ji, Ji), hw)
        band = banded.scatter_add_blocks(band, i_idx, j_idx, Hij, hw)
        band = banded.scatter_add_blocks(
            band, j_idx, i_idx, jnp.swapaxes(Hij, -1, -2), hw)
        band = banded.scatter_add_blocks(
            band, j_idx, j_idx, jnp.einsum("nri,nrj->nij", Jj, Jj), hw)
        grad = grad.at[i_idx].add(jnp.einsum("nri,nr->ni", Ji, res))
        grad = grad.at[j_idx].add(jnp.einsum("nri,nr->ni", Jj, res))
        # Anchor pose 0.
        band = band.at[0, hw].add(1e6 * jnp.eye(DOF, dtype=F64))

        # Loop rows (dense in block-row space, few of them).
        J_rows = []
        r_rows = []
        for (i, j, dpm, dqm) in loop_edges:
            res_l, (Jli, Jlj) = (
                edge_res(zero, zero, p[i], q[i], p[j], q[j],
                         jnp.asarray(dpm, F64), jnp.asarray(dqm, F64),
                         w_loop * 10, w_loop),
                jax.jacfwd(edge_res, argnums=(0, 1))(
                    zero, zero, p[i], q[i], p[j], q[j],
                    jnp.asarray(dpm, F64), jnp.asarray(dqm, F64),
                    w_loop * 10, w_loop))
            for row in range(6):
                Jr = jnp.zeros((T, DOF), F64)
                Jr = Jr.at[i].set(Jli[row]).at[j].set(Jlj[row])
                J_rows.append(Jr)
                r_rows.append(res_l[row])
        if J_rows:
            J_extra = jnp.stack(J_rows)
            r_extra = jnp.stack(r_rows)
            dx = banded.woodbury_solve(
                band.at[:, hw].add(1e-6 * jnp.eye(DOF, dtype=F64)),
                -grad, J_extra, r_extra)
        else:
            dx = banded.direct_solve(
                band.at[:, hw].add(1e-6 * jnp.eye(DOF, dtype=F64)), -grad)
        d = dx.reshape(T, DOF)
        p = p + d[:, :3]
        q = quat.normalize(quat.mul(q, quat.exp(d[:, 3:6])))
    return p, q
