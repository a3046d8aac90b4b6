"""Loosely-coupled GNSS/LIO pose-graph fusion.

Capability counterpart of the reference's GTSAM/iSAM2 backend
(``Estimator.cpp:1915-2043, 4561-4581``), which produces
``lc_result.csv``:

* odometry chain: prior on the first pose + between-factors from LIO
  (``addLIOFactor``),
* GNSS position factors from RTK/SPP fixes, added when the fix covariance
  passes ``gnssCovThreshold`` and poses are spaced ≥ 5 m
  (``addGNSSFactor`` :1915-1997),
* incremental re-linearization (iSAM2 update ×5 whenever GNSS arrives).

TPU-native design: the pose graph is a chain → its normal equations are
block-tridiagonal. Instead of an incremental Bayes tree (pointer-heavy,
sequential), each update re-solves the WHOLE chain with damped GN over
the banded system (``solver.banded``); warm-started PCG makes the full
re-solve cheaper than incremental bookkeeping at this scale, and it maps
onto the same time-sharded multi-chip path as the batch stage.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..solver import banded
from ..utils import quat

F64 = jnp.float64
DOF = 6


class LcProblem(NamedTuple):
    # Between measurements i → i+1 (from LIO odometry).
    rel_dp: jnp.ndarray       # (T-1, 3)
    rel_dq: jnp.ndarray       # (T-1, 4)
    w_rel_p: jnp.ndarray      # () or (T-1,) translation weight (1/σ)
    w_rel_q: jnp.ndarray      # () rotation weight
    # GNSS position fixes in the local frame.
    gnss_p: jnp.ndarray       # (T, 3)
    gnss_valid: jnp.ndarray   # (T,)
    w_gnss: jnp.ndarray       # (T,) per-fix weight (1/σ)
    # Prior on pose 0.
    p0: jnp.ndarray
    q0: jnp.ndarray


def build_problem(p_odo, q_odo, gnss_p, gnss_valid, gnss_sigma,
                  rel_sigma_p=0.1, rel_sigma_q=0.01,
                  min_spacing_m: float = 5.0) -> LcProblem:
    """Host-side construction, reproducing the reference's gating:
    GNSS factors only when fixes are ≥ min_spacing_m apart (:1939-1960)."""
    p_odo = np.asarray(p_odo, float)
    q_odo = np.asarray(q_odo, float)
    T = p_odo.shape[0]
    qj = jnp.asarray(q_odo)
    dq = quat.mul(quat.conj(qj[:-1]), qj[1:])
    dp = quat.rotate(quat.conj(qj[:-1]), jnp.asarray(p_odo[1:] - p_odo[:-1]))

    gnss_valid = np.asarray(gnss_valid, bool).copy()
    gnss_p = np.asarray(gnss_p, float)
    last = None
    for k in range(T):
        if not gnss_valid[k]:
            continue
        if last is not None and np.linalg.norm(gnss_p[k] - gnss_p[last]) < min_spacing_m:
            gnss_valid[k] = False
        else:
            last = k

    w_g = np.where(np.asarray(gnss_sigma) > 0,
                   1.0 / np.maximum(np.asarray(gnss_sigma), 1e-3), 0.0)
    return LcProblem(
        rel_dp=jnp.asarray(dp), rel_dq=jnp.asarray(dq),
        w_rel_p=jnp.asarray(1.0 / rel_sigma_p),
        w_rel_q=jnp.asarray(1.0 / rel_sigma_q),
        gnss_p=jnp.asarray(gnss_p),
        gnss_valid=jnp.asarray(gnss_valid),
        w_gnss=jnp.asarray(w_g),
        p0=jnp.asarray(p_odo[0]), q0=jnp.asarray(q_odo[0]))


def _gnss_irls(p, prob: LcProblem, huber: float):
    """Sqrt-Huber IRLS weights on the whitened GNSS fix norms (frozen per
    linearization). Guards the chain against gross fixes that passed the
    covariance gate — the role of the reference's iSAM marginal checks."""
    if huber <= 0.0:
        return jnp.ones(p.shape[0], F64)
    nrm = prob.w_gnss * jnp.linalg.norm(p - prob.gnss_p, axis=-1)
    w = jnp.sqrt(jnp.minimum(1.0, huber / jnp.maximum(nrm, 1e-9)))
    return jax.lax.stop_gradient(jnp.where(prob.gnss_valid, w, 1.0))


def _residual_cost(p, q, prob: LcProblem, w_irls=None):
    r_rel_q = prob.w_rel_q * 2.0 * quat.mul(
        quat.conj(prob.rel_dq), quat.mul(quat.conj(q[:-1]), q[1:]))[:, 1:]
    r_rel_p = prob.w_rel_p * (
        quat.rotate(quat.conj(q[:-1]), p[1:] - p[:-1]) - prob.rel_dp)
    wg = prob.w_gnss if w_irls is None else prob.w_gnss * w_irls
    r_g = wg[:, None] * jnp.where(
        prob.gnss_valid[:, None], p - prob.gnss_p, 0.0)
    r_prior = 1e3 * jnp.concatenate([
        p[0] - prob.p0,
        quat.log(quat.mul(quat.conj(prob.q0), q[0]))])
    return 0.5 * (jnp.sum(r_rel_q ** 2) + jnp.sum(r_rel_p ** 2)
                  + jnp.sum(r_g ** 2) + jnp.sum(r_prior ** 2))


def _assemble(p, q, prob: LcProblem, w_irls=None):
    """Band (hw=1) + gradient via per-edge autodiff."""
    T = p.shape[0]
    hw = 1
    band = jnp.zeros((T, 3, DOF, DOF), F64)
    grad = jnp.zeros((T, DOF), F64)
    zero = jnp.zeros(DOF, F64)

    def edge_res(di, dj, pi, qi, pj, qj, dpm, dqm):
        qi2 = quat.mul(qi, quat.exp(di[3:6]))
        qj2 = quat.mul(qj, quat.exp(dj[3:6]))
        pi2, pj2 = pi + di[:3], pj + dj[:3]
        rq = prob.w_rel_q * 2.0 * quat.mul(
            quat.conj(dqm), quat.mul(quat.conj(qi2), qj2))[1:]
        rp = prob.w_rel_p * (quat.rotate(quat.conj(qi2), pj2 - pi2) - dpm)
        return jnp.concatenate([rq, rp])

    res, (Ji, Jj) = jax.vmap(
        lambda pi, qi, pj, qj, dpm, dqm: (
            edge_res(zero, zero, pi, qi, pj, qj, dpm, dqm),
            jax.jacfwd(edge_res, argnums=(0, 1))(
                zero, zero, pi, qi, pj, qj, dpm, dqm)))(
        p[:-1], q[:-1], p[1:], q[1:], prob.rel_dp, prob.rel_dq)

    i_idx = jnp.arange(T - 1, dtype=jnp.int32)
    j_idx = i_idx + 1
    band = banded.scatter_add_blocks(
        band, i_idx, i_idx, jnp.einsum("nri,nrj->nij", Ji, Ji), hw)
    Hij = jnp.einsum("nri,nrj->nij", Ji, Jj)
    band = banded.scatter_add_blocks(band, i_idx, j_idx, Hij, hw)
    band = banded.scatter_add_blocks(
        band, j_idx, i_idx, jnp.swapaxes(Hij, -1, -2), hw)
    band = banded.scatter_add_blocks(
        band, j_idx, j_idx, jnp.einsum("nri,nrj->nij", Jj, Jj), hw)
    grad = grad.at[i_idx].add(jnp.einsum("nri,nr->ni", Ji, res))
    grad = grad.at[j_idx].add(jnp.einsum("nri,nr->ni", Jj, res))

    # GNSS unary factors (position only).
    w = jnp.where(prob.gnss_valid, prob.w_gnss, 0.0)
    if w_irls is not None:
        w = w * w_irls
    rg = w[:, None] * (p - prob.gnss_p)
    Hg = (w ** 2)[:, None, None] * jnp.eye(3, dtype=F64)
    band = band.at[:, hw, :3, :3].add(Hg)
    grad = grad.at[:, :3].add(w[:, None] * rg)

    # Prior on pose 0.
    band = band.at[0, hw].add(1e6 * jnp.eye(DOF, dtype=F64))
    dq0 = quat.log(quat.mul(quat.conj(prob.q0), q[0]))
    grad = grad.at[0].add(1e6 * jnp.concatenate([p[0] - prob.p0, dq0]))
    return band, grad


@partial(jax.jit, static_argnames=("gn_iters", "pcg_iters", "gnss_huber"))
def solve(prob: LcProblem, p0, q0, gn_iters: int = 8,
          pcg_iters: int = 250, gnss_huber: float = 0.0):
    def step(carry, _):
        p, q, lam, cost = carry
        w_irls = (_gnss_irls(p, prob, gnss_huber)
                  if gnss_huber > 0.0 else None)
        band, grad = _assemble(p, q, prob, w_irls)
        diag = band[:, 1]
        band2 = band.at[:, 1].add(
            lam * jnp.eye(DOF, dtype=F64)
            * jnp.maximum(jnp.diagonal(diag, axis1=-2, axis2=-1),
                          1.0)[..., :, None])
        # Exact log-depth cyclic reduction: the chain (hw=1) IS a block-
        # tridiagonal system — CR's native case. Replaces block-Jacobi
        # PCG, whose long-wavelength modes needed O(T) iterations on the
        # stiff odometry chain.
        dx = banded.cyclic_reduction_solve(band2, -grad)
        d = dx.reshape(-1, DOF)
        p_new = p + d[:, :3]
        q_new = quat.normalize(quat.mul(q, quat.exp(d[:, 3:6])))
        new_cost = _residual_cost(p_new, q_new, prob, w_irls)
        cost_cur = _residual_cost(p, q, prob, w_irls)
        better = new_cost < cost_cur
        p = jnp.where(better, p_new, p)
        q = jnp.where(better, q_new, q)
        cost = jnp.where(better, new_cost, cost_cur)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0), 1e-9, 1e6)
        return (p, q, lam, cost), cost

    cost0 = _residual_cost(p0, q0, prob)
    (p, q, _, cost), _ = jax.lax.scan(
        step, (p0, q0, jnp.asarray(1e-6, F64), cost0), None,
        length=gn_iters)
    return p, q, cost
