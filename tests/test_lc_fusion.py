"""Loosely-coupled pose-graph fusion tests."""

import jax.numpy as jnp
import numpy as np

from glio_tpu.models import lc_fusion
from glio_tpu.utils import quat


def _drifting_odometry(T=200, seed=0):
    """Ground-truth circle + odometry with injected drift."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, T)
    p_true = np.stack([30 * np.cos(t), 30 * np.sin(t), 0.1 * t], -1)
    yaw = t + np.pi / 2
    ypr = np.stack([yaw, np.zeros_like(yaw), np.zeros_like(yaw)], -1)
    q_true = np.asarray(quat.from_ypr(jnp.asarray(ypr)))
    # Odometry: integrate true relatives + small bias → drift.
    p_odo = [p_true[0]]
    q_odo = [q_true[0]]
    for k in range(1, T):
        dq = quat.mul(quat.conj(jnp.asarray(q_true[k - 1])), jnp.asarray(q_true[k]))
        dp = quat.rotate(quat.conj(jnp.asarray(q_true[k - 1])),
                         jnp.asarray(p_true[k] - p_true[k - 1]))
        dp = np.asarray(dp) + np.array([0.02, 0.005, 0.0])   # drift bias
        q_odo.append(np.asarray(quat.mul(jnp.asarray(q_odo[-1]), dq)))
        p_odo.append(p_odo[-1] + np.asarray(
            quat.rotate(jnp.asarray(q_odo[-1]), jnp.asarray(dp))))
    return p_true, q_true, np.array(p_odo), np.array(q_odo)


def test_gnss_fixes_remove_drift():
    T = 200
    p_true, q_true, p_odo, q_odo = _drifting_odometry(T)
    drift0 = np.linalg.norm(p_odo - p_true, axis=-1)
    assert drift0.max() > 3.0           # odometry alone drifts

    rng = np.random.default_rng(1)
    gnss_p = p_true + 0.5 * rng.normal(size=(T, 3))
    gnss_valid = np.zeros(T, bool)
    gnss_valid[::5] = True              # 3 Hz kf / ~1 Hz GNSS cadence
    sigma = np.full(T, 0.5)

    prob = lc_fusion.build_problem(p_odo, q_odo, gnss_p, gnss_valid, sigma,
                                   min_spacing_m=1.0)
    p, q, cost = lc_fusion.solve(prob, jnp.asarray(p_odo), jnp.asarray(q_odo))
    err = np.linalg.norm(np.asarray(p) - p_true, axis=-1)
    assert err.max() < 1.5, err.max()
    assert err.mean() < 0.5


def test_spacing_gate():
    p = np.zeros((10, 3))
    p[:, 0] = np.arange(10) * 2.0       # 2 m apart
    valid = np.ones(10, bool)
    prob = lc_fusion.build_problem(
        p, np.tile([1.0, 0, 0, 0], (10, 1)), p, valid, np.ones(10),
        min_spacing_m=5.0)
    used = np.asarray(prob.gnss_valid)
    # 2 m spacing with a 5 m gate → every 3rd fix survives.
    assert used.sum() == 4
    assert used[0] and used[3] and used[6] and used[9]
