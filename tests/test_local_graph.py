"""Dense inter-keyframe interpolation tests."""

import jax.numpy as jnp
import numpy as np

from glio_tpu.models import local_graph
from glio_tpu.utils import quat


def test_interpolation_recovers_smooth_path():
    rng = np.random.default_rng(2)
    T, S = 5, 3  # keyframes, interior frames per segment
    # Ground-truth dense path: straight line with mild yaw.
    n_dense = (T - 1) * (S + 1) + 1
    t = np.linspace(0, 1, n_dense)
    p_true = np.stack([10 * t, 2 * t ** 2, np.zeros_like(t)], -1)
    yaw = 0.3 * t
    q_true = np.asarray(quat.from_ypr(jnp.asarray(
        np.stack([yaw, 0 * yaw, 0 * yaw], -1))))

    kf_idx = np.arange(0, n_dense, S + 1)
    kf_p = jnp.asarray(p_true[kf_idx])
    kf_q = jnp.asarray(q_true[kf_idx])

    # Hop measurements along each segment (exact).
    rel_dp = np.zeros((T - 1, S + 1, 3))
    rel_dq = np.zeros((T - 1, S + 1, 4))
    rel_dq[..., 0] = 1.0
    rel_valid = np.ones((T - 1, S + 1), bool)
    for s in range(T - 1):
        base = kf_idx[s]
        for j in range(S + 1):
            a, b = base + j, base + j + 1
            qa = jnp.asarray(q_true[a])
            rel_dq[s, j] = np.asarray(quat.mul(quat.conj(qa),
                                               jnp.asarray(q_true[b])))
            rel_dp[s, j] = np.asarray(quat.rotate(
                quat.conj(qa), jnp.asarray(p_true[b] - p_true[a])))

    p_int, q_int, valid = local_graph.interpolate_segments(
        kf_p, kf_q, jnp.asarray(rel_dp), jnp.asarray(rel_dq),
        jnp.asarray(rel_valid), max_dense=S)
    assert p_int.shape == (T - 1, S, 3)
    for s in range(T - 1):
        for j in range(S):
            truth = p_true[kf_idx[s] + j + 1]
            np.testing.assert_allclose(np.asarray(p_int[s, j]), truth,
                                       atol=1e-6)


def test_interpolation_consistent_with_perturbed_measurements():
    """With noisy hops, interpolation stays anchored at the keyframes."""
    rng = np.random.default_rng(3)
    T, S = 3, 2
    kf_p = jnp.asarray(rng.normal(size=(T, 3)) * 5)
    kf_q = quat.normalize(jnp.asarray(rng.normal(size=(T, 4))))
    rel_dp = np.zeros((T - 1, S + 1, 3))
    rel_dq = np.zeros((T - 1, S + 1, 4))
    rel_dq[..., 0] = 1.0
    # Hops roughly spanning the keyframe gap.
    for s in range(T - 1):
        gap = np.asarray(quat.rotate(quat.conj(kf_q[s]),
                                     kf_p[s + 1] - kf_p[s]))
        for j in range(S + 1):
            rel_dp[s, j] = gap / (S + 1) + 0.05 * rng.normal(size=3)
    rel_valid = np.ones((T - 1, S + 1), bool)
    p_int, q_int, valid = local_graph.interpolate_segments(
        kf_p, kf_q, jnp.asarray(rel_dp), jnp.asarray(rel_dq),
        jnp.asarray(rel_valid), max_dense=S)
    # Interior points lie between the keyframes (no divergence).
    for s in range(T - 1):
        mid = 0.5 * (np.asarray(kf_p[s]) + np.asarray(kf_p[s + 1]))
        span = np.linalg.norm(np.asarray(kf_p[s + 1] - kf_p[s])) + 1.0
        assert np.linalg.norm(np.asarray(p_int[s, 0]) - mid) < span
