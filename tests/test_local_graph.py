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


def test_short_segment_ties_right_keyframe():
    """A segment with fewer hops than the budget (ADVICE r2 medium):
    the terminal measured hop must anchor the RIGHT keyframe, not a
    padded phantom interior frame. Invariance oracle: the same 3-hop
    segment solved under budget max_dense=2 (exact fit — the known-good
    full-segment path) and under budget max_dense=4 (short segment) must
    give identical interior poses."""
    p_true = np.array([[0.0, 0, 0], [1.0, 0.2, 0], [2.0, 0.1, 0],
                       [3.0, -0.1, 0]])
    kf_p = jnp.asarray(p_true[[0, 3]])
    kf_q = jnp.asarray(np.tile([1.0, 0, 0, 0], (2, 1)))
    bias = np.array([0.3, 0.0, 0.0])  # per-hop drift → 0.9 m misclosure

    def solve(S):
        rel_dp = np.zeros((1, S + 1, 3))
        rel_dq = np.zeros((1, S + 1, 4))
        rel_dq[..., 0] = 1.0
        rel_valid = np.zeros((1, S + 1), bool)
        for j in range(3):  # left-packed hops 0..2; hop 2 → right kf
            rel_dp[0, j] = p_true[j + 1] - p_true[j] + bias
            rel_valid[0, j] = True
        return local_graph.interpolate_segments(
            kf_p, kf_q, jnp.asarray(rel_dp), jnp.asarray(rel_dq),
            jnp.asarray(rel_valid), max_dense=S)

    p_ref, q_ref, _ = solve(2)   # budget exactly fits: 3 hops, 2 interior
    p_big, q_big, valid = solve(4)
    np.testing.assert_allclose(np.asarray(p_big[0, :2]),
                               np.asarray(p_ref[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(q_big[0, :2]),
                               np.asarray(q_ref[0]), atol=1e-8)
    # And the misclosure IS being distributed: interior 1 must not sit at
    # the left-chained position truth + 2*bias (the pre-fix behavior).
    chained = p_true[2] + 2 * bias
    assert np.linalg.norm(np.asarray(p_big[0, 1]) - chained) > 0.2
    assert bool(valid[0, 0]) and bool(valid[0, 1])
