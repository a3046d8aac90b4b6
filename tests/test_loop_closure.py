"""Loop closure: detection, ICP verification, Woodbury pose-graph solve."""

import jax.numpy as jnp
import numpy as np

from glio_tpu.config import GlioConfig, ShapeConfig
from glio_tpu.data.simulator import simulate_episode, PlaneWorld, _quat_rotmat
from glio_tpu.models import loop_closure
from glio_tpu.solver import banded
from glio_tpu.utils import quat


def test_detect_loops_revisit():
    # Out-and-back path: end revisits the start after 40 s.
    T = 120
    t = np.arange(T) / 3.0
    x = np.concatenate([np.linspace(0, 60, T // 2),
                        np.linspace(60, 0, T - T // 2)])
    p = np.stack([x, np.zeros(T), np.zeros(T)], -1)
    loops = loop_closure.detect_loops(p, t, search_radius=10.0,
                                     time_thresh=20.0, stride=5)
    assert len(loops) > 0
    for lc in loops:
        assert t[lc.cur] - t[lc.old] > 20.0
        assert np.linalg.norm(p[lc.cur] - p[lc.old]) < 10.0


def test_woodbury_matches_dense():
    rng = np.random.default_rng(0)
    T, D, hw = 20, 6, 1
    B = 2 * hw + 1
    Hd = np.zeros((T * D, T * D))
    band = np.zeros((T, B, D, D))
    for t_ in range(T):
        for s_ in range(t_, min(T, t_ + hw + 1)):
            blk = rng.normal(size=(D, D)) * 0.2
            if s_ == t_:
                blk = blk @ blk.T + 5 * np.eye(D)
            Hd[t_*D:(t_+1)*D, s_*D:(s_+1)*D] = blk
            Hd[s_*D:(s_+1)*D, t_*D:(t_+1)*D] = blk.T
    for t_ in range(T):
        for o in range(B):
            s_ = t_ + o - hw
            if 0 <= s_ < T:
                band[t_, o] = Hd[t_*D:(t_+1)*D, s_*D:(s_+1)*D]
    # A long-range (loop) residual row block between poses 2 and 17.
    L = 6
    J = np.zeros((L, T, D))
    J[:, 2, :] = rng.normal(size=(L, D))
    J[:, 17, :] = rng.normal(size=(L, D))
    r = rng.normal(size=(L,))
    b = rng.normal(size=(T, D))

    x = loop_closure.banded.woodbury_solve(
        jnp.asarray(band), jnp.asarray(b), jnp.asarray(J), jnp.asarray(r))
    Jf = J.reshape(L, T * D)
    H_full = Hd + Jf.T @ Jf
    rhs = b.reshape(-1) - Jf.T @ r
    x_ref = np.linalg.solve(H_full, rhs)
    np.testing.assert_allclose(np.asarray(x).reshape(-1), x_ref, atol=1e-9)


def test_loop_correction_removes_drift():
    """Odometry with drift + one exact loop edge → endpoints reconciled."""
    T = 60
    # True square-ish loop returning to start.
    th = np.linspace(0, 2 * np.pi, T)
    p_true = np.stack([10 * np.sin(th), 10 * (1 - np.cos(th)),
                       np.zeros(T)], -1)
    q_true = np.tile([1.0, 0, 0, 0], (T, 1))
    # Drifted odometry: accumulate biased relatives.
    p_odo = [p_true[0]]
    for k in range(1, T):
        d = p_true[k] - p_true[k - 1] + np.array([0.05, 0.0, 0.0])
        p_odo.append(p_odo[-1] + d)
    p_odo = np.array(p_odo)
    assert np.linalg.norm(p_odo[-1] - p_true[-1]) > 2.0

    # Loop edge: last pose sees the first pose at the TRUE relative offset.
    dp = p_true[-1] - p_true[0]
    loop = [(T - 1, 0, -dp, np.array([1.0, 0, 0, 0]))]
    p, q = loop_closure.solve_with_loops(p_odo, q_true, loop, w_loop=50.0)
    p = np.asarray(p)
    # Endpoint error vs truth shrinks dramatically.
    assert np.linalg.norm(p[-1] - p[0] - dp) < 0.2


def test_verify_loop_accepts_true_revisit():
    cfg = GlioConfig().replace(shapes=ShapeConfig(scan_points=512))
    ep = simulate_episode(n_keyframes=6, scan_points=512, seed=9,
                          scan_noise=0.01, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0))
    # Current scan = keyframe 5; "old map" = keyframes 0..3 at true poses.
    p_c, q_c, fit, ok = loop_closure.verify_loop(
        cfg, ep.scan[5], ep.scan_valid[5],
        ep.scan[:4], ep.scan_valid[:4], ep.gt_p[:4], ep.gt_q[:4],
        ep.gt_p[5] + np.array([0.3, -0.2, 0.1]), ep.gt_q[5])
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(p_c), ep.gt_p[5], atol=0.15)
