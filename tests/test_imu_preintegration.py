"""Tests for IMU preintegration against first-principles ground truth.

Strategy (SURVEY.md §4): the reference has no unit tests; we derive goldens
from the physics. A synthetic trajectory with known closed-form motion gives
exact (Δp, Δq, Δv); bias Jacobians are checked against finite differences of
the integrator itself; the residual must vanish at the true states.
"""

import jax.numpy as jnp
import numpy as np

from glio_tpu.factors import imu
from glio_tpu.utils import quat

PARAMS = imu.ImuParams()
G = PARAMS.gravity_vec()


def simulate(duration=1.0, n=200, omega=(0.1, -0.2, 0.3), acc_w=(0.5, 0.2, -0.3),
             ba=(0.0, 0.0, 0.0), bg=(0.0, 0.0, 0.0), seed=None):
    """Constant body-rate, constant world-acceleration trajectory.

    Returns IMU samples (including additive biases) and the true relative
    motion (Δp, Δq, Δv) in the frame-i body frame, gravity included the way
    the preintegration expects (measured specific force = R_wbᵀ(a_w + g)).
    """
    dt = duration / n
    omega = np.asarray(omega)
    acc_w_v = np.asarray(acc_w)
    ba, bg = np.asarray(ba), np.asarray(bg)

    ts = np.arange(n + 1) * dt
    qs = np.asarray(quat.exp(jnp.asarray(omega[None, :] * ts[:, None])))
    # World kinematics: v(t) = a t, p(t) = a t²/2 (starting at rest, origin).
    vs = acc_w_v[None, :] * ts[:, None]
    ps = 0.5 * acc_w_v[None, :] * ts[:, None] ** 2

    g = np.asarray(G)
    Rwb = np.asarray(quat.to_rotmat(jnp.asarray(qs)))          # (n+1, 3, 3)
    acc_meas = np.einsum("kij,j->ki", Rwb.transpose(0, 2, 1), acc_w_v + g) + ba
    gyr_meas = np.broadcast_to(omega + bg, (n + 1, 3)).copy()

    # True preintegrated deltas (frame i = index 0; q0 = identity).
    dq_true = qs[-1]
    dv_true = vs[-1] - vs[0] + g * duration          # R_i=I
    dp_true = ps[-1] - ps[0] - vs[0] * duration + 0.5 * g * duration**2
    return (
        jnp.asarray(acc_meas[1:]), jnp.asarray(gyr_meas[1:]),
        jnp.full((n,), dt), jnp.ones((n,), bool),
        jnp.asarray(acc_meas[0]), jnp.asarray(gyr_meas[0]),
        (jnp.asarray(dp_true), jnp.asarray(dq_true), jnp.asarray(dv_true)),
        (ps, qs, vs, duration),
    )


def test_preintegration_matches_closed_form():
    acc, gyr, dt, valid, a0, g0, truth, _ = simulate()
    pre = imu.preintegrate(acc, gyr, dt, valid, jnp.zeros(3), jnp.zeros(3), a0, g0)
    dp, dq, dv = truth
    np.testing.assert_allclose(pre.delta_p, dp, atol=5e-5)
    np.testing.assert_allclose(pre.delta_v, dv, atol=5e-5)
    np.testing.assert_allclose(
        quat.positive_hemisphere(pre.delta_q), quat.positive_hemisphere(dq), atol=5e-6)


def test_padding_mask_is_noop():
    acc, gyr, dt, valid, a0, g0, truth, _ = simulate(n=100)
    pre1 = imu.preintegrate(acc, gyr, dt, valid, jnp.zeros(3), jnp.zeros(3), a0, g0)
    # Pad with garbage samples marked invalid.
    pad = 37
    acc_p = jnp.concatenate([acc, jnp.full((pad, 3), 123.0)])
    gyr_p = jnp.concatenate([gyr, jnp.full((pad, 3), -9.0)])
    dt_p = jnp.concatenate([dt, jnp.full((pad,), 0.5)])
    valid_p = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    pre2 = imu.preintegrate(acc_p, gyr_p, dt_p, valid_p, jnp.zeros(3), jnp.zeros(3), a0, g0)
    np.testing.assert_allclose(pre2.delta_p, pre1.delta_p, atol=1e-14)
    np.testing.assert_allclose(pre2.delta_q, pre1.delta_q, atol=1e-14)
    np.testing.assert_allclose(pre2.covariance, pre1.covariance, atol=1e-16)
    np.testing.assert_allclose(pre2.sum_dt, pre1.sum_dt, atol=1e-14)


def test_covariance_psd_and_growth():
    acc, gyr, dt, valid, a0, g0, _, _ = simulate()
    pre = imu.preintegrate(acc, gyr, dt, valid, jnp.zeros(3), jnp.zeros(3), a0, g0)
    w = np.linalg.eigvalsh(np.asarray(pre.covariance))
    assert w.min() > 0
    # Position uncertainty must exceed the 1e-3 seed after 1 s of noise.
    assert np.all(np.diag(pre.covariance)[:3] >= 1e-3)


def test_bias_jacobian_matches_finite_difference():
    acc, gyr, dt, valid, a0, g0, _, _ = simulate(n=50)
    ba = jnp.zeros(3)
    bg = jnp.zeros(3)
    pre = imu.preintegrate(acc, gyr, dt, valid, ba, bg, a0, g0)
    eps = 1e-6
    # ba enters the recursion linearly → the propagated Jacobian is the
    # exact derivative of the discrete integrator.  bg feeds through the
    # rotation chain, where the propagation (like the reference's) uses the
    # first-order transition I − ω̂dt → ~0.1% linearization error by design.
    tol = {"ba": 1e-6, "bg": 2e-2}
    for comp, off in (("ba", imu.O_BA), ("bg", imu.O_BG)):
        for i in range(3):
            dba = jnp.zeros(3).at[i].set(eps) if comp == "ba" else jnp.zeros(3)
            dbg = jnp.zeros(3).at[i].set(eps) if comp == "bg" else jnp.zeros(3)
            pre2 = imu.preintegrate(acc, gyr, dt, valid, ba + dba, bg + dbg, a0, g0)
            fd_p = (pre2.delta_p - pre.delta_p) / eps
            fd_v = (pre2.delta_v - pre.delta_v) / eps
            col = off + i
            np.testing.assert_allclose(
                pre.jacobian[imu.O_P:imu.O_P+3, col], fd_p, atol=tol[comp])
            np.testing.assert_allclose(
                pre.jacobian[imu.O_V:imu.O_V+3, col], fd_v, atol=tol[comp])
            if comp == "bg":
                fd_q = quat.log(quat.mul(quat.conj(pre.delta_q), pre2.delta_q)) / eps
                np.testing.assert_allclose(
                    pre.jacobian[imu.O_R:imu.O_R+3, col], fd_q, atol=tol[comp])


def test_residual_zero_at_truth():
    acc, gyr, dt, valid, a0, g0, truth, traj = simulate()
    pre = imu.preintegrate(acc, gyr, dt, valid, jnp.zeros(3), jnp.zeros(3), a0, g0)
    ps, qs, vs, duration = traj
    z3 = jnp.zeros(3)
    r = imu.residual(
        pre,
        jnp.asarray(ps[0]), jnp.asarray(qs[0]), jnp.asarray(vs[0]), z3, z3,
        jnp.asarray(ps[-1]), jnp.asarray(qs[-1]), jnp.asarray(vs[-1]), z3, z3,
        gravity=G)
    np.testing.assert_allclose(r, 0.0, atol=1e-4)


def test_residual_bias_correction_consistency():
    """Integrating WITH bias b and evaluating at states with bias-estimate b
    must agree (to first order) with the bias-corrected residual path."""
    ba_t, bg_t = (0.02, -0.01, 0.03), (0.004, 0.002, -0.003)
    acc, gyr, dt, valid, a0, g0, truth, traj = simulate(ba=ba_t, bg=bg_t)
    # Linearize at zero bias, evaluate residual at the true bias.
    pre = imu.preintegrate(acc, gyr, dt, valid, jnp.zeros(3), jnp.zeros(3), a0, g0)
    ps, qs, vs, duration = traj
    ba = jnp.asarray(ba_t)
    bg = jnp.asarray(bg_t)
    r = imu.residual(
        pre,
        jnp.asarray(ps[0]), jnp.asarray(qs[0]), jnp.asarray(vs[0]), ba, bg,
        jnp.asarray(ps[-1]), jnp.asarray(qs[-1]), jnp.asarray(vs[-1]), ba, bg,
        gravity=G)
    # First-order bias correction: residual small but not exactly zero.
    assert float(jnp.max(jnp.abs(r))) < 5e-3


def test_whitened_norm_matches_reference_whitening():
    """Our sqrt-info differs from the reference's by an orthogonal factor;
    the whitened norm (what the optimizer minimizes) must be identical."""
    acc, gyr, dt, valid, a0, g0, _, traj = simulate()
    pre = imu.preintegrate(acc, gyr, dt, valid, jnp.zeros(3), jnp.zeros(3), a0, g0)
    S = np.asarray(imu.sqrt_info(pre))
    C = np.asarray(pre.covariance)
    Cinv = np.linalg.inv(C)
    np.testing.assert_allclose(S.T @ S, Cinv, atol=1e-6 * np.abs(Cinv).max())

    # Reference form: LLT(C⁻¹).matrixL().T
    Lref = np.linalg.cholesky(np.linalg.inv(C))
    r = np.random.default_rng(1).normal(size=15)
    np.testing.assert_allclose(
        np.linalg.norm(S @ r), np.linalg.norm(Lref.T @ r), rtol=1e-8)


def test_fast_f32_path_matches_sequential_f64():
    """`cov_dtype=float32` routes through the associative-scan fast path
    (the production sliding-window configuration); its Jacobian and
    covariance must match the sequential f64 midpoint propagation to f32
    accuracy on a run with masked padding (ADVICE r2: direct coverage of
    the combine/prepend logic and masking semantics)."""
    rng = np.random.default_rng(11)
    n, n_valid = 64, 49
    acc = jnp.asarray(rng.normal(0.0, 2.0, (n, 3)) + np.array([0, 0, 9.8]))
    gyr = jnp.asarray(rng.normal(0.0, 0.5, (n, 3)))
    dt = jnp.asarray(np.full(n, 0.01) + rng.uniform(0, 0.002, n))
    valid = jnp.asarray(np.arange(n) < n_valid)
    ba = jnp.asarray([0.02, -0.01, 0.015])
    bg = jnp.asarray([-0.004, 0.002, 0.001])
    acc0 = acc[0] + 0.1
    gyr0 = gyr[0] - 0.05

    ref = imu.preintegrate(acc, gyr, dt, valid, ba, bg, acc0, gyr0,
                           params=PARAMS, cov_dtype=jnp.float64)
    fast = imu.preintegrate(acc, gyr, dt, valid, ba, bg, acc0, gyr0,
                            params=PARAMS, cov_dtype=jnp.float32)

    # Delta states agree tightly (both integrate the means in f64).
    np.testing.assert_allclose(np.asarray(fast.delta_p), np.asarray(ref.delta_p),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fast.delta_q), np.asarray(ref.delta_q),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fast.delta_v), np.asarray(ref.delta_v),
                               atol=1e-9)
    # Jacobian / covariance: f32 relative agreement, scaled per-matrix.
    J_r, J_f = np.asarray(ref.jacobian), np.asarray(fast.jacobian)
    C_r, C_f = np.asarray(ref.covariance), np.asarray(fast.covariance)
    assert np.max(np.abs(J_f - J_r)) / max(np.max(np.abs(J_r)), 1.0) < 1e-5
    assert np.max(np.abs(C_f - C_r)) / max(np.max(np.abs(C_r)), 1e-12) < 1e-4
    # The whitening built from them agrees too (what the factor consumes).
    S_r = np.asarray(imu.sqrt_info(ref))
    S_f = np.asarray(imu.sqrt_info(fast))
    assert (np.max(np.abs(S_f - S_r)) / max(np.max(np.abs(S_r)), 1.0)
            < 1e-3)
