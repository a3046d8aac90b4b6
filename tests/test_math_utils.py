"""Unit tests for quaternion / SO(3) / coordinate utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glio_tpu.utils import quat, so3, coords


RNG = np.random.default_rng(0)


def rand_quat(n=()):
    q = RNG.normal(size=n + (4,))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def rand_vec(n=()):
    return jnp.asarray(RNG.normal(size=n + (3,)))


class TestQuat:
    def test_mul_identity(self):
        q = rand_quat((5,))
        e = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quat.mul(q, jnp.broadcast_to(e, q.shape)), q, atol=1e-12)

    def test_numpy_twins_match_jax(self):
        """mul_np / rotate_np (host-side scalar helpers used by the
        warm-start hop chaining) must match the jax formulas exactly."""
        q1, q2 = np.asarray(rand_quat()), np.asarray(rand_quat())
        v = np.asarray(rand_vec())
        np.testing.assert_allclose(quat.mul_np(q1, q2),
                                   np.asarray(quat.mul(jnp.asarray(q1),
                                                       jnp.asarray(q2))),
                                   atol=1e-15)
        np.testing.assert_allclose(quat.rotate_np(q1, v),
                                   np.asarray(quat.rotate(jnp.asarray(q1),
                                                          jnp.asarray(v))),
                                   atol=1e-15)

    def test_mul_conj_is_identity(self):
        q = rand_quat((5,))
        qq = quat.mul(q, quat.conj(q))
        np.testing.assert_allclose(qq[..., 0], 1.0, atol=1e-12)
        np.testing.assert_allclose(qq[..., 1:], 0.0, atol=1e-12)

    def test_rotate_matches_rotmat(self):
        q = rand_quat((7,))
        v = rand_vec((7,))
        r1 = quat.rotate(q, v)
        r2 = jnp.einsum("nij,nj->ni", quat.to_rotmat(q), v)
        np.testing.assert_allclose(r1, r2, atol=1e-12)

    def test_rotate_matches_sandwich(self):
        q = rand_quat((7,))
        v = rand_vec((7,))
        vq = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
        sandwich = quat.mul(quat.mul(q, vq), quat.conj(q))[..., 1:]
        np.testing.assert_allclose(quat.rotate(q, v), sandwich, atol=1e-12)

    def test_from_rotmat_roundtrip(self):
        q = quat.positive_hemisphere(rand_quat((50,)))
        q2 = quat.from_rotmat(quat.to_rotmat(q))
        np.testing.assert_allclose(q2, q, atol=1e-9)

    def test_from_rotmat_near_pi(self):
        # Rotations near 180° exercise the non-trace branches.
        for axis in np.eye(3):
            th = jnp.asarray(axis * (np.pi - 1e-7))
            q = quat.exp(th)
            q2 = quat.from_rotmat(quat.to_rotmat(q))
            np.testing.assert_allclose(
                quat.positive_hemisphere(q2), quat.positive_hemisphere(q), atol=1e-6)

    def test_exp_log_roundtrip(self):
        # log returns the principal rotation vector; stay inside |θ| < π.
        th = rand_vec((20,))
        th = th / jnp.linalg.norm(th, axis=-1, keepdims=True) * jnp.asarray(
            RNG.uniform(0.0, 3.1, size=(20, 1)))
        np.testing.assert_allclose(quat.log(quat.exp(th)), th, atol=1e-9)

    def test_exp_small_angle(self):
        th = rand_vec((5,)) * 1e-10
        np.testing.assert_allclose(quat.exp(th)[..., 1:], th / 2, atol=1e-15)

    def test_delta_q_first_order(self):
        th = rand_vec((5,)) * 1e-5
        np.testing.assert_allclose(quat.delta_q(th), quat.exp(th), atol=1e-11)

    def test_qleft_qright(self):
        q, p = rand_quat((4,)), rand_quat((4,))
        m = quat.mul(q, p)
        np.testing.assert_allclose(
            jnp.einsum("nij,nj->ni", quat.qleft(q), p), m, atol=1e-12)
        np.testing.assert_allclose(
            jnp.einsum("nij,nj->ni", quat.qright(p), q), m, atol=1e-12)

    def test_ypr_roundtrip(self):
        ypr = jnp.asarray(RNG.uniform(-1.0, 1.0, size=(10, 3)))
        q = quat.from_ypr(ypr)
        np.testing.assert_allclose(quat.to_ypr(q), ypr, atol=1e-10)

    def test_slerp_endpoints(self):
        q0, q1 = rand_quat((3,)), rand_quat((3,))
        np.testing.assert_allclose(jnp.abs(jnp.sum(quat.slerp(q0, q1, 0.0) * q0, -1)), 1.0, atol=1e-10)
        np.testing.assert_allclose(jnp.abs(jnp.sum(quat.slerp(q0, q1, 1.0) * q1, -1)), 1.0, atol=1e-10)

    def test_g2q(self):
        g = jnp.array([0.3, -0.2, 9.7])
        q = quat.g2q(g)
        aligned = quat.rotate(q, g / jnp.linalg.norm(g))
        np.testing.assert_allclose(aligned, [0, 0, 1.0], atol=1e-8)
        np.testing.assert_allclose(quat.to_ypr(q)[0], 0.0, atol=1e-8)


class TestSO3:
    def test_hat_cross(self):
        a, b = rand_vec((6,)), rand_vec((6,))
        np.testing.assert_allclose(
            jnp.einsum("nij,nj->ni", so3.hat(a), b), jnp.cross(a, b), atol=1e-12)

    def test_vee_hat(self):
        a = rand_vec((6,))
        np.testing.assert_allclose(so3.vee(so3.hat(a)), a, atol=1e-12)

    def test_exp_log_roundtrip(self):
        th = rand_vec((10,))
        np.testing.assert_allclose(so3.log(so3.exp(th)), th, atol=1e-9)

    def test_left_jacobian_numeric(self):
        # exp(θ + δ) ≈ exp((Jl(θ)... use the defining identity:
        # exp(θ+δ) ≈ exp(Jl(θ)δ) exp(θ) for small δ.
        th = rand_vec() * 0.8
        Jl = so3.left_jacobian(th)
        for i in range(3):
            d = jnp.zeros(3).at[i].set(1e-7)
            lhs = so3.exp(th + d)
            rhs = so3.exp(Jl @ d) @ so3.exp(th)
            np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_right_jacobian_numeric(self):
        th = rand_vec() * 0.8
        Jr = so3.right_jacobian(th)
        for i in range(3):
            d = jnp.zeros(3).at[i].set(1e-7)
            lhs = so3.exp(th + d)
            rhs = so3.exp(th) @ so3.exp(Jr @ d)
            np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_inv_right_jacobian(self):
        th = rand_vec() * 0.8
        np.testing.assert_allclose(
            so3.inv_right_jacobian(th) @ so3.right_jacobian(th), jnp.eye(3), atol=1e-9)


class TestCoords:
    def test_llh_ecef_roundtrip(self):
        # Hong Kong Whampoa-ish location.
        llh = jnp.array([np.deg2rad(22.3), np.deg2rad(114.19), 5.0])
        xyz = coords.llh2ecef(llh)
        back = coords.ecef2llh(xyz)
        np.testing.assert_allclose(back, llh, atol=1e-11)

    def test_known_ecef(self):
        # Equator / prime meridian at h=0 → (a, 0, 0).
        llh = jnp.array([0.0, 0.0, 0.0])
        np.testing.assert_allclose(
            coords.llh2ecef(llh), [coords.RE_WGS84, 0, 0], atol=1e-6)

    def test_enu_roundtrip(self):
        ref = coords.llh2ecef(jnp.array([np.deg2rad(22.3), np.deg2rad(114.19), 5.0]))
        p = ref + jnp.array([100.0, -50.0, 30.0])
        enu = coords.ecef2enu(p, ref)
        back = coords.enu2ecef(enu, ref)
        np.testing.assert_allclose(back, p, atol=1e-8)

    def test_enu_up_is_radial(self):
        ref = coords.llh2ecef(jnp.array([np.deg2rad(22.3), np.deg2rad(114.19), 5.0]))
        up_ecef = ref / jnp.linalg.norm(ref)
        enu = coords.ecef2enu(ref + 10.0 * up_ecef, ref)
        # Along geodetic up, E/N are small (geodetic vs geocentric latitude differ).
        assert abs(float(enu[2]) - 10.0) < 0.05

    def test_gpst_roundtrip(self):
        week, tow = 2158, 455342.266
        t = coords.gpst2unix(week, tow)
        w2, t2 = coords.unix2gpst(t)
        assert int(w2) == week
        np.testing.assert_allclose(t2, tow, atol=1e-6)

    def test_golden_csv_time_consistency(self):
        # First row of the reference tc_sw_result.csv:
        # local_time=1621578524.26653504, gps_week=2158, gps_tow=455342.26653504
        t = coords.gpst2unix(2158, 455342.26653504)
        # local_time in the CSV is gps-time-as-unix (no leap adjustment).
        np.testing.assert_allclose(t, 1621578524.26653504, atol=1e-6)

    def test_sat_azel_zenith(self):
        ref = coords.llh2ecef(jnp.array([np.deg2rad(22.3), np.deg2rad(114.19), 5.0]))
        llh = coords.ecef2llh(ref)
        up = coords.enu2ecef(jnp.array([0.0, 0.0, 2e7]), ref)
        az, el = coords.sat_azel(ref, up)
        np.testing.assert_allclose(el, np.pi / 2, atol=1e-6)


def test_vmap_jit_composability():
    q = rand_quat((16,))
    v = rand_vec((16,))
    f = jax.jit(jax.vmap(quat.rotate))
    np.testing.assert_allclose(f(q, v), quat.rotate(q, v), atol=1e-12)
