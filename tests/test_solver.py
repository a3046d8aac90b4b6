"""Tests for the dense manifold LM/dogleg engine and marginalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glio_tpu.solver import banded, dense, marginalization
from glio_tpu.solver.manifold import WindowState, retract, local_coordinates, POSE_DOF
from glio_tpu.utils import quat


def _rosenbrock_problem():
    def residual(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    def retract_fn(x, d):
        return x + d

    return residual, retract_fn, jnp.array([-1.2, 1.0])


def test_lm_rosenbrock():
    res, ret, x0 = _rosenbrock_problem()
    out = dense.lm_solve(res, ret, x0, 2, max_iters=60)
    np.testing.assert_allclose(out.x, [1.0, 1.0], atol=1e-6)
    assert out.cost < 1e-12


def test_dogleg_rosenbrock():
    res, ret, x0 = _rosenbrock_problem()
    out = dense.dogleg_solve(res, ret, x0, 2, max_iters=60)
    np.testing.assert_allclose(out.x, [1.0, 1.0], atol=1e-6)


def test_lm_jits():
    res, ret, x0 = _rosenbrock_problem()
    f = jax.jit(lambda x: dense.lm_solve(res, ret, x, 2, max_iters=60).x)
    np.testing.assert_allclose(f(x0), [1.0, 1.0], atol=1e-5)


def test_pose_graph_on_manifold():
    """3-keyframe chain: prior on kf0 + relative pose measurements recover
    ground-truth poses from a perturbed start."""
    rng = np.random.default_rng(3)
    K = 3
    p_true = jnp.asarray(rng.normal(size=(K, 3)))
    q_true = quat.normalize(jnp.asarray(rng.normal(size=(K, 4))))

    dp = quat.rotate(quat.conj(q_true[:-1]), p_true[1:] - p_true[:-1])
    dq = quat.mul(quat.conj(q_true[:-1]), q_true[1:])

    def residual(state):
        r_prior = jnp.concatenate([
            state.p[0] - p_true[0],
            quat.log(quat.mul(quat.conj(q_true[0]), state.q[0])),
        ])
        rel_p = quat.rotate(quat.conj(state.q[:-1]), state.p[1:] - state.p[:-1]) - dp
        rel_q = quat.mul(quat.conj(dq), quat.mul(quat.conj(state.q[:-1]), state.q[1:]))[:, 1:]
        return jnp.concatenate([r_prior, rel_p.ravel(), 2.0 * rel_q.ravel()])

    x0 = WindowState.identity(K)
    out = dense.lm_solve(residual, retract, x0, K * POSE_DOF, max_iters=25)
    np.testing.assert_allclose(out.x.p, p_true, atol=1e-8)
    err = quat.mul(quat.conj(out.x.q), q_true)
    np.testing.assert_allclose(np.abs(np.asarray(err[:, 0])), 1.0, atol=1e-10)


def test_local_coordinates_inverse_of_retract():
    rng = np.random.default_rng(5)
    K = 4
    ref = WindowState(
        p=jnp.asarray(rng.normal(size=(K, 3))),
        q=quat.normalize(jnp.asarray(rng.normal(size=(K, 4)))),
        v=jnp.asarray(rng.normal(size=(K, 3))),
        ba=jnp.asarray(rng.normal(size=(K, 3)) * 0.01),
        bg=jnp.asarray(rng.normal(size=(K, 3)) * 0.01),
    )
    delta = jnp.asarray(rng.normal(size=(K * POSE_DOF,)) * 0.1)
    x = retract(ref, delta)
    np.testing.assert_allclose(local_coordinates(x, ref), delta, atol=1e-10)


class TestMarginalization:
    def _toy_system(self, n_drop=2, n_keep=3, seed=0):
        rng = np.random.default_rng(seed)
        n = n_drop + n_keep
        J = rng.normal(size=(3 * n, n))
        r = rng.normal(size=(3 * n,))
        H = J.T @ J
        b = J.T @ r
        return jnp.asarray(H), jnp.asarray(b), n_drop

    def test_schur_matches_direct(self):
        H, b, nd = self._toy_system()
        prior = marginalization.marginalize(H, b, nd)
        Hs = np.asarray(prior.sqrt_jac).T @ np.asarray(prior.sqrt_jac)
        bs = np.asarray(prior.sqrt_jac).T @ np.asarray(prior.sqrt_res)
        Hnp, bnp = np.asarray(H), np.asarray(b)
        Hmm_inv = np.linalg.inv(Hnp[:nd, :nd])
        H_expect = Hnp[nd:, nd:] - Hnp[nd:, :nd] @ Hmm_inv @ Hnp[:nd, nd:]
        b_expect = bnp[nd:] - Hnp[nd:, :nd] @ Hmm_inv @ bnp[:nd]
        np.testing.assert_allclose(Hs, H_expect, atol=1e-8)
        np.testing.assert_allclose(bs, b_expect, atol=1e-8)

    def test_rank_deficient_clipping(self):
        # A singular dropped block must not blow up (eigen clipping).
        n = 5
        H = jnp.zeros((n, n)).at[2:, 2:].set(jnp.eye(3))
        b = jnp.ones((n,))
        prior = marginalization.marginalize(H, b, 2)
        assert np.all(np.isfinite(np.asarray(prior.sqrt_jac)))
        assert np.all(np.isfinite(np.asarray(prior.sqrt_res)))

    def test_equivalence_to_full_solve(self):
        """Solving keep-block with the prior == solving the full system and
        reading the keep block (for a linear-Gaussian problem)."""
        H, b, nd = self._toy_system(seed=7)
        n = H.shape[0]
        x_full = np.linalg.solve(np.asarray(H), -np.asarray(b))
        prior = marginalization.marginalize(H, b, nd)
        S, r0 = np.asarray(prior.sqrt_jac), np.asarray(prior.sqrt_res)
        x_keep = np.linalg.lstsq(S, -r0, rcond=None)[0]
        np.testing.assert_allclose(x_keep, x_full[nd:], atol=1e-7)

    def test_indefinite_drop_block_falls_back_finite(self):
        """A (pathological) indefinite drop block NaNs the mixed f32
        Cholesky path; the lax.cond guard must fall back to the
        eigen-clipped pipeline instead of poisoning the prior."""
        n = 5
        H = np.eye(n)
        H[:2, :2] = [[1.0, 2.0], [2.0, 1.0]]   # eigenvalues 3, -1
        b = np.ones(n)
        prior = marginalization.marginalize(jnp.asarray(H), jnp.asarray(b), 2)
        S = np.asarray(prior.sqrt_jac)
        r0 = np.asarray(prior.sqrt_res)
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(r0))

    def test_near_singular_correlated_drop_matches_eigen(self):
        """Correlated near-singular drop block: the guarded mixed path
        must agree with the eigen-clipped reference path."""
        rng = np.random.default_rng(3)
        v = rng.normal(size=(6, 1))
        Hmm = v @ v.T + 1e-12 * np.eye(6)      # rank ~1, corr ~1
        Jr = rng.normal(size=(12, 4))
        Hrr = Jr.T @ Jr
        C = 1e-3 * rng.normal(size=(6, 4))
        H = np.block([[Hmm, C], [C.T, Hrr]])
        b = rng.normal(size=10)
        pm = marginalization.marginalize(jnp.asarray(H), jnp.asarray(b), 6)
        pe = marginalization.marginalize(jnp.asarray(H), jnp.asarray(b), 6,
                                         mixed_chol=False)
        Hm = np.asarray(pm.sqrt_jac).T @ np.asarray(pm.sqrt_jac)
        He = np.asarray(pe.sqrt_jac).T @ np.asarray(pe.sqrt_jac)
        assert np.all(np.isfinite(Hm))
        np.testing.assert_allclose(Hm, He, atol=1e-6 * np.abs(He).max())

    def test_prior_residual_masked_until_valid(self):
        prior = marginalization.identity_prior(6)
        r = marginalization.prior_residual(prior, jnp.ones(6))
        np.testing.assert_allclose(r, 0.0)


class TestCyclicReduction:
    """Block cyclic reduction: the log-depth parallel direct solver that
    replaces the sequential banded Cholesky on the batch path (measured
    18x on TPU at T=2048, identical cost on CPU)."""

    @staticmethod
    def _random_banded(T, hw, D, seed):
        rng = np.random.default_rng(seed)
        B = 2 * hw + 1
        band = np.zeros((T, B, D, D))
        for t in range(T):
            for o in range(hw, B):
                s = t + o - hw
                if s >= T:
                    continue
                blk = rng.normal(size=(D, D)) * 0.3
                if s == t:
                    blk = blk @ blk.T + (2 * hw + 2) * np.eye(D)
                band[t, o] = blk
                band[s, hw - (o - hw)] = blk.T
        return jnp.asarray(band), jnp.asarray(rng.normal(size=(T, D)))

    @pytest.mark.parametrize("T,hw,D", [(11, 2, 3), (40, 3, 4),
                                        (100, 7, 6), (257, 7, 6)])
    def test_matches_sequential_cholesky(self, T, hw, D):
        band, b = self._random_banded(T, hw, D, seed=T)
        x0 = banded.direct_solve(band, b)
        x1 = banded.cyclic_reduction_solve(band, b)
        err = float(jnp.linalg.norm(x1 - x0) / jnp.linalg.norm(x0))
        assert err < 1e-9, err

    def test_residual_is_zero(self):
        band, b = self._random_banded(64, 4, 5, seed=1)
        x = banded.cyclic_reduction_solve(band, b)
        r = b - banded.band_matvec(band, x)
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-10


def test_cyclic_reduction_mixed_matches_f64():
    """Equilibrated f32 CR + f64 refinement reaches ~1e-8 step accuracy
    on a Marquardt-damped stiff band (the production batch system)."""
    rng = np.random.default_rng(12)
    T, D, hw = 96, 6, 3
    B = 2 * hw + 1
    band = np.zeros((T, B, D, D))
    for r in range(1, hw + 1):
        for t in range(T - r):
            J = np.zeros((6, 2 * D))
            Rq = rng.normal(size=(3, 3)) * 0.3 + np.eye(3)
            J[0:3, 3:6] = -1e4 * Rq
            J[0:3, D + 3:D + 6] = 1e4 * Rq
            J[3:6, 0:3] = -20.0 * np.eye(3)
            J[3:6, D:D + 3] = 20.0 * np.eye(3)
            H = J.T @ J
            band[t, hw] += H[:D, :D]
            band[t, hw + r] += H[:D, D:]
            band[t + r, hw - r] += H[D:, :D]
            band[t + r, hw] += H[D:, D:]
    for t in range(0, T, 3):
        los = rng.normal(size=(4, 3))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        band[t, hw, :3, :3] += 0.1 * los.T @ los
    for t in range(T):
        d = np.diag(band[t, hw]).copy()
        band[t, hw] += 1e-4 * np.diag(np.maximum(d, 1.0))
    b = rng.normal(size=(T, D))
    band = jnp.asarray(band)
    b = jnp.asarray(b)
    x_ref = banded.cyclic_reduction_solve(band, b)
    x_mix = banded.cyclic_reduction_solve_mixed(band, b, refine=2)
    scale = float(jnp.max(jnp.abs(x_ref)))
    err = float(jnp.max(jnp.abs(x_mix - x_ref))) / scale
    assert err < 1e-7, err


class TestSelectedInverse:
    """Banded selected inversion: per-block marginal covariances."""

    @staticmethod
    def _dense_from_band(band):
        band = np.asarray(band)
        T, B, D, _ = band.shape
        hw = (B - 1) // 2
        H = np.zeros((T * D, T * D))
        for t in range(T):
            for o in range(B):
                s = t + o - hw
                if 0 <= s < T:
                    H[t*D:(t+1)*D, s*D:(s+1)*D] = band[t, o]
        return H

    @pytest.mark.parametrize("T,hw,D", [(11, 2, 3), (40, 3, 4),
                                        (33, 7, 6)])
    def test_matches_dense_inverse(self, T, hw, D):
        band, _ = TestCyclicReduction._random_banded(T, hw, D, seed=7 + T)
        Sig = np.asarray(banded.selected_inverse_diag(band))
        Hinv = np.linalg.inv(self._dense_from_band(band))
        for t in range(T):
            np.testing.assert_allclose(
                Sig[t], Hinv[t*D:(t+1)*D, t*D:(t+1)*D], atol=1e-10,
                err_msg=f"block {t}")

    def test_batch_marginal_covariance_sane(self):
        """End-to-end: covariance of a small batch solution is SPD, and
        keyframes inside GNSS coverage are tighter (translation) than an
        uncovered tail that relies on the relative chain alone."""
        from glio_tpu.config import GlioConfig
        from glio_tpu.data.simulator import simulate_gnss_epochs
        from glio_tpu.models import batch as B
        ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
        STATION = np.array([-2414266.92, 5386768.987, 2407460.031])
        T = 60
        kf_time = np.arange(T) / 3.0
        tt = np.linspace(0, 2, T)
        p_true = np.stack([20*tt, 5*np.sin(tt), np.zeros_like(tt)], -1)
        q_true = np.tile([1.0, 0, 0, 0], (T, 1))
        gnss = simulate_gnss_epochs(p_true[:40], kf_time[:40], ANCHOR,
                                    STATION, psr_noise=0.5, seed=5)
        cfg = GlioConfig()
        prob = B.build_problem(cfg, p_true, q_true, kf_time, gnss,
                               ANCHOR, 0.0, STATION)
        cov = np.asarray(B.batch_marginal_covariance(
            cfg, prob, prob.p_odo, prob.q_odo))
        assert cov.shape == (T, 6, 6)
        ev = np.linalg.eigvalsh(cov)
        assert ev.min() > 0.0
        tr_cov = np.trace(cov[:, :3, :3], axis1=1, axis2=2)
        # GNSS-covered keyframes: metre-level absolute position info;
        # the uncovered tail grows along the relative chain.
        assert tr_cov[5:35].max() < tr_cov[-1]
        assert tr_cov[-1] > tr_cov[40]
