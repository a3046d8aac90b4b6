"""IMU preintegration and the whitened IMU factor.

TPU-native re-implementation of the VINS-Mono-style midpoint preintegration
in ``GLIO/include/factors/Preintegration.h:96-235`` and the analytic factor
in ``GLIO/include/factors/ImuFactor.h:21-171``:

* midpoint integration of (Δp, Δq, Δv) between two keyframes,
* 15×15 bias/state Jacobian and covariance propagation with an 18×18
  noise model (state order P, R, V, BA, BG — ``Preintegration.h:15-21``),
* residual with first-order bias correction, whitened by the inverse
  Cholesky factor of the propagated covariance.

Design differences from the reference (deliberate, TPU-first):

* The per-sample propagation is a single fused step inside ``lax.scan``
  over a fixed-size padded IMU sample buffer with a validity mask — no
  dynamic shapes, one compilation for every keyframe interval.
* Jacobian/covariance propagation uses the same midpoint discretization as
  the reference so that unit goldens derived from the reference formulas
  match to float64 round-off.
* The factor evaluator is pure and batched: vmap over window edges.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quat, so3

STATE_DIM = 15  # δp(3) δθ(3) δv(3) δba(3) δbg(3)
NOISE_DIM = 18  # acc_n(i), gyr_n(i), acc_n(j), gyr_n(j), acc_w, gyr_w

# State block offsets (Preintegration.h:15-21 uses O_P=0, O_R=3, O_V=6,
# O_BA=9, O_BG=12).
O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


class ImuParams(NamedTuple):
    """Noise densities (config_urban_hk.yaml:5-11, Xsens MTi-10)."""
    acc_n: float = 3.9939570888238808e-03
    gyr_n: float = 1.5636343949698187e-03
    acc_w: float = 6.4356659353532566e-05
    gyr_w: float = 3.5640318696367613e-05
    gravity: float = 9.80511

    def gravity_vec(self, dtype=jnp.float64):
        return jnp.array([0.0, 0.0, self.gravity], dtype=dtype)

    def noise_cov(self, dtype=jnp.float64):
        """18×18 diagonal continuous-discrete noise block (ImuFactor model)."""
        d = jnp.array(
            [self.acc_n**2] * 3 + [self.gyr_n**2] * 3 +
            [self.acc_n**2] * 3 + [self.gyr_n**2] * 3 +
            [self.acc_w**2] * 3 + [self.gyr_w**2] * 3, dtype=dtype)
        return jnp.diag(d)


class Preintegrated(NamedTuple):
    """Result of preintegrating one keyframe interval."""
    delta_p: jnp.ndarray      # (3,)
    delta_q: jnp.ndarray      # (4,) wxyz
    delta_v: jnp.ndarray      # (3,)
    jacobian: jnp.ndarray     # (15,15) d(state)/d(state0 incl. biases)
    covariance: jnp.ndarray   # (15,15)
    sum_dt: jnp.ndarray       # ()
    lin_ba: jnp.ndarray       # (3,) bias linearization point
    lin_bg: jnp.ndarray       # (3,)


def _midpoint_step(carry, inp, noise_cov):
    """One midpoint integration step (Preintegration.h:96-168).

    carry: (p, q, v, jac, cov, sum_dt, ba, bg, acc_prev, gyr_prev)
    inp:   (acc, gyr, dt, valid)

    The delta-state propagation runs in the carry's state dtype (f64);
    the 15×15 Jacobian/covariance propagation runs in the carry's
    jac/cov dtype — f32 there turns the per-sample matmul chain into MXU
    work instead of emulated f64 (the covariance only feeds whitening,
    where 1e-7 relative error is far below measurement noise).
    """
    p, q, v, jac, cov, sum_dt, ba, bg, acc0, gyr0 = carry
    acc1, gyr1, dt, valid = inp
    dtype = p.dtype
    jdtype = jac.dtype

    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    q_new = quat.normalize(quat.mul(q, quat.delta_q(un_gyr * dt)))
    un_acc_0 = quat.rotate(q, acc0 - ba)
    un_acc_1 = quat.rotate(q_new, acc1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    p_new = p + v * dt + 0.5 * un_acc * dt * dt
    v_new = v + un_acc * dt

    # Midpoint linearization (Preintegration.h:118-166): F (15x15),
    # V (15x18) — one shared implementation with the associative fast
    # path (_fv_matrices), so the two paths cannot drift apart.
    F, V = _fv_matrices(q, q_new, acc0, acc1, un_gyr, dt, ba, jdtype)

    jac_new = F @ jac
    cov_new = F @ cov @ F.T + V @ noise_cov @ V.T
    sum_dt_new = sum_dt + dt

    # Masked (padded) samples are identity steps.
    m = valid.astype(dtype)
    mj = valid.astype(jdtype)
    p = m * p_new + (1 - m) * p
    q = jnp.where(valid, q_new, q)
    v = m * v_new + (1 - m) * v
    jac = mj * jac_new + (1 - mj) * jac
    cov = mj * cov_new + (1 - mj) * cov
    sum_dt = m * sum_dt_new + (1 - m) * sum_dt
    acc_out = jnp.where(valid, acc1, acc0)
    gyr_out = jnp.where(valid, gyr1, gyr0)
    return (p, q, v, jac, cov, sum_dt, ba, bg, acc_out, gyr_out), None


def _fv_matrices(q, q_new, a0, a1, un_gyr, dt, ba, jdtype):
    """Per-step F (15,15) and V (15,18) — the linearization blocks of
    ``_midpoint_step``, factored out so the fast path can build them
    batched over all samples at once."""
    R0 = quat.to_rotmat(q)
    R1 = quat.to_rotmat(q_new)
    I3 = jnp.eye(3, dtype=jdtype)
    R0a0x = (R0 @ so3.hat(a0 - ba)).astype(jdtype)
    R1a1x = (R1 @ so3.hat(a1 - ba)).astype(jdtype)
    dtj = dt.astype(jdtype)
    rot_tx = I3 - so3.hat(un_gyr).astype(jdtype) * dtj
    R0 = R0.astype(jdtype)
    R1 = R1.astype(jdtype)

    F = jnp.zeros((15, 15), dtype=jdtype)
    F = F.at[O_P:O_P+3, O_P:O_P+3].set(I3)
    F = F.at[O_P:O_P+3, O_R:O_R+3].set(
        -0.25 * R0a0x * dtj * dtj + -0.25 * R1a1x @ rot_tx * dtj * dtj)
    F = F.at[O_P:O_P+3, O_V:O_V+3].set(I3 * dtj)
    F = F.at[O_P:O_P+3, O_BA:O_BA+3].set(-0.25 * (R0 + R1) * dtj * dtj)
    F = F.at[O_P:O_P+3, O_BG:O_BG+3].set(0.25 * R1a1x * dtj * dtj * dtj)
    F = F.at[O_R:O_R+3, O_R:O_R+3].set(rot_tx)
    F = F.at[O_R:O_R+3, O_BG:O_BG+3].set(-I3 * dtj)
    F = F.at[O_V:O_V+3, O_R:O_R+3].set(
        -0.5 * R0a0x * dtj + -0.5 * R1a1x @ rot_tx * dtj)
    F = F.at[O_V:O_V+3, O_V:O_V+3].set(I3)
    F = F.at[O_V:O_V+3, O_BA:O_BA+3].set(-0.5 * (R0 + R1) * dtj)
    F = F.at[O_V:O_V+3, O_BG:O_BG+3].set(0.5 * R1a1x * dtj * dtj)
    F = F.at[O_BA:O_BA+3, O_BA:O_BA+3].set(I3)
    F = F.at[O_BG:O_BG+3, O_BG:O_BG+3].set(I3)

    V = jnp.zeros((15, 18), dtype=jdtype)
    V = V.at[O_P:O_P+3, 0:3].set(0.25 * R0 * dtj * dtj)
    V = V.at[O_P:O_P+3, 3:6].set(-0.125 * R1a1x * dtj * dtj * dtj)
    V = V.at[O_P:O_P+3, 6:9].set(0.25 * R1 * dtj * dtj)
    V = V.at[O_P:O_P+3, 9:12].set(-0.125 * R1a1x * dtj * dtj * dtj)
    V = V.at[O_R:O_R+3, 3:6].set(0.5 * I3 * dtj)
    V = V.at[O_R:O_R+3, 9:12].set(0.5 * I3 * dtj)
    V = V.at[O_V:O_V+3, 0:3].set(0.5 * R0 * dtj)
    V = V.at[O_V:O_V+3, 3:6].set(-0.25 * R1a1x * dtj * dtj)
    V = V.at[O_V:O_V+3, 6:9].set(0.5 * R1 * dtj)
    V = V.at[O_V:O_V+3, 9:12].set(-0.25 * R1a1x * dtj * dtj)
    V = V.at[O_BA:O_BA+3, 12:15].set(I3 * dtj)
    V = V.at[O_BG:O_BG+3, 15:18].set(I3 * dtj)
    return F, V


def _preintegrate_fast(acc, gyr, dt, valid, ba, bg, acc0, gyr0,
                       params: ImuParams, jdtype) -> Preintegrated:
    """TPU fast path: the delta-state recursion stays a (cheap, vector-
    only) ``lax.scan``; the expensive Jacobian/covariance recursion —
    J ← F J, P ← F P Fᵀ + V Q Vᵀ — is an AFFINE map of (J, P), which
    composes associatively: (F₂,W₂)∘(F₁,W₁) = (F₂F₁, F₂W₁F₂ᵀ+W₂).
    ``lax.associative_scan`` evaluates it in log₂(N) levels of BATCHED
    15×15 matmuls instead of N sequential ones (~15× on v5e for N=40;
    the sequential f64 chain dominated the whole estimator step)."""
    dtype = jnp.float64

    def step(carry, x):
        p, q, v, a0, g0 = carry
        a1, g1, dt_k, ok = x
        un_gyr = 0.5 * (g0 + g1) - bg
        q_new = quat.normalize(quat.mul(q, quat.delta_q(un_gyr * dt_k)))
        un_acc = 0.5 * (quat.rotate(q, a0 - ba)
                        + quat.rotate(q_new, a1 - ba))
        p_new = p + v * dt_k + 0.5 * un_acc * dt_k * dt_k
        v_new = v + un_acc * dt_k
        m = ok.astype(dtype)
        new_carry = (m * p_new + (1 - m) * p,
                     jnp.where(ok, q_new, q),
                     m * v_new + (1 - m) * v,
                     jnp.where(ok, a1, a0),
                     jnp.where(ok, g1, g0))
        # Emit the pre-step attitude/acc pair the linearization needs.
        return new_carry, (q, q_new, a0, un_gyr)

    carry0 = (jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype),
              jnp.zeros(3, dtype), acc0, gyr0)
    (p, q, v, _, _), (q_pre, q_post, a_pre, un_gyr) = jax.lax.scan(
        step, carry0, (acc, gyr, dt, valid))
    sum_dt = jnp.sum(jnp.where(valid, dt, 0.0))

    F, V = jax.vmap(
        lambda qp, qn, a0k, a1k, w, d: _fv_matrices(
            qp, qn, a0k, a1k, w, d, ba, jdtype))(
        q_pre, q_post, a_pre, acc, un_gyr, dt)
    Q18 = params.noise_cov(jdtype)
    W = jnp.einsum("nij,jk,nlk->nil", V, Q18, V)
    eye15 = jnp.eye(15, dtype=jdtype)
    F = jnp.where(valid[:, None, None], F, eye15)
    W = jnp.where(valid[:, None, None], W, 0.0)
    # Prepend the initial element (I, P0 = 1e-3·I, Preintegration.h:56).
    Fs = jnp.concatenate([eye15[None], F], axis=0)
    Ws = jnp.concatenate([(1e-3 * eye15)[None], W], axis=0)

    def combine(a, b):
        Fa, Wa = a
        Fb, Wb = b
        FbWa = jnp.matmul(Fb, Wa)
        return (jnp.matmul(Fb, Fa),
                jnp.matmul(FbWa, jnp.swapaxes(Fb, -1, -2)) + Wb)

    J_all, P_all = jax.lax.associative_scan(combine, (Fs, Ws))
    return Preintegrated(p, q, v, J_all[-1], P_all[-1], sum_dt, ba, bg)


@partial(jax.jit, static_argnames=("params", "cov_dtype"))
def preintegrate(acc, gyr, dt, valid, ba, bg, acc0, gyr0,
                 params: ImuParams = ImuParams(),
                 cov_dtype=jnp.float64) -> Preintegrated:
    """Preintegrate a padded IMU sample run.

    Args:
      acc, gyr: (N, 3) samples (body frame, m/s², rad/s).
      dt: (N,) per-sample integration intervals.
      valid: (N,) bool mask — padded tail entries are ignored.
      ba, bg: (3,) bias linearization points.
      acc0, gyr0: (3,) the sample at the interval start (previous keyframe),
        seeding the midpoint pair like ``Preintegration(acc0, gyr0, ba, bg)``.
      cov_dtype: dtype of the 15×15 Jacobian/covariance propagation.
        f64 (default) matches the reference formulas to round-off for the
        unit goldens; f32 is the replay fast path — the covariance only
        feeds whitening, and the per-sample matmul chain then rides the
        MXU instead of emulated f64 (≈3× on this stage, measured).

    The reference seeds the covariance at 1e-3·I (Preintegration.h:56); we
    reproduce that so whitening matches.
    """
    dtype = jnp.float64
    acc = acc.astype(dtype)
    gyr = gyr.astype(dtype)
    dt = dt.astype(dtype)
    if cov_dtype == jnp.float32:
        # Fast path: associative-scan J/P propagation (see helper).
        return _preintegrate_fast(
            acc, gyr, dt, valid, ba.astype(dtype), bg.astype(dtype),
            acc0.astype(dtype), gyr0.astype(dtype), params, cov_dtype)
    carry = (
        jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype),
        jnp.zeros(3, dtype),
        jnp.eye(15, dtype=cov_dtype),
        jnp.eye(15, dtype=cov_dtype) * 1e-3,  # Preintegration.h:56
        jnp.zeros((), dtype),
        ba.astype(dtype), bg.astype(dtype),
        acc0.astype(dtype), gyr0.astype(dtype),
    )
    step = partial(_midpoint_step, noise_cov=params.noise_cov(cov_dtype))
    carry, _ = jax.lax.scan(step, carry, (acc, gyr, dt, valid))
    p, q, v, jac, cov, sum_dt, ba, bg, _, _ = carry
    return Preintegrated(p, q, v, jac, cov, sum_dt, ba, bg)


def bias_corrected_delta(pre: Preintegrated, ba_i, bg_i):
    """First-order bias-corrected (Δp, Δq, Δv) (Preintegration.h:196-215)."""
    dba = ba_i - pre.lin_ba
    dbg = bg_i - pre.lin_bg
    dp_dba = pre.jacobian[O_P:O_P+3, O_BA:O_BA+3]
    dp_dbg = pre.jacobian[O_P:O_P+3, O_BG:O_BG+3]
    dq_dbg = pre.jacobian[O_R:O_R+3, O_BG:O_BG+3]
    dv_dba = pre.jacobian[O_V:O_V+3, O_BA:O_BA+3]
    dv_dbg = pre.jacobian[O_V:O_V+3, O_BG:O_BG+3]
    dp = pre.delta_p + dp_dba @ dba + dp_dbg @ dbg
    dv = pre.delta_v + dv_dba @ dba + dv_dbg @ dbg
    dq = quat.normalize(quat.mul(pre.delta_q, quat.delta_q(dq_dbg @ dbg)))
    return dp, dq, dv


def residual(pre: Preintegrated, p_i, q_i, v_i, ba_i, bg_i,
             p_j, q_j, v_j, ba_j, bg_j, gravity):
    """Raw 15-vector IMU residual (Preintegration.h:216-234)."""
    dp, dq, dv = bias_corrected_delta(pre, ba_i, bg_i)
    dt = pre.sum_dt
    qi_inv = quat.conj(q_i)
    r_p = quat.rotate(qi_inv, 0.5 * gravity * dt * dt + p_j - p_i - v_i * dt) - dp
    r_q = 2.0 * quat.mul(quat.conj(dq), quat.mul(qi_inv, q_j))[1:4]
    r_v = quat.rotate(qi_inv, gravity * dt + v_j - v_i) - dv
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg])


def sqrt_info(pre: Preintegrated):
    """Whitening matrix: Cholesky^T of covariance inverse (ImuFactor.h:44-47).

    The reference computes ``LLT(cov.inverse()).matrixL().transpose()``; we
    use the equivalent inverse-of-Cholesky form which is better conditioned.
    """
    # Factor in f64 regardless of the propagation dtype: the 15×15
    # Cholesky is cheap (once per edge) and the covariance condition
    # number can brush f32's limits.
    L = jnp.linalg.cholesky(pre.covariance.astype(jnp.float64))
    # sqrt_info = inv(L)ᵀ... reference: LLT(C⁻¹).L()ᵀ. Both satisfy SᵀS = C⁻¹
    # only up to an orthogonal factor; whitened norms agree, which is all the
    # optimizer sees. We document the difference and test ‖S r‖ equality.
    n = pre.covariance.shape[-1]
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(n, dtype=L.dtype), lower=True)
    return Linv


def whitened_residual(pre: Preintegrated, *state_ij, gravity):
    return sqrt_info(pre) @ residual(pre, *state_ij, gravity=gravity)


def whitened_residual_cached(S, pre: Preintegrated, *state_ij, gravity):
    """Like whitened_residual but with the sqrt-info precomputed.

    The whitening matrix depends only on the preintegrated covariance —
    computing it inside the residual would re-run a 15×15 Cholesky for
    every evaluation and every autodiff tangent (the dominant cost of the
    window LM on TPU). Precompute once per solve."""
    return S @ residual(pre, *state_ij, gravity=gravity)
