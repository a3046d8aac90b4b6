"""Relative-pose chain and prior factors (vectorized).

Counterparts of ``GLIO/include/factors/LidarPoseFactor.h`` and
``PriorFactor.h``, evaluated as one masked batch per factor type:

* ``relative_pose_residual``  ← LidarPoseFactorAutoDiff (:11-52, weight
  0.2 on both blocks) and LidarPoseFactorBatchRelativeAutoDiff (:54-95,
  weights 10/20) — the weights are arguments:
  r = [w_q · 2·vec(Δq⁻¹ q₁⁻¹ q₂),  w_p · (q₁⁻¹(p₂ − p₁) − Δp)]
* ``anchored_pose_residual``  ← LidarPoseLeft/RightFactorAutoDiff
  (:128-221): same residual with one side a constant pose.
* ``position_prior_residual`` ← LidarPoseFactorAutoDiffBatch (:97-125),
  weight 1.2.
* ``speed_bias_prior_residual`` ← SpeedBiasPriorFactorAutoDiff
  (PriorFactor.h:10-40), diag weights (8,8,1,1,...,1).
"""

import jax.numpy as jnp

from ..utils import quat


def relative_pose_residual(p1, q1, p2, q2, delta_p, delta_q,
                           w_q, w_p, mask):
    """(N, 6) masked residuals for relative-pose factors between pose pairs."""
    r_q = 2.0 * quat.mul(quat.conj(delta_q), quat.mul(quat.conj(q1), q2))[..., 1:4]
    r_p = quat.rotate(quat.conj(q1), p2 - p1) - delta_p
    r = jnp.concatenate([
        jnp.asarray(w_q)[..., None] * r_q,
        jnp.asarray(w_p)[..., None] * r_p,
    ], axis=-1)
    return jnp.where(mask[..., None], r, 0.0)


def anchored_pose_residual(p_free, q_free, p_anchor, q_anchor, delta_p,
                           delta_q, w, mask, anchor_is_left=True):
    """Relative-pose residual with one side held constant.

    anchor_is_left: anchor plays pose-1 (LidarPoseLeftFactorAutoDiff);
    otherwise pose-2 (Right variant). Reference weight 0.2 on all rows.
    """
    if anchor_is_left:
        return relative_pose_residual(
            p_anchor, q_anchor, p_free, q_free, delta_p, delta_q, w, w, mask)
    return relative_pose_residual(
        p_free, q_free, p_anchor, q_anchor, delta_p, delta_q, w, w, mask)


def position_prior_residual(p, target, weight=1.2, mask=None):
    r = weight * (p - target)
    if mask is not None:
        r = jnp.where(mask[..., None], r, 0.0)
    return r


SPEED_BIAS_WEIGHTS = jnp.array([8.0, 8.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])


def speed_bias_prior_residual(v, ba, bg, v0, ba0, bg0, mask=None):
    """(N, 9) prior pulling speed/bias to a snapshot (used after loop
    closures when marginalization is reset — ``Estimator.cpp`` marg=false
    path)."""
    sb = jnp.concatenate([v, ba, bg], axis=-1)
    sb0 = jnp.concatenate([v0, ba0, bg0], axis=-1)
    r = SPEED_BIAS_WEIGHTS * (sb - sb0)
    if mask is not None:
        r = jnp.where(mask[..., None], r, 0.0)
    return r
