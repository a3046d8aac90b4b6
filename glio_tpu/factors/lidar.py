"""Vectorized LiDAR residual evaluators.

Each function evaluates *all* factors of its type in one fused batch
(masked), replacing the per-point Ceres cost functions of the reference:

* ``plane_norm_residual``      ← LidarPlaneNormFactor
  (``GLIO/include/factors/LidarKeyframeFactor.h:73-122``):
  r = score · (nᵀ(q · q_lb⁻¹(p − t_lb) + t) + d)
* ``binary_plane_residual``    ← BinaryLidarPlaneNormFactor (``:124-164``):
  r = score · (R(q₂)n) · ((q₁p + t₁) − (q₂c + t₂))
* ``plane_incre_residual``     ← LidarPlaneNormIncreFactor (``:222-257``),
  the odometry frontend's scan-to-localmap cost: r = nᵀ(q p + t) + d
* ``edge_residual``            ← LidarEdgeFactor (``:12-70``):
  point-to-line distance (unused in the reference main path, kept for
  capability parity).
* ``relative_attitude_residual`` ← delta_q_factor_auto (``:281-304``):
  r = w · vec(Δq⁻¹ ⊗ q_i⁻¹ ⊗ q_j), reference weight 10000.
* ``roll_pitch_residual``      ← roll_pitch_factor_auto (``:261-279``).

All are pure jnp over batched inputs, differentiable with jax autodiff
(the reference relies on Ceres autodiff for the same costs).
"""

import jax.numpy as jnp

from ..utils import quat


def body_from_lidar(p_l, q_lb, t_lb):
    """Lidar-frame point → body frame, reference extrinsic convention:
    p_b = q_lb⁻¹ (p_l − t_lb)  (LidarKeyframeFactor.h:97)."""
    return quat.rotate(quat.conj(q_lb), p_l - t_lb)


def plane_norm_residual(p_l, normal, d, score, t, q, q_lb, t_lb, mask):
    """Unary scan-to-map point-to-plane residuals.

    Args:
      p_l: (N, 3) raw lidar-frame points.
      normal: (N, 3) world-frame unit plane normals.
      d: (N,) plane offsets.
      score: (N,) per-residual weights (7.5 · fit weight).
      t, q: keyframe pose (3,), (4,).
      q_lb, t_lb: lidar-body extrinsic.
      mask: (N,) validity.
    Returns (N,) masked residuals.
    """
    p_b = body_from_lidar(p_l, q_lb, t_lb)
    p_w = quat.rotate(q, p_b) + t
    r = score * (jnp.sum(normal * p_w, axis=-1) + d)
    return jnp.where(mask, r, 0.0)


def binary_plane_residual(p_b, normal_b, cent_b, score,
                          t1, q1, t2, q2, mask):
    """Scan-to-multiscan plane residuals between two keyframes.

    Point p (body frame of kf1) vs plane (normal, centroid) in body frame
    of kf2; both transformed to world.
    """
    p_w = quat.rotate(q1, p_b) + t1
    n_w = quat.rotate(q2, normal_b)
    c_w = quat.rotate(q2, cent_b) + t2
    r = score * jnp.sum(n_w * (p_w - c_w), axis=-1)
    return jnp.where(mask, r, 0.0)


def plane_incre_residual(p_l, normal, d, t, q, mask):
    """Frontend odometry point-to-plane (points already in body frame)."""
    p_w = quat.rotate(q, p_l) + t
    r = jnp.sum(normal * p_w, axis=-1) + d
    return jnp.where(mask, r, 0.0)


def edge_residual(p_l, line_a, line_b, s, t, q, q_lb, t_lb, mask):
    """Point-to-line distance residuals (LidarEdgeFactor)."""
    p_b = body_from_lidar(p_l, q_lb, t_lb)
    p_w = quat.rotate(q, p_b) + t
    nu = jnp.cross(p_w - line_a, p_w - line_b)
    de = line_a - line_b
    r = s * jnp.linalg.norm(nu, axis=-1) / jnp.maximum(
        jnp.linalg.norm(de, axis=-1), 1e-12)
    return jnp.where(mask, r, 0.0)


def relative_attitude_residual(q_i, q_j, delta_q, weight, mask):
    """r = weight · vec(Δq⁻¹ ⊗ q_i⁻¹ ⊗ q_j)  → (N, 3)."""
    dq = quat.mul(quat.conj(delta_q), quat.mul(quat.conj(q_i), q_j))
    r = weight[..., None] * dq[..., 1:4]
    return jnp.where(mask[..., None], r, 0.0)


def roll_pitch_residual(q, up_vec, weight=20.0):
    """r = weight · (1 − upᵀ(R(q) ẑ))."""
    z = jnp.zeros_like(up_vec).at[..., 2].set(1.0)
    return weight * (1.0 - jnp.sum(up_vec * quat.rotate(q, z), axis=-1))
