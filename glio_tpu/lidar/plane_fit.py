"""Batched k-point plane fitting and correspondence validation.

Replaces the per-point Eigen ``colPivHouseholderQr`` 5×3 plane solves of the
reference (``LidarOdometry.cpp:343-404`` and ``Estimator.cpp:3633-3708``)
with one batched closed-form normal-equations solve over all query points at
once — thousands of 3×3 solves fused into a single vmapped kernel instead of
a host loop.

Semantics reproduced (reference thresholds):
* Fit n with A·n = −1 over the k neighbors (plane in Hesse-like form
  nᵀp + d = 0 with d = 1/‖n_raw‖ after normalization).
* Validity: every neighbor within ``plane_tol`` of the plane
  (0.06 m in the odometry frontend, ``surf_dist_thres``≈0.18 in the
  estimator window association).
* Weight: w = 1 − 0.9·|nᵀq + d| / ‖q‖^(1/4), keep if > ``min_weight``
  (0.4 frontend / 0.3 estimator); factor score = ``lidar_const``·w
  (7.5·w in the window solve).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..solver.linalg import solve_3x3


class PlaneFit(NamedTuple):
    normal: jnp.ndarray   # (Q, 3) unit normals
    d: jnp.ndarray        # (Q,) plane offset: nᵀp + d ≈ 0
    valid: jnp.ndarray    # (Q,) bool — fit well-conditioned and planar
    weight: jnp.ndarray   # (Q,) distance-based weight (pre-threshold)


def fit_planes(neigh: jnp.ndarray, neigh_valid: jnp.ndarray,
               query: jnp.ndarray, plane_tol: float = 0.06,
               eps: float = 1e-9) -> PlaneFit:
    """Fit planes to neighbor sets and validate against the query points.

    Args:
      neigh: (Q, K, 3) neighbor coordinates per query point.
      neigh_valid: (Q, K) bool mask (padded neighbors false).
      query: (Q, 3) the points being matched (world frame).
      plane_tol: max |point-to-plane| over neighbors for a valid fit.

    All in f32 — point clouds are metre-scale around a local origin.
    """
    dtype = neigh.dtype
    m = neigh_valid.astype(dtype)[..., None]           # (Q, K, 1)
    # Solve the WORLD-frame least squares min ‖A n + 1‖² without ever
    # forming AᵀA on raw world coordinates: at a few hundred metres from
    # the origin the ~|x|² normal-equation entries cancel down to the
    # metre-scale local geometry, costing f32 most of its mantissa (and
    # a bf16 MXU pass everything). Centring A on the valid-neighbor
    # centroid c makes the cross term vanish EXACTLY (A_cᵀ1 = 0), so
    #   AᵀA = Cov + cnt·c cᵀ,   Aᵀb = −cnt·c,
    # and the rank-1 world term is absorbed analytically by
    # Sherman–Morrison instead of numerically:
    #   n = −cnt·y / (1 + cnt·cᵀy),  y = (Cov + εI)⁻¹ c.
    # (cᵀy = cᵀB⁻¹c ≥ 0 since B is SPD — the denominator never cancels.)
    cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)        # (Q, 1)
    c = jnp.sum(neigh * m, axis=-2) / cnt              # (Q, 3)
    dc = (neigh - c[:, None, :]) * m
    cov = jnp.einsum("qki,qkj->qij", dc, dc)
    # Tikhonov floor keeps degenerate sets solvable; they are rejected by
    # the planarity check anyway. The tiny 3×3 solve + SM scalars run in
    # f64 (O(Q·50) flops — negligible even emulated): for exactly planar
    # neighbors Cov is numerically rank-2 and the f32 Cramer cofactors
    # lose ~3 digits of the plane offset; the f64 solve keeps the
    # λ₀-cancellation exact (measured 9e-3 → 5e-7 d error).
    solve_dt = jnp.float64 if dtype == jnp.float32 else dtype
    y = solve_3x3(cov.astype(solve_dt), c.astype(solve_dt), eps=eps)
    cty = jnp.einsum("qi,qi->q", c.astype(solve_dt), y)
    cnt64 = cnt.astype(solve_dt)
    n_raw = (-cnt64 * y / (1.0 + cnt64[..., 0] * cty)[:, None]).astype(dtype)
    norm = jnp.linalg.norm(n_raw, axis=-1)
    good_norm = norm > eps
    inv_norm = 1.0 / jnp.where(good_norm, norm, 1.0)
    normal = n_raw * inv_norm[..., None]
    d = inv_norm                                       # from A n = −1

    # Planarity: all valid neighbors within plane_tol of the plane.
    # Centred evaluation: |n̂·x + d| = |n̂·(x − c) + s|, s = n̂·c + d.
    s = jnp.einsum("qi,qi->q", c, normal) + d
    dist = jnp.abs(jnp.einsum("qki,qi->qk",
                              neigh - c[:, None, :], normal)
                   + s[:, None])
    dist = jnp.where(neigh_valid, dist, 0.0)
    planar = jnp.all(dist <= plane_tol, axis=-1)

    k_count = jnp.sum(neigh_valid, axis=-1)
    valid = planar & good_norm & (k_count >= 3)

    # Reference weight model (LidarOdometry.cpp:389-396); centred n̂·q + d.
    pd = jnp.einsum("qi,qi->q", query - c, normal) + s
    qn = jnp.linalg.norm(query, axis=-1)
    weight = 1.0 - 0.9 * jnp.abs(pd) / jnp.sqrt(jnp.sqrt(jnp.maximum(qn, eps)))
    return PlaneFit(normal=normal, d=d, valid=valid, weight=weight)


def fit_planes_centroid(neigh: jnp.ndarray, neigh_valid: jnp.ndarray,
                        min_planarity: float = 0.0):
    """Centroid+covariance plane fit → (normal, centroid, planarity).

    Used for the batch scan-to-multiscan constraints, which carry the plane
    as (normal, centroid) in the *other* frame's body coordinates
    (``BinaryLidarPlaneNormFactor``, LidarKeyframeFactor.h:124-164).

    Planarity score = 1 − 3λ₀/(λ₀+λ₁+λ₂) from the eigenvalues of the
    scatter matrix (1 for a perfect plane, 0 for isotropic).
    """
    dtype = neigh.dtype
    m = neigh_valid.astype(dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)        # (Q, 1)
    cent = jnp.sum(neigh * m, axis=-2) / cnt           # (Q, 3)
    dcent = (neigh - cent[..., None, :]) * m
    cov = jnp.einsum("qki,qkj->qij", dcent, dcent) / cnt[..., None]
    w, V = jnp.linalg.eigh(cov)                        # ascending
    normal = V[..., :, 0]                              # smallest eigval
    tr = jnp.sum(w, axis=-1)
    planarity = 1.0 - 3.0 * w[..., 0] / jnp.maximum(tr, 1e-12)
    valid = (cnt[..., 0] >= 3) & (planarity >= min_planarity)
    return normal, cent, planarity, valid
