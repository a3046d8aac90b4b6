"""LOAM-style feature extraction as batched tensor ops.

TPU-native replacement for the reference preprocessing node
(``GLIO/src/Preprocessing.cpp``):

* ring assignment from elevation angle for 16/32/64-beam Velodynes
  (``Preprocessing.cpp:441-487``),
* curvature over ±5 ring neighbors (``:529-538``),
* per-ring × 6-sextant edge/flat selection with neighbor suppression
  (``:549-655``: ≤2 sharp + ≤10 less-sharp edges with curvature above
  threshold, ≤4 flats below threshold, remaining non-edge → less-flat),
* gyro-only deskew by slerp over the scan period (``:176-200,222-259``).

The reference walks each sextant with sorted indices and mutable
"neighbor picked" flags; here selection is an iterative masked-argmax
(fixed trip count, vmapped over rings × sextants) — same greedy semantics,
no data-dependent shapes.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quat

N_SECTORS = 6
CURV_HALF_WINDOW = 5


class FeatureParams(NamedTuple):
    edge_threshold: float = 1.0     # config_urban_hk.yaml edgeThreshold
    surf_threshold: float = 0.1     # surfThreshold
    max_sharp: int = 2
    max_less_sharp: int = 10
    max_flat: int = 4
    min_range: float = 3.0          # removeClosedPointCloud(3m)
    suppress_halfwidth: int = 5


def ring_from_elevation(points: jnp.ndarray, n_scans: int = 32):
    """Velodyne ring index from elevation angle.

    Mirrors the model-specific formulas at ``Preprocessing.cpp:441-487``:
    16-beam: ±15° at 2°;  32-beam: −30.67°…+10.67° at 4/3°;
    64-beam: +2°…−24.33° split scheme.
    Returns (ring, in_range) with in_range false for angles off the LUT.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    angle = jnp.degrees(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    if n_scans == 16:
        ring = jnp.round((angle + 15.0) / 2.0).astype(jnp.int32)
    elif n_scans == 32:
        ring = jnp.round((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
    elif n_scans == 64:
        upper = jnp.round((angle + 2.0) * 3.0 + 0.5).astype(jnp.int32)
        lower = jnp.round(n_scans / 2.0 + (angle + 2.0) * 2.0 + 0.5).astype(jnp.int32)
        ring = jnp.where(angle >= -8.83, upper, lower)
    else:
        raise ValueError(f"unsupported n_scans={n_scans}")
    ok = (ring >= 0) & (ring < n_scans)
    return jnp.clip(ring, 0, n_scans - 1), ok


def curvature(points: jnp.ndarray, valid: jnp.ndarray):
    """LOAM curvature per ring point: ‖Σ_{j=−5..5, j≠0}(p_j − p_0)‖².

    points: (R, P, 3) range-image-ordered per-ring points; valid: (R, P).
    Points whose ±5 neighborhood crosses invalid entries get curvature −1
    (excluded), matching the reference's boundary skip.
    """
    h = CURV_HALF_WINDOW
    acc = -2.0 * h * points
    ok = valid
    for off in range(1, h + 1):
        acc = acc + jnp.roll(points, off, axis=1) + jnp.roll(points, -off, axis=1)
        ok = ok & jnp.roll(valid, off, axis=1) & jnp.roll(valid, -off, axis=1)
    # Ring boundaries: first/last h points have wrapped neighbors → invalid.
    P = points.shape[1]
    pos = jnp.arange(P)
    interior = (pos >= h) & (pos < P - h)
    ok = ok & interior[None, :]
    c = jnp.sum(acc * acc, axis=-1)
    return jnp.where(ok, c, -1.0), ok


def _greedy_select(curv, eligible, n_pick, maximize, suppress_halfwidth):
    """Greedy masked argmax/argmin with ±halfwidth neighbor suppression.

    curv, eligible: (S,) one sextant. Returns bool mask of picked points.
    Reproduces the reference's sorted-walk + neighbor-picked flags.
    """
    S = curv.shape[0]
    score = jnp.where(eligible, curv if maximize else -curv, -jnp.inf)
    picked = jnp.zeros((S,), bool)

    def body(_, carry):
        score, picked = carry
        i = jnp.argmax(score)
        can = jnp.isfinite(score[i]) & (score[i] > -jnp.inf)
        picked = picked.at[i].set(picked[i] | can)
        # Suppress the pick and its neighbors.
        pos = jnp.arange(S)
        near = jnp.abs(pos - i) <= suppress_halfwidth
        score = jnp.where(can & near, -jnp.inf, score)
        return score, picked

    _, picked = jax.lax.fori_loop(0, n_pick, body, (score, picked))
    return picked


@partial(jax.jit, static_argnames=("params",))
def extract_features(points: jnp.ndarray, valid: jnp.ndarray,
                     params: FeatureParams = FeatureParams()):
    """Edge/flat feature masks over a range-image scan.

    Args:
      points: (R, P, 3) ring-ordered points (deskewed, sensor frame).
      valid: (R, P) mask.

    Returns dict of (R, P) bool masks: sharp, less_sharp, flat, less_flat.
    `less_flat` is every valid non-edge point below the edge threshold
    (the reference additionally voxel-filters these at 0.4 m — done by the
    caller via ``neighbors.voxel_downsample``).
    """
    R, P = valid.shape
    rng = jnp.linalg.norm(points, axis=-1)
    valid = valid & (rng > params.min_range)
    c, ok = curvature(points, valid)
    sec = P // N_SECTORS
    usable = sec * N_SECTORS

    c_s = c[:, :usable].reshape(R * N_SECTORS, sec)
    ok_s = ok[:, :usable].reshape(R * N_SECTORS, sec)

    edge_elig = ok_s & (c_s > params.edge_threshold)
    flat_elig = ok_s & (c_s < params.surf_threshold) & (c_s >= 0)

    sel_less_sharp = jax.vmap(
        lambda cc, ee: _greedy_select(
            cc, ee, params.max_sharp + params.max_less_sharp, True,
            params.suppress_halfwidth))(c_s, edge_elig)
    sel_sharp = jax.vmap(
        lambda cc, ee: _greedy_select(
            cc, ee, params.max_sharp, True, params.suppress_halfwidth))(
        c_s, edge_elig)
    sel_flat = jax.vmap(
        lambda cc, ee: _greedy_select(
            cc, ee, params.max_flat, False, params.suppress_halfwidth))(
        c_s, flat_elig)

    def unshape(m):
        full = jnp.zeros((R, P), bool)
        return full.at[:, :usable].set(m.reshape(R, usable))

    sharp = unshape(sel_sharp)
    less_sharp = unshape(sel_less_sharp)
    flat = unshape(sel_flat)
    less_flat = valid & ok & ~less_sharp & (c <= params.edge_threshold)
    return {"sharp": sharp, "less_sharp": less_sharp, "flat": flat,
            "less_flat": less_flat, "curvature": c}


def deskew(points: jnp.ndarray, rel_time: jnp.ndarray, q_scan: jnp.ndarray,
           q_lb: jnp.ndarray):
    """Gyro-only motion compensation (``Preprocessing.cpp:176-200``).

    Rotates each point by slerp(identity, q_imu_scan, t_rel) conjugated by
    the lidar-body extrinsic: p' = (q_lb⁻¹ ⊗ slerp(t) ⊗ q_lb) · p.
    """
    ident = jnp.array([1.0, 0, 0, 0], dtype=q_scan.dtype)
    t = jnp.clip(rel_time, 0.0, 1.0)[..., None]
    qs = quat.slerp(jnp.broadcast_to(ident, t.shape[:-1] + (4,)),
                    jnp.broadcast_to(q_scan, t.shape[:-1] + (4,)),
                    t[..., 0:1])
    q_full = quat.mul(quat.conj(q_lb), quat.mul(qs, q_lb))
    return quat.rotate(q_full, points)
