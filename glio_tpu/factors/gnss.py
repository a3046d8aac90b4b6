"""GNSS factor evaluators: DD pseudorange, Doppler, receiver clock drift.

Vectorized counterparts of the reference's Ceres costs:

* ``dd_psr_residual``  ← dd_psr_factor_20 (``factors/dd_psr_factor.hpp``):
  local poses interpolated by a time ratio, rotated into ECEF through the
  anchor + yaw_enu_local, then (n−1) whitened double differences per
  constellation with the ×0.05 annealed outlier down-weight.
* ``doppler_residual`` ← tcdopplerFactor (``factors/dopp_factor.hpp:19-85``):
  range-rate with Sagnac term, interpolated position/velocity, per-epoch
  receiver clock drift state, satellite clock drift removed.
* ``clock_drift_residual`` ← constantClockDriftFactor (``:88-103``).

All functions take padded slot tensors from ``data.episode.GnssEpochs``
and are differentiable (the reference hand-codes the DD Jacobian and
autodiffs the rest; we autodiff everything through the same math).
"""

import jax.numpy as jnp

from ..gnss.dd import dd_residual
from ..utils.coords import CLIGHT, OMGE, ecef2enu_rotmat, ecef2llh


def r_ecef_local(anchor_ecef, yaw_enu_local):
    """Rotation taking local-world coordinates to ECEF deltas.

    R_ecef_local = R_ecef_enu(anchor) · Rz(yaw) (dd_psr_factor.hpp:33-40).
    """
    sy, cy = jnp.sin(yaw_enu_local), jnp.cos(yaw_enu_local)
    R_enu_local = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]],
                            dtype=anchor_ecef.dtype)
    R_ecef_enu = ecef2enu_rotmat(ecef2llh(anchor_ecef)).T
    return R_ecef_enu @ R_enu_local


def local_to_ecef(p_local, anchor_ecef, yaw_enu_local, lever_arm=None):
    R = r_ecef_local(anchor_ecef, yaw_enu_local)
    if lever_arm is not None:
        p_local = p_local + lever_arm
    return jnp.einsum("ij,...j->...i", R, p_local) + anchor_ecef


def dd_psr_residual(p_i, p_j, ratio, anchor_ecef, yaw_enu_local,
                    station_ecef, sat_pos, psr_rov, psr_sta, valid, system,
                    master, whiten, threshold=1e9, lever_arm=None):
    """Whitened DD pseudorange residuals for one epoch bound to a pose pair.

    p_i, p_j: (3,) local-frame keyframe positions; the epoch time sits
    between them with interpolation `ratio` (ratio·Pi + (1−ratio)·Pj,
    dd_psr_factor.hpp:42).  Returns (n_sys, MAX_SV) masked residuals.
    """
    p_local = ratio * p_i + (1.0 - ratio) * p_j
    p_ecef = local_to_ecef(p_local, anchor_ecef, yaw_enu_local, lever_arm)
    return dd_residual(p_ecef, sat_pos, psr_rov, psr_sta, station_ecef,
                       valid, system, master, whiten, threshold)


def doppler_residual(p_i, v_i, p_j, v_j, ratio, rcv_ddt, anchor_ecef,
                     yaw_enu_local, sat_pos, sat_vel, sat_ddt, dopp_rng_rate,
                     valid, var, lever_arm=None):
    """Per-satellite Doppler residuals for one epoch (masked, (MAX_SV,)).

    dopp_rng_rate is the measured range-rate in m/s (= −doppler·λ as the
    converter stores it); residual = (h(x) − meas)/var, matching
    tcdopplerFactor where the + sign on doppler·λ encodes the same thing.
    """
    R = r_ecef_local(anchor_ecef, yaw_enu_local)
    p_local = ratio * p_i + (1.0 - ratio) * p_j
    if lever_arm is not None:
        p_local = p_local + lever_arm
    v_local = ratio * v_i + (1.0 - ratio) * v_j
    P = R @ p_local + anchor_ecef
    V = R @ v_local

    d = sat_pos - P
    los = d / jnp.maximum(jnp.linalg.norm(d, axis=-1), 1.0)[..., None]
    sagnac = OMGE / CLIGHT * (
        sat_vel[..., 0] * P[1] + sat_pos[..., 0] * V[1]
        - sat_vel[..., 1] * P[0] - sat_pos[..., 1] * V[0])
    est = jnp.sum((sat_vel - V) * los, axis=-1) + sagnac + rcv_ddt - sat_ddt
    r = (est - dopp_rng_rate) / var
    return jnp.where(valid, r, 0.0)


def clock_drift_residual(rcv_ddt, mask=None):
    """Consecutive-epoch clock-drift tie: r_k = ddt_k − ddt_{k+1}."""
    r = rcv_ddt[:-1] - rcv_ddt[1:]
    if mask is not None:
        r = jnp.where(mask, r, 0.0)
    return r
