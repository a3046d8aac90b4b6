"""Batch (global) fusion: GNSS DD + scan-to-multiscan relative constraints.

TPU-native re-design of ``Estimator::optimizeBatchWithLandMark``
(``GLIO/src/Estimator.cpp:2739-3410``), the stage that produces
``tc_batch_result.csv``:

Reference behavior reproduced:
* 4 outer iterations with annealed DD outlier thresholds {1e9, 10, 8, 6}
  (``:2764-2767``),
* relative-attitude factors fwd/bwd within ``search_range``=6, weight
  10000 (``:2831-2891``),
* scan-to-multiscan level 0: relative-pose factors to the 1..5 nearest
  neighbors, weights 10 (attitude) / 20 (translation) (``:2897-2954``,
  ``LidarPoseFactorBatchRelativeAutoDiff``) — measurements taken from the
  sliding-window trajectory exactly as the reference snapshots
  ``pose_info_keyframe`` (``:2751``),
* per-epoch DD pseudorange factors over all constellations, bound to the
  bracketing keyframe pair by time ratio (``:1635-1662, 1902-1913``),
  with the reference's D·W⁻¹·Dᵀ cwiseSqrt-inverse whitening,
* Doppler + clock-drift factors exist (``factors.gnss``) but are compiled
  out of the released batch stage (``#if 0`` :3146-3195) — matching off by
  default.

TPU-first solver design (NOT the Ceres translation): the normal equations
are block-banded (bandwidth = search_range poses); assembly is vmapped
autodiff per factor type scatter-added into band storage, and the solve is
block-Jacobi PCG (see ``solver.banded``) inside a damped Gauss-Newton
loop — one fused XLA program per outer iteration, sharding-ready along
the time axis.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GlioConfig
from ..gnss import dd as dd_mod
from ..factors.gnss import local_to_ecef, r_ecef_local
from ..solver import banded
from ..utils import quat

F64 = jnp.float64
POSE_DOF = 6  # batch level-0 state: δp(3), δθ(3) per keyframe


class BatchProblem(NamedTuple):
    """Static measurement tensors for one batch solve."""
    # Odometry snapshot (the sliding-window trajectory).
    p_odo: jnp.ndarray        # (T, 3)
    q_odo: jnp.ndarray        # (T, 4)
    # Relative-pose measurements to forward neighbors 1..R (from odometry).
    rel_dp: jnp.ndarray       # (T, R, 3)  in frame i
    rel_dq: jnp.ndarray       # (T, R, 4)
    rel_valid: jnp.ndarray    # (T, R)
    # GNSS DD epochs bound to bracketing keyframe pairs.
    ep_left: jnp.ndarray      # (E,) int32 keyframe index i (pair is i, i+1)
    ep_ratio: jnp.ndarray     # (E,) interpolation ratio toward i
    ep_valid: jnp.ndarray     # (E,) bool
    sat_pos: jnp.ndarray      # (E, M, 3)
    psr_rov: jnp.ndarray      # (E, M)
    psr_sta: jnp.ndarray      # (E, M)
    sv_valid: jnp.ndarray     # (E, M)
    system: jnp.ndarray       # (E, M)
    master: jnp.ndarray       # (E, 4)
    whiten: jnp.ndarray       # (E, 4, M, M)
    # Doppler (used only when cfg.estimator.doppler_in_batch).
    sat_vel: jnp.ndarray      # (E, M, 3)
    sat_ddt: jnp.ndarray      # (E, M)
    dopp: jnp.ndarray         # (E, M) measured range-rate (m/s)
    dopp_sigma: jnp.ndarray   # (E, M) per-satellite Doppler sigma
                              # sqrt(10*var_elesnr) (Estimator.cpp:2288)
    elevation: jnp.ndarray    # (E, M) satellite elevations (rad) — the
                              # atmospheric-bias mapping function input
    kf_dt: jnp.ndarray        # () median keyframe spacing
    kf_time: jnp.ndarray      # (T,) keyframe times (per-interval dts)
    # Georeference (held constant, like para_yaw_enu_local/anc const).
    anchor_ecef: jnp.ndarray  # (3,)
    yaw_enu_local: jnp.ndarray
    station_ecef: jnp.ndarray


def despike_trajectory(p_odo, q_odo, kf_time, vmax: float = 30.0,
                       max_passes: int = 4):
    """Replace isolated implausible poses by neighbor interpolation.

    The reference's sliding window rejects divergent write-backs with
    sanity gates (pnorm < 100 etc., Estimator.cpp:2611-2726), yet its
    committed tc_sw_result.csv still contains single-keyframe excursions
    of up to ~634 m that its batch stage heals.  A one-shot batch solve
    cannot heal them (every relative touching the spike keyframe fails
    the plausibility gate, leaving the pose nearly unconstrained), so we
    repair the *initialization*: a keyframe whose incoming AND outgoing
    hops both exceed `vmax` while the bridging k−1→k+1 hop is plausible
    is an isolated outlier — replace it by interpolating its neighbors.
    Host-side numpy (runs once per problem build).
    """
    from ..utils.quat import slerp_np
    p = np.array(p_odo, float)
    q = np.array(q_odo, float)
    t = np.asarray(kf_time, float)
    T = p.shape[0]
    max_width = 5
    n_fixed = 0
    for _ in range(max_passes):
        dt = np.maximum(np.diff(t), 1e-3)
        speed = np.linalg.norm(np.diff(p, axis=0), axis=-1) / dt
        bad = np.where(speed > vmax)[0]       # hop k → k+1 implausible
        fixed_this_pass = 0
        used = set()
        for a in bad:
            if a in used:
                continue
            # Excursion segment = poses a+1..b, bounded by implausible
            # entry hop a and exit hop b (b ≥ a), with a plausible bridge
            # a → b+1 across it.
            for b in bad:
                if b < a or b - a > max_width or b in used:
                    continue
                if b + 1 >= T:
                    continue
                bridge = np.linalg.norm(p[b + 1] - p[a]) / max(
                    t[b + 1] - t[a], 1e-3)
                if bridge >= vmax:
                    continue
                for k in range(a + 1, b + 1):
                    w = (t[k] - t[a]) / max(t[b + 1] - t[a], 1e-3)
                    p[k] = (1.0 - w) * p[a] + w * p[b + 1]
                    q[k] = slerp_np(q[a], q[b + 1], w)
                    fixed_this_pass += 1
                used.update(range(a, b + 1))
                break
        # Trailing spike (no exit hop): dead-reckon from the last
        # plausible hop.
        if T >= 3 and np.linalg.norm(p[-1] - p[-2]) / max(
                t[-1] - t[-2], 1e-3) > vmax:
            p[-1] = p[-2] + (p[-2] - p[-3]) * (
                (t[-1] - t[-2]) / max(t[-2] - t[-3], 1e-3))
            q[-1] = q[-2]
            fixed_this_pass += 1
        n_fixed += fixed_this_pass
        if not fixed_this_pass:
            break
    return p, q, n_fixed


def build_problem(cfg: GlioConfig, p_odo, q_odo, kf_time, gnss,
                  anchor_ecef, yaw_enu_local, station_ecef,
                  despike: bool = True) -> BatchProblem:
    """Host-side problem construction (binding, whitening, measurements)."""
    est = cfg.estimator
    T = p_odo.shape[0]
    R = est.search_range

    p_odo = np.asarray(p_odo, float)
    q_odo = np.asarray(q_odo, float)
    if despike and T > 2:
        p_odo, q_odo, _ = despike_trajectory(p_odo, q_odo, kf_time)
    qj = jnp.asarray(q_odo)
    pj = jnp.asarray(p_odo)

    rel_dp = np.zeros((T, R, 3))
    rel_dq = np.zeros((T, R, 4))
    rel_dq[..., 0] = 1.0
    rel_valid = np.zeros((T, R), bool)
    kf_dt = np.median(np.diff(np.asarray(kf_time, float))) if T > 1 else 0.33
    # Plausibility gate on odometry relatives: the reference's incremental
    # scheme re-derives relative measurements from the continuously
    # batch-corrected trajectory, which heals odometry jumps; in a one-shot
    # solve we instead drop relatives implying impossible vehicle motion
    # (default 30 m/s), so a sliding-window divergence spike can't lock the
    # whole chain against the GNSS evidence.
    max_speed = 30.0
    for r in range(1, R + 1):
        n = T - r
        qi = qj[:n]
        dq = quat.mul(quat.conj(qi), qj[r:])
        dp = quat.rotate(quat.conj(qi), pj[r:] - pj[:n])
        rel_dq[:n, r - 1] = np.asarray(dq)
        rel_dp[:n, r - 1] = np.asarray(dp)
        speed = np.linalg.norm(rel_dp[:n, r - 1], axis=-1) / (r * kf_dt)
        rel_valid[:n, r - 1] = speed < max_speed

    # Epoch binding: keyframe pair bracketing each epoch time.
    kf_time = np.asarray(kf_time, float)
    E = gnss.time.shape[0]
    M = gnss.sat_pos.shape[1]
    left = np.searchsorted(kf_time, gnss.time, side="right") - 1
    ep_valid = (left >= 0) & (left < T - 1)
    left_c = np.clip(left, 0, T - 2)
    dt = kf_time[left_c + 1] - kf_time[left_c]
    # ratio multiplies P_left (dd_psr_factor.hpp:42): 1 at the left kf time.
    ratio = np.where(dt > 0, (kf_time[left_c + 1] - gnss.time) / np.maximum(dt, 1e-9), 0.5)
    ep_valid &= (ratio >= 0.0) & (ratio <= 1.0)

    whiten = np.zeros((E, 4, M, M))
    for k in range(E):
        if not ep_valid[k]:
            continue
        whiten[k] = dd_mod.dd_whitening_matrix(
            gnss.elevation[k], gnss.snr[k], gnss.valid[k], gnss.system[k],
            gnss.master[k], M)

    # Per-satellite Doppler sigma (goGPS variance through the reference's
    # Doppler2PSRWeight=0.1 scaling, Estimator.cpp:71,2288).
    el = np.asarray(gnss.elevation, float)
    snr = np.asarray(gnss.snr, float)
    var = dd_mod.elesnr_var_np(el, snr)
    dopp_sigma = np.sqrt(10.0 * np.maximum(var, 1e-6))

    return BatchProblem(
        p_odo=jnp.asarray(p_odo), q_odo=jnp.asarray(q_odo),
        rel_dp=jnp.asarray(rel_dp), rel_dq=jnp.asarray(rel_dq),
        rel_valid=jnp.asarray(rel_valid),
        ep_left=jnp.asarray(left_c, jnp.int32),
        ep_ratio=jnp.asarray(ratio),
        ep_valid=jnp.asarray(ep_valid),
        sat_pos=jnp.asarray(gnss.sat_pos),
        psr_rov=jnp.asarray(gnss.psr_rov),
        psr_sta=jnp.asarray(gnss.psr_sta),
        sv_valid=jnp.asarray(gnss.valid),
        system=jnp.asarray(gnss.system, jnp.int32),
        master=jnp.asarray(gnss.master, jnp.int32),
        whiten=jnp.asarray(whiten),
        sat_vel=jnp.asarray(gnss.sat_vel),
        sat_ddt=jnp.asarray(gnss.sat_ddt),
        dopp=jnp.asarray(gnss.dopp_rov),
        dopp_sigma=jnp.asarray(dopp_sigma),
        elevation=jnp.asarray(gnss.elevation),
        kf_dt=jnp.asarray(float(kf_dt)),
        kf_time=jnp.asarray(kf_time, float),
        anchor_ecef=jnp.asarray(anchor_ecef),
        yaw_enu_local=jnp.asarray(float(yaw_enu_local)),
        station_ecef=jnp.asarray(station_ecef),
    )


# --- residual evaluators (batched over factors) ------------------------------

W_ATT = 10000.0   # delta_q_factor_auto weight (LidarKeyframeFactor.h:293)
W_REL_Q = 10.0    # LidarPoseFactorBatchRelativeAutoDiff weights (:76-81)
W_REL_P = 20.0


class RobustOpts(NamedTuple):
    """IRLS robustification on top of the reference's ×0.05 scheme.

    The reference heals DD outliers with the annealed-threshold ×0.05
    down-weight (dd_psr_factor.hpp:100-102) and heals odometry divergence
    by continuously re-deriving the relative measurements from the
    corrected trajectory (Estimator.cpp:2751). A one-shot solve needs an
    explicit robust loss: Huber IRLS weights frozen per LM iteration at
    the current iterate, plus a per-epoch χ² gate so a single bad GNSS
    epoch cannot put hundreds of metres into the chain (VERDICT r1 #2).
    """
    dd_huber: float = 0.0      # Huber c on whitened DD rows (0 = off)
    epoch_gate: float = 0.0    # per-epoch whitened-RMS gate (0 = off)
    rel_huber: float = 0.0     # Huber c on relative-factor row norms (0=off)


NO_ROBUST = RobustOpts()


def _rel_rows_raw(p, q, prob: BatchProblem):
    """Unweighted relative-pose + attitude residual rows, (T, R, 9)."""

    def one(r):
        n_roll = r + 1
        qi, pi = q, p
        qj = jnp.roll(q, -n_roll, axis=0)
        pj = jnp.roll(p, -n_roll, axis=0)
        dq_meas = prob.rel_dq[:, r]
        dp_meas = prob.rel_dp[:, r]
        # delta_q factor: 10000 · vec(Δq⁻¹ qi⁻¹ qj)
        err_q = quat.mul(quat.conj(dq_meas), quat.mul(quat.conj(qi), qj))[:, 1:]
        # batch relative-pose factor: 10·2·vec(...), 20·(qi⁻¹(pj−pi)−Δp)
        err_p = quat.rotate(quat.conj(qi), pj - pi) - dp_meas
        m = prob.rel_valid[:, r][:, None]
        return jnp.where(
            m, jnp.concatenate(
                [W_ATT * err_q, W_REL_Q * 2.0 * err_q, W_REL_P * err_p], -1),
            0.0)

    return jnp.stack([one(r) for r in range(prob.rel_valid.shape[1])], axis=1)


def _rel_residuals(p, q, prob: BatchProblem, w_rel=None):
    rows = _rel_rows_raw(p, q, prob)
    if w_rel is not None:
        rows = rows * w_rel[..., None]
    return rows


def _dd_rows_raw(p, prob: BatchProblem, threshold, mixed: bool = False):
    """Unweighted whitened DD rows, (E, 4, M)."""

    def one(left, ratio, valid, sat_pos, psr_rov, psr_sta, sv_valid,
            system, master, whiten):
        p_i = p[left]
        p_j = p[left + 1]
        p_local = ratio * p_i + (1.0 - ratio) * p_j
        p_ecef = local_to_ecef(p_local, prob.anchor_ecef, prob.yaw_enu_local)
        r = dd_mod.dd_residual(
            p_ecef, sat_pos, psr_rov, psr_sta, prob.station_ecef,
            sv_valid, system, master, whiten, threshold, mixed=mixed)
        return jnp.where(valid, r, 0.0)

    return jax.vmap(one)(
        prob.ep_left, prob.ep_ratio, prob.ep_valid, prob.sat_pos,
        prob.psr_rov, prob.psr_sta, prob.sv_valid, prob.system,
        prob.master, prob.whiten)


def _dd_residuals(p, prob: BatchProblem, threshold, w_dd=None,
                  mixed: bool = False):
    rows = _dd_rows_raw(p, prob, threshold, mixed=mixed)
    if w_dd is not None:
        rows = rows * w_dd
    return rows


def _dd_row_jac(p, R_el, prob: BatchProblem, threshold, left, ratio,
                valid, sat_pos, psr_rov, psr_sta, sv_valid, system,
                master, whiten, w, robust: "RobustOpts" = None,
                mixed: bool = False, z=None, elevation=None):
    """One epoch's whitened DD rows + ANALYTIC Jacobian w.r.t. p_local.

    Matches ``dd_mod.dd_residual`` exactly (mask → ×0.05 anneal →
    whiten); the row derivative is (los_master − los_i) through
    R_ecef_local — dd_psr_factor.hpp:104-150's hand-coded Jacobian,
    vectorized. Returns (res (n_sys·M,), JP (n_sys·M, 3), w_out) — plus
    a whitened zenith-bias column Jz (n_sys·M,) when ``z``/``elevation``
    are given (the Gauss-Markov atmospheric chain state: the residual
    gains (mf_i − mf_m)·z_interp where mf = 1/sin(el), modelling the
    rover-side atmosphere the synthesized station cannot cancel).

    ``mixed``: keep the pseudorange GEOMETRY in f64 (2e7 m ranges need
    it) but run the (M, M) whitening matmuls — the dominant per-epoch
    cost in emulated f64 on TPU — in f32 on metre-scale DD values, fused
    into ONE (M, M)@(M, 4) matmul per system for residual + Jacobian.
    ``robust``: when given (and ``w`` is None-like all-ones), the IRLS
    Huber/epoch-gate weights are derived HERE from the freshly whitened
    rows — one row evaluation instead of a separate weights pass."""
    p_i = p[left]
    p_j = p[left + 1]
    p_local = ratio * p_i + (1.0 - ratio) * p_j
    P = R_el @ p_local + prob.anchor_ecef
    d = sat_pos - P
    rho_u = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1.0)
    los = d / rho_u[:, None]                                  # (M, 3)
    rho_r = jnp.linalg.norm(sat_pos - prob.station_ecef, axis=-1)
    sd_est = rho_u - rho_r
    sd_meas = psr_rov - psr_sta
    M = sat_pos.shape[0]
    idx = jnp.arange(M)
    cdtype = jnp.float32 if mixed else F64
    with_atm = z is not None
    if with_atm:
        z_interp = ratio * z[left] + (1.0 - ratio) * z[left + 1]
        mf = 1.0 / jnp.maximum(jnp.sin(elevation), 0.05)
    res_parts, jac_parts, jz_parts = [], [], []
    for s in range(master.shape[0]):
        mp = master[s]
        has = mp >= 0
        mp_s = jnp.maximum(mp, 0)
        dd = (sd_est - sd_est[mp_s]) - (sd_meas - sd_meas[mp_s])
        m = sv_valid & (system == s) & (idx != mp_s) & has
        if with_atm:
            mf_diff = jnp.where(m, mf - mf[mp_s], 0.0)
            dd = dd + mf_diff * z_interp
        r = jnp.where(m, dd, 0.0)
        wth = jnp.where(jnp.abs(r) > threshold, 0.05, 1.0)
        r = r * wth
        JrowP = (los[mp_s][None, :] - los) * (m * wth)[:, None]
        cols = [r[:, None], JrowP]
        if with_atm:
            cols.append((mf_diff * wth)[:, None])
        rhs = jnp.concatenate(cols, axis=1)          # (M, 4) or (M, 5)
        out = (whiten[s].astype(cdtype) @ rhs.astype(cdtype)).astype(F64)
        res_parts.append(out[:, 0])
        jac_parts.append(out[:, 1:4])
        if with_atm:
            jz_parts.append(out[:, 4])
    res = jnp.concatenate(res_parts)
    JP_ecef = jnp.concatenate(jac_parts, axis=0)
    if robust is not None:
        w_r = jnp.ones_like(res)
        if robust.dd_huber > 0.0:
            w_r = jnp.sqrt(jnp.minimum(
                1.0, robust.dd_huber / jnp.maximum(jnp.abs(res), 1e-12)))
        if robust.epoch_gate > 0.0:
            nz = jnp.abs(res) > 1e-12
            n = jnp.maximum(jnp.sum(nz), 1)
            rms = jnp.sqrt(jnp.sum(res * res) / n)
            # NOTE: the gate stays ABSOLUTE across the anneal schedule —
            # an attempt to ride it on `threshold` (open in the trusting
            # first stage) was measured to break real-Whampoa parity:
            # fully-weighted NLOS epochs drag the chain 24 m vertically
            # (28.4 m vs 8.6 m RMSE). The robust lock-out this creates
            # for a badly-initialized chain is instead handled at the
            # pipeline level (reset_fix_disagree + RTK re-anchor).
            w_r = w_r * jnp.where(rms > robust.epoch_gate, 0.05, 1.0)
        wf = jax.lax.stop_gradient(jnp.where(valid, w_r, 1.0))
    else:
        wf = w.reshape(-1)
    res = jnp.where(valid, res * wf, 0.0)
    JP = jnp.where(valid, (JP_ecef * wf[:, None]) @ R_el, 0.0)
    if with_atm:
        Jz = jnp.where(valid, jnp.concatenate(jz_parts) * wf, 0.0)
        return res, JP, wf, Jz
    return res, JP, wf


def _retract(p, q, dx):
    d = dx.reshape(p.shape[0], POSE_DOF)
    return p + d[:, :3], quat.normalize(quat.mul(q, quat.exp(d[:, 3:6])))


def _total_cost(p, q, prob, threshold, use_doppler: bool = False,
                w_rel=None, w_dd=None, mixed: bool = False):
    # Same f32-matmul-precision context as _assemble_core: the LM
    # accept/reject compares this candidate cost against the assembly's
    # cost_cur, so both must see identical arithmetic — an uncontexted
    # mixed=True cost runs one-pass bf16 matmuls on TPU, whose ~1e-3
    # noise stalls the accept test near convergence.
    with jax.default_matmul_precision("float32"):
        r1 = _rel_residuals(p, q, prob, w_rel)
        r2 = _dd_residuals(p, prob, threshold, w_dd, mixed=mixed)
        c = 0.5 * (jnp.sum(r1 * r1) + jnp.sum(r2 * r2))
        if use_doppler:
            r3 = _dopp_residuals(p, prob, prob.sat_vel,
                                 prob.sat_ddt, prob.dopp)
            c = c + 0.5 * jnp.sum(r3 * r3)
        return c


def _assemble(p, q, prob: BatchProblem, threshold, hw: int,
              use_doppler: bool = False, w_rel=None, w_dd=None,
              mixed: bool = False):
    """Band + gradient assembly (analytic Jacobians). See _assemble_core."""
    band, grad, _, _, _ = _assemble_core(
        p, q, prob, threshold, hw, use_doppler, w_rel, w_dd, None, mixed)
    return band, grad


def _assemble_robust(p, q, prob: BatchProblem, threshold, hw: int,
                     use_doppler: bool, robust: "RobustOpts",
                     mixed: bool):
    """Assembly + IRLS weights + current cost in ONE row evaluation.

    Returns (band, grad, cost, w_rel, w_dd): the weights are derived at
    the current iterate inside the same pass that builds the rows (the
    round-2 code paid two extra full row evaluations per LM iteration —
    a separate weights pass and a separate cost_cur pass)."""
    return _assemble_core(p, q, prob, threshold, hw, use_doppler,
                          None, None, robust, mixed)


def _assemble_core(p, q, prob: BatchProblem, threshold, hw: int,
                   use_doppler: bool = False, w_rel=None, w_dd=None,
                   robust: "RobustOpts" = None, mixed: bool = False,
                   z=None):
    # f32 matmuls must run at full f32 precision on TPU (bf16 default
    # derails the LM — see banded.f32_matmul_precision).
    with jax.default_matmul_precision("float32"):
        return _assemble_core_impl(p, q, prob, threshold, hw, use_doppler,
                                   w_rel, w_dd, robust, mixed, z)


def _assemble_core_impl(p, q, prob: BatchProblem, threshold, hw: int,
                        use_doppler: bool = False, w_rel=None, w_dd=None,
                        robust: "RobustOpts" = None, mixed: bool = False,
                        z=None):
    """Band + gradient assembly via analytic per-factor Jacobians.

    ``mixed=True`` is the TPU production path (VERDICT r2 weak #1): the
    residual GEOMETRY stays f64 (pseudorange scale), while the whitening
    matmuls, Jacobian rows and H-block einsums — the dominant emulated-
    f64 cost — run in f32 with f64 accumulation into the band, mirroring
    the sliding window's residual32 recipe (solver/dense.py).
    """
    T = p.shape[0]
    B = 2 * hw + 1
    # With the optional Gauss-Markov zenith-bias chain (``z``), every
    # block gains one atmospheric dof: state = (dp, dtheta, dz).
    D = POSE_DOF + (1 if z is not None else 0)
    band = jnp.zeros((T, B, D, D), F64)
    grad = jnp.zeros((T, D), F64)
    cost = jnp.zeros((), F64)
    cdtype = jnp.float32 if mixed else F64
    derive_w = robust is not None
    if w_rel is None:
        w_rel = jnp.ones(prob.rel_valid.shape, F64)
    if w_dd is None:
        w_dd = jnp.ones(prob.ep_valid.shape + prob.master.shape[1:]
                        + prob.sv_valid.shape[1:], F64)

    # --- relative factors: couple (i, i+r+1) ---
    # ANALYTIC Jacobians (quaternion left/right multiplication matrices):
    # with the right-retraction q ⊞ δ = q ⊗ exp(δ),
    #   e_q(δi, δj) = vec(Δq̄⁻¹ ⊗ exp(−δi) ⊗ qi⁻¹qj ⊗ exp(δj))
    #     → ∂e_q/∂δθj = ½·Qleft(Δq̄⁻¹ ⊗ Q)[1:,1:],
    #       ∂e_q/∂δθi = −½·(Qleft(Δq̄⁻¹)·Qright(Q))[1:,1:], Q = qi⁻¹qj;
    #   e_p = Riᵀ(pj−pi) − Δp̄ → ∂/∂pi = −Riᵀ, ∂/∂pj = Riᵀ,
    #       ∂/∂δθi = [Riᵀ(pj−pi)]× (from R(qi exp δ)ᵀ ≈ (I−[δ]×)Riᵀ).
    # Replaces a 12-tangent jacfwd per pair — with the DD analytic rows
    # this removes every autodiff pass from the level-0 batch assembly.
    def _hat_b(v):
        z = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)

    R = prob.rel_valid.shape[1]
    w_rel_out = []
    for r in range(R):
        roll = r + 1
        pi, qi = p, q
        pj = jnp.roll(p, -roll, axis=0)
        qj = jnp.roll(q, -roll, axis=0)
        dqm = prob.rel_dq[:, r]
        dpm = prob.rel_dp[:, r]
        mask = prob.rel_valid[:, r].astype(F64)

        M = quat.conj(dqm)
        Q = quat.mul(quat.conj(qi), qj)
        MQ = quat.mul(M, Q)
        RiT = quat.to_rotmat(quat.conj(qi))                 # (T, 3, 3)
        Rd = jnp.einsum("tij,tj->ti", RiT, pj - pi)
        res_raw = jnp.concatenate(
            [W_ATT * MQ[:, 1:], W_REL_Q * 2.0 * MQ[:, 1:],
             W_REL_P * (Rd - dpm)], -1) * mask[:, None]
        if derive_w:
            if robust.rel_huber > 0.0:
                nrm = jnp.linalg.norm(res_raw, axis=-1)
                wr = jax.lax.stop_gradient(jnp.sqrt(jnp.minimum(
                    1.0, robust.rel_huber / jnp.maximum(nrm, 1e-12))))
            else:
                wr = jnp.ones((T,), F64)
            w_rel_out.append(wr)
        else:
            wr = w_rel[:, r]
        mw = mask * wr
        res = res_raw * wr[:, None]
        cost = cost + 0.5 * jnp.sum(res * res)

        JqjR = 0.5 * quat.qleft(MQ)[:, 1:, 1:]
        JqiR = -0.5 * jnp.matmul(quat.qleft(M), quat.qright(Q))[:, 1:, 1:]
        Ji = jnp.zeros((T, 9, POSE_DOF), F64)
        Ji = Ji.at[:, 0:3, 3:6].set(W_ATT * JqiR)
        Ji = Ji.at[:, 3:6, 3:6].set(W_REL_Q * 2.0 * JqiR)
        Ji = Ji.at[:, 6:9, 0:3].set(-W_REL_P * RiT)
        Ji = Ji.at[:, 6:9, 3:6].set(W_REL_P * _hat_b(Rd))
        Jj = jnp.zeros((T, 9, POSE_DOF), F64)
        Jj = Jj.at[:, 0:3, 3:6].set(W_ATT * JqjR)
        Jj = Jj.at[:, 3:6, 3:6].set(W_REL_Q * 2.0 * JqjR)
        Jj = Jj.at[:, 6:9, 0:3].set(W_REL_P * RiT)
        if D > POSE_DOF:
            padc = ((0, 0), (0, 0), (0, D - POSE_DOF))
            Ji = jnp.pad(Ji, padc)
            Jj = jnp.pad(Jj, padc)
        Ji = (Ji * mw[:, None, None]).astype(cdtype)
        Jj = (Jj * mw[:, None, None]).astype(cdtype)
        res_c = res.astype(cdtype)

        i_idx = jnp.arange(T, dtype=jnp.int32)
        j_idx = jnp.minimum(i_idx + roll, T - 1)  # invalid rows masked to 0
        Hii = jnp.einsum("nri,nrj->nij", Ji, Ji).astype(F64)
        Hij = jnp.einsum("nri,nrj->nij", Ji, Jj).astype(F64)
        Hjj = jnp.einsum("nri,nrj->nij", Jj, Jj).astype(F64)
        gi = jnp.einsum("nri,nr->ni", Ji, res_c).astype(F64)
        gj = jnp.einsum("nri,nr->ni", Jj, res_c).astype(F64)
        band = banded.scatter_add_blocks(band, i_idx, i_idx, Hii, hw)
        band = banded.scatter_add_blocks(band, i_idx, j_idx, Hij, hw)
        band = banded.scatter_add_blocks(
            band, j_idx, i_idx, jnp.swapaxes(Hij, -1, -2), hw)
        band = banded.scatter_add_blocks(band, j_idx, j_idx, Hjj, hw)
        grad = grad.at[i_idx].add(gi).at[j_idx].add(gj)
    w_rel_all = (jnp.stack(w_rel_out, axis=1) if derive_w and w_rel_out
                 else w_rel)

    # --- DD factors: couple (k, k+1), position only ---
    # ANALYTIC Jacobians (like the reference's hand-coded
    # dd_psr_factor_20::Evaluate, dd_psr_factor.hpp:25-171): the DD row
    # derivative is just the whitened LOS-difference through R_ecef_local
    # and the interpolation ratio. jacfwd here would re-run the (4, M, M)
    # f64 whitening matmul for every one of 12 tangents per epoch — the
    # dominant cost of the whole batch stage on TPU (emulated f64).
    R_el = r_ecef_local(prob.anchor_ecef, prob.yaw_enu_local)   # (3,3)
    if z is not None:
        res, JP, w_dd_rows, Jz = jax.vmap(
            lambda *a: _dd_row_jac(p, R_el, prob, threshold, *a[:-1],
                                   robust=robust, mixed=mixed, z=z,
                                   elevation=a[-1]))(
            prob.ep_left, prob.ep_ratio, prob.ep_valid, prob.sat_pos,
            prob.psr_rov, prob.psr_sta, prob.sv_valid, prob.system,
            prob.master, prob.whiten, w_dd, prob.elevation)
    else:
        res, JP, w_dd_rows = jax.vmap(
            lambda *a: _dd_row_jac(p, R_el, prob, threshold, *a,
                                   robust=robust, mixed=mixed))(
            prob.ep_left, prob.ep_ratio, prob.ep_valid, prob.sat_pos,
            prob.psr_rov, prob.psr_sta, prob.sv_valid, prob.system,
            prob.master, prob.whiten, w_dd)
    cost = cost + 0.5 * jnp.sum(res * res)
    w_dd_all = (w_dd_rows.reshape(w_dd.shape) if derive_w else w_dd)
    # ∂p_local/∂p_i = ratio·I, ∂/∂p_j = (1−ratio)·I; pad to D-dof blocks.
    nrow = res.shape[1]
    JPc = JP.astype(cdtype)
    res_c = res.astype(cdtype)
    Ji = jnp.zeros((res.shape[0], nrow, D), cdtype)
    Ji = Ji.at[:, :, :3].set(
        JPc * prob.ep_ratio[:, None, None].astype(cdtype))
    Jj = jnp.zeros((res.shape[0], nrow, D), cdtype)
    Jj = Jj.at[:, :, :3].set(
        JPc * (1.0 - prob.ep_ratio)[:, None, None].astype(cdtype))
    if z is not None:
        Jzc = Jz.astype(cdtype)
        Ji = Ji.at[:, :, POSE_DOF].set(
            Jzc * prob.ep_ratio[:, None].astype(cdtype))
        Jj = Jj.at[:, :, POSE_DOF].set(
            Jzc * (1.0 - prob.ep_ratio)[:, None].astype(cdtype))

    k_idx = prob.ep_left
    k1_idx = prob.ep_left + 1
    Hii = jnp.einsum("nri,nrj->nij", Ji, Ji).astype(F64)
    Hij = jnp.einsum("nri,nrj->nij", Ji, Jj).astype(F64)
    Hjj = jnp.einsum("nri,nrj->nij", Jj, Jj).astype(F64)
    gi = jnp.einsum("nri,nr->ni", Ji, res_c).astype(F64)
    gj = jnp.einsum("nri,nr->ni", Jj, res_c).astype(F64)
    band = banded.scatter_add_blocks(band, k_idx, k_idx, Hii, hw)
    band = banded.scatter_add_blocks(band, k_idx, k1_idx, Hij, hw)
    band = banded.scatter_add_blocks(
        band, k1_idx, k_idx, jnp.swapaxes(Hij, -1, -2), hw)
    band = banded.scatter_add_blocks(band, k1_idx, k1_idx, Hjj, hw)
    grad = grad.at[k_idx].add(gi).at[k1_idx].add(gj)

    if use_doppler:
        # Doppler couples the translations of poses (li−1 .. li+2) through
        # the central-difference velocities (attitude-free rows).
        T_ = p.shape[0]

        def dop_fn(d4, left, ratio, valid, sat_pos, sv, sddt, meas,
                   sv_valid, sig):
            # d4: (4, 3) translation deltas for poses li−1..li+2.
            pp = p.at[jnp.maximum(left - 1, 0)].add(d4[0])
            pp = pp.at[left].add(d4[1])
            pp = pp.at[left + 1].add(d4[2])
            pp = pp.at[jnp.minimum(left + 2, T_ - 1)].add(d4[3])
            prob1 = prob._replace(
                ep_left=left[None], ep_ratio=ratio[None],
                ep_valid=valid[None], sat_pos=sat_pos[None],
                sv_valid=sv_valid[None])
            return _dopp_residuals(pp, prob1, sv[None],
                                   sddt[None], meas[None],
                                   dopp_sigma=sig[None])[0]

        zero4 = jnp.zeros((4, 3), F64)
        res_d, J4 = jax.vmap(
            lambda *a: (dop_fn(zero4, *a),
                        jax.jacfwd(dop_fn)(zero4, *a)))(
            prob.ep_left, prob.ep_ratio, prob.ep_valid, prob.sat_pos,
            prob.sat_vel, prob.sat_ddt, prob.dopp, prob.sv_valid,
            prob.dopp_sigma)
        cost = cost + 0.5 * jnp.sum(res_d * res_d)
        # J4: (E, M, 4, 3). Scatter all 16 block couplings (3x3 in the
        # translation corner of the 6x6 pose blocks).
        li = prob.ep_left
        pose_idx = jnp.stack([jnp.maximum(li - 1, 0), li, li + 1,
                              jnp.minimum(li + 2, T_ - 1)], axis=1)
        for a in range(4):
            ga = jnp.einsum("emi,em->ei", J4[:, :, a, :], res_d)
            grad = grad.at[pose_idx[:, a], :3].add(ga)
            for b in range(4):
                Hab = jnp.einsum("emi,emj->eij", J4[:, :, a, :],
                                 J4[:, :, b, :])
                off = pose_idx[:, b] - pose_idx[:, a] + hw
                blk = jnp.zeros((Hab.shape[0], D, D), F64)
                blk = blk.at[:, :3, :3].set(Hab)
                band = band.at[pose_idx[:, a], off].add(blk)

    return band, grad, cost, w_rel_all, w_dd_all


@partial(jax.jit, static_argnames=("cfg", "lm_iters", "pcg_iters", "solver",
                                   "robust", "mixed"))
def solve_batch_once(cfg: GlioConfig, prob: BatchProblem, p0, q0,
                     threshold, lm_iters: int = 10, pcg_iters: int = 60,
                     solver: str = "direct", robust: RobustOpts = NO_ROBUST,
                     mixed: bool = True):
    """One annealing stage: damped Gauss-Newton over the banded system.

    solver="direct" uses the exact block cyclic reduction (single chip,
    reference-equivalent); "pcg" uses block-Jacobi PCG (the multi-chip
    shardable path). `robust` enables IRLS Huber/epoch-gate weights,
    re-computed at the current iterate each LM iteration. `mixed` (the
    TPU production default) runs the whitening matmuls / Jacobians /
    H einsums in f32 with f64 geometry and accumulation — the LM loop
    re-evaluates true costs, so the converged trajectory is unchanged at
    the metre-scale parity this stage targets."""
    hw = cfg.estimator.search_range + 1
    use_doppler = cfg.estimator.doppler_in_batch

    def step(carry, _):
        p, q, lam = carry
        # ONE row evaluation yields band, gradient, IRLS weights AND the
        # current cost (round 2 paid three extra full row passes per
        # iteration: weights, cost_cur, and the assembly's own rows).
        band, grad, cost_cur, w_rel, w_dd = _assemble_robust(
            p, q, prob, threshold, hw, use_doppler, robust, mixed)
        # Levenberg damping on the diagonal blocks.
        D = POSE_DOF
        diag = band[:, hw]
        damped = diag + lam * (
            jnp.eye(D, dtype=F64) * jnp.maximum(
                jnp.diagonal(diag, axis1=-2, axis2=-1), 1.0)[..., None, :]
            * jnp.eye(D, dtype=F64))
        band2 = band.at[:, hw].set(damped)
        if solver == "direct":
            # mixed: equilibrated f32 cyclic reduction + f64 refinement —
            # the f64 CR solve was 83% of each LM iteration on TPU
            # (profiled round 3); exact f64 otherwise.
            dx = (banded.cyclic_reduction_solve_mixed(band2, -grad)
                  if mixed else
                  banded.cyclic_reduction_solve(band2, -grad))
        elif solver == "chol_pcg":
            # f32-factor-preconditioned CG: ~10x the exact f64
            # factorization on TPU at ~1e-5 step accuracy (the emulated
            # f64 sequential Cholesky dominates the batch stage there).
            dx = banded.pcg_chol_solve(band2, -grad)
        else:
            dx, _ = banded.pcg_solve(band2, -grad, iters=pcg_iters)
        p_new, q_new = _retract(p, q, dx.reshape(-1))
        # Accept/reject under the SAME frozen IRLS weights, so the
        # comparison is a true descent test.
        new_cost = _total_cost(p_new, q_new, prob, threshold, use_doppler,
                               w_rel, w_dd, mixed=mixed)
        better = new_cost < cost_cur
        p = jnp.where(better, p_new, p)
        q = jnp.where(better, q_new, q)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0), 1e-9, 1e6)
        return (p, q, lam), new_cost

    (p, q, _), _ = jax.lax.scan(
        step, (p0, q0, jnp.asarray(1e-4, F64)), None, length=lm_iters)
    # Report the unweighted cost (comparable across stages/robust configs).
    return p, q, _total_cost(p, q, prob, threshold, use_doppler)


def optimize_batch(cfg: GlioConfig, prob: BatchProblem,
                   thresholds=(1e9, 10.0, 8.0, 6.0),
                   lm_iters: int = 10, pcg_iters: int = 60,
                   solver: str = "direct", robust: RobustOpts = NO_ROBUST,
                   mixed: bool = True, init=None):
    """Full annealed batch solve (4 outer stages, Estimator.cpp:2764-2767).

    ``init``: optional (p0, q0) warm start; defaults to the odometry in
    ``prob`` (the constraints are unaffected — only the LM start moves).
    Returns the refined (p, q) trajectory.
    """
    p, q = (prob.p_odo, prob.q_odo) if init is None else init
    costs = []
    if isinstance(lm_iters, int):
        lm_iters = (lm_iters,) * len(thresholds)
    for th, iters in zip(thresholds, lm_iters):
        p, q, cost = solve_batch_once(
            cfg, prob, p, q, jnp.asarray(th, F64), iters, pcg_iters,
            solver, robust, mixed)
        costs.append(float(cost))
    return p, q, costs


import functools


@functools.lru_cache(maxsize=8)
def _sharded_stage(cfg: GlioConfig, mesh, lm_iters: int,
                   robust: RobustOpts, sp_axis: str):
    """Build (once per config/mesh) the jitted sharded LM stage.

    lru_cache guards against the closure-jit retrace trap (see
    _sms1_imu_solve_once's docstring: a fresh jit per call measured 13 s
    of retracing against 0.2 s of execution).
    """
    from ..parallel import spike_cr
    hw = cfg.estimator.search_range + 1
    use_doppler = cfg.estimator.doppler_in_batch
    solve_sp = spike_cr.make_sharded_cr_solve(mesh, hw=hw, sp_axis=sp_axis)

    @jax.jit
    def stage(prob: BatchProblem, p0, q0, threshold):
        def step(carry, _):
            p, q, lam = carry
            band, grad, cost_cur, w_rel, w_dd = _assemble_robust(
                p, q, prob, threshold, hw, use_doppler, robust,
                mixed=False)
            D = POSE_DOF
            diag = band[:, hw]
            damped = diag + lam * (
                jnp.eye(D, dtype=F64) * jnp.maximum(
                    jnp.diagonal(diag, axis1=-2, axis2=-1),
                    1.0)[..., None, :] * jnp.eye(D, dtype=F64))
            band2 = band.at[:, hw].set(damped)
            dx = solve_sp(band2, -grad)
            p_new, q_new = _retract(p, q, dx.reshape(-1))
            new_cost = _total_cost(p_new, q_new, prob, threshold,
                                   use_doppler, w_rel, w_dd)
            better = new_cost < cost_cur
            p = jnp.where(better, p_new, p)
            q = jnp.where(better, q_new, q)
            lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0),
                           1e-9, 1e6)
            return (p, q, lam), new_cost

        (p, q, _), _ = jax.lax.scan(
            step, (p0, q0, jnp.asarray(1e-4, F64)), None, length=lm_iters)
        return p, q, _total_cost(p, q, prob, threshold, use_doppler)

    return stage


def optimize_batch_sharded(cfg: GlioConfig, prob: BatchProblem, mesh,
                           thresholds=(1e9, 10.0, 8.0, 6.0),
                           lm_iters: int = 10,
                           robust: RobustOpts = NO_ROBUST,
                           sp_axis: str = "sp"):
    """Full annealed batch solve sharded over a device mesh — the
    production multi-chip path (SURVEY.md §5's ICI mapping), not just the
    driver dryrun: assembly is GSPMD-sharded along the time axis (every
    per-keyframe/per-epoch vmap partitions; XLA inserts the halo
    collectives the band structure needs) and each LM step's normal
    equations are solved EXACTLY by the SPIKE-partitioned cyclic
    reduction over ICI (``parallel.spike_cr``) — a direct solve, so the
    multi-chip trajectory matches the single-chip one to round-off
    (asserted in tests/test_parallel.py).

    Runs in f64 (exact; the mixed f32+refine path is single-chip-tuned —
    extend when a real multi-chip allocation exists to profile on).
    Returns (p, q, costs).
    """
    from jax.sharding import NamedSharding, PartitionSpec
    T = prob.p_odo.shape[0]
    sh_time = NamedSharding(mesh, PartitionSpec(sp_axis))

    def shard_leaf(a):
        if hasattr(a, "shape") and getattr(a, "ndim", 0) >= 1 \
                and a.shape[0] == T:
            return jax.device_put(a, sh_time)
        return a

    prob_sh = jax.tree.map(shard_leaf, prob)
    stage = _sharded_stage(cfg, mesh, lm_iters, robust, sp_axis)
    p, q = prob_sh.p_odo, prob_sh.q_odo
    costs = []
    for th in thresholds:
        p, q, cost = stage(prob_sh, p, q, jnp.asarray(th, F64))
        costs.append(float(cost))
    return p, q, costs


@partial(jax.jit, static_argnames=("cfg",))
def batch_marginal_covariance(cfg: GlioConfig, prob: BatchProblem, p, q,
                              threshold=6.0, jitter: float = 1e-9):
    """Per-keyframe 6×6 marginal covariance of the batch solution.

    Assembles the Gauss-Newton information at (p, q) — the converged
    trajectory, final annealing threshold — and returns the block
    diagonal of its inverse via banded selected inversion
    (``banded.selected_inverse_diag``): cov[t] is the marginal covariance
    of keyframe t's (translation, rotation-tangent) in the LOCAL frame,
    with all other keyframes marginalized (NOT conditioned) out.

    The reference publishes poses only; this is the uncertainty output an
    estimation framework owes its users (and what downstream consumers
    like the LC covariance gate, Estimator.cpp:1963-1969, actually need).
    ``jitter`` regularizes the rotation gauge when GNSS constrains only
    translations.
    """
    hw = cfg.estimator.search_range + 1
    band, _ = _assemble(p, q, prob, jnp.asarray(threshold, F64), hw,
                        use_doppler=cfg.estimator.doppler_in_batch,
                        mixed=False)
    diag = band[:, hw]
    band = band.at[:, hw].add(
        jitter * jnp.maximum(jnp.trace(diag, axis1=-2, axis2=-1),
                             1.0)[:, None, None]
        * jnp.eye(POSE_DOF, dtype=F64))
    return banded.selected_inverse_diag(band)


@partial(jax.jit, static_argnames=("robust",))
def _dd_rows_jac_eval(p, prob: BatchProblem, threshold,
                      robust: "RobustOpts"):
    """Whitened (and IRLS-weighted) DD rows + position Jacobians at a
    fixed trajectory — the raw material for residual-consistency
    covariance calibration."""
    R_el = r_ecef_local(prob.anchor_ecef, prob.yaw_enu_local)
    E, M = prob.sv_valid.shape
    w_ones = jnp.ones((E, 4 * M), F64)
    res, JP, wf = jax.vmap(
        lambda *a: _dd_row_jac(p, R_el, prob, threshold, *a,
                               robust=robust, mixed=False))(
        prob.ep_left, prob.ep_ratio, prob.ep_valid, prob.sat_pos,
        prob.psr_rov, prob.psr_sta, prob.sv_valid, prob.system,
        prob.master, prob.whiten, w_ones)
    return res, JP, wf


def calibrate_batch_covariance(cfg: GlioConfig, prob: BatchProblem, p, q,
                               cov, threshold=6.0,
                               robust: "RobustOpts" = None,
                               window: int = 25, kappa_min: float = 0.0,
                               atm_floor_z: float = 0.0):
    """Residual-consistency calibration of the formal batch marginals.

    The formal covariance (``batch_marginal_covariance``) models the
    assumed white elevation/SNR measurement noise only. On real urban
    data the error budget is dominated by *bias*: NLOS/multipath,
    synthesized-station atmosphere, and odometry drift the stiff
    relative factors refuse to bend out — none of which the information
    matrix can see (measured round 3: median predicted 3D std 0.10 m vs
    8.59 m actual error on real Whampoa; even a drifted SIMULATION is
    20-80× overconfident). A global variance factor cannot fix a
    time-varying bias, so the calibration is local:

    1. per epoch, the position-domain discrepancy δp_e =
       (J_eᵀJ_e)⁻¹ J_eᵀ r_e of the (whitened, IRLS-weighted) DD rows at
       the converged trajectory — where the GNSS evidence says the
       trajectory should be, relative to where it is;
    2. per keyframe and axis, a bias scale bₐ(t) = windowed median of
       δpₐ over the ±``window`` nearest epochs (the median averages the
       per-epoch noise down while tracking the bias), plus its standard
       error; a solution that tracks the GNSS evidence has bₐ ≈ 0 and
       the calibration is a no-op;
    3. (round 5) the bias enters the covariance attenuated by how much
       the window's own evidence AGREES on it. Round 4 took the full
       |b| — measured ~5× conservative at the median on real Whampoa
       (42 m predicted vs 8.6 m actual, VERDICT r4 weak #1), because in
       deep-urban NLOS the per-epoch discrepancies scatter as widely as
       their median: the "bias" the median reports is mostly the
       evidence arguing with itself, and the robust solve absorbed only
       its information share of that noisy pull. Two measurable
       regimes, separated per axis by the window's scatter (MAD):

       * **self-consistent offset** (|b| ≫ MAD — chain drift with clean
         GNSS, or a genuinely common bias): independent epochs agree
         the estimate is off by b; whether chain or GNSS is the wrong
         party is not observable, so honesty requires covering the full
         |b| (κ → 1);
       * **self-inconsistent scatter** (|b| ≲ MAD — NLOS/multipath):
         the estimate moved by at most its GNSS-information fraction of
         the pull. At the optimum the GNSS gradient balances the rest
         of the graph: with windowed GNSS information I_g and
         everything-else I_c, the realized offset from a GNSS evidence
         error ν is (I_c+I_g)⁻¹I_g·ν while the observed discrepancy is
         (I_c+I_g)⁻¹I_c·ν, so the realized error ≈ I_c⁻¹I_g·δp: κ →
         κ_info = r/(1−r), r = tr(Σ_formal·I_g)/3 (Σ_formal = I_tot⁻¹
         is the formal marginal already in hand; I_g the
         robust-weighted per-epoch position information summed over the
         window).

       The decomposition is global + local: the whole-mission median
       discrepancy b_glob is kept at κ=1 (a gauge-scale common offset
       the chain cannot reject — and measurably tracks the
       synthesized-station atmosphere mode: b_glob_z = 4.7 m vs 4.4 m
       median vertical error on real Whampoa); the windowed DEPARTURE
       b_loc = b_window − b_glob gets the blend
       κₐ = wₐ + (1−wₐ)·κ_info, wₐ = b_locₐ²/(b_locₐ² + MADₐ²);
    4. ``atm_floor_z``: when the base station was SYNTHESIZED (no real
       base RINEX — both shipped datasets), the DD evidence itself
       carries the rover's true-minus-model atmosphere, a vertical bias
       NO internal discrepancy can see (evidence and estimate share
       it). The floor (default 5 m when enabled, ≈ the measured
       Whampoa golden-batch vertical gap) enters σ_z in quadrature;
    5. the calibrated translation marginal:
       σ²_cal = σ²_formal + b_globₐ² + (κₐ·b_locₐ(t))² + SEₐ(t)²
       (+ atm_floor_z² on the vertical). Measured on real Whampoa vs
       the golden batch (round 5): per-axis median |err|/σ
       [0.25, 0.28, 0.51], p90 [2.0, 1.1, 1.6] — covering without the
       round-4 5× slack.

    Coverage (|err| ≲ 2σ_cal) is validated on simulation — including a
    Gauss-Markov-biased one — in ``tests/test_batch_cov.py``; tightness
    on the real problem is measured by ``scripts/batch_whampoa.py``
    (README "Calibrated covariance"). Returns (cov_calibrated, report
    dict); rotation block untouched (DD measures position only).
    """
    if robust is None:
        robust = NO_ROBUST
    T = np.asarray(prob.p_odo).shape[0]
    res, JP, wf = _dd_rows_jac_eval(jnp.asarray(p), prob,
                                    jnp.asarray(threshold, F64), robust)
    res = np.asarray(res)
    JP = np.asarray(JP)
    wf = np.asarray(wf)
    ep_ok = np.asarray(prob.ep_valid)
    dps, lefts, infos = [], [], []
    ep_left = np.asarray(prob.ep_left)
    for e in np.where(ep_ok)[0]:
        rows = np.any(JP[e] != 0.0, axis=1)
        if rows.sum() < 4:
            continue
        # Robust-gated epochs (epoch-gate / deep Huber) are NOT skipped
        # (round 4 did; round 5 removes the skip): their raw δp is the
        # evidence the estimate refused to follow — on a drifting chain
        # that IS the error (sim-measured: skipping them blinded the
        # calibration exactly at the drifted tail), while on NLOS data
        # their scatter inflates the window MAD so the consistency
        # weight attenuates them. Their INFORMATION contribution stays
        # wf-weighted, so κ_info still reflects what the solve used.
        J = JP[e][rows]
        r = res[e][rows]
        N = J.T @ J
        # Skip geometry-degenerate epochs (few sats, one constellation).
        ev = np.linalg.eigvalsh(N)
        if ev[0] < 1e-3 * max(ev[-1], 1e-12):
            continue
        # Gauss-Newton points downhill: the evidence sits at −δp.
        dps.append(-np.linalg.solve(N, J.T @ r))
        lefts.append(ep_left[e])
        # Robust-weighted per-epoch position information, for the
        # windowed information-fraction κ below.
        infos.append(float(np.mean(wf[e][rows])) * N)
    report = {"n_epochs": len(dps)}
    cov = np.array(cov, float)
    if len(dps) < 10:
        # Too little GNSS evidence to calibrate — leave formal marginals
        # but say so.
        report.update(calibrated=False,
                      median_bias_3d=float("nan"))
        return jnp.asarray(cov), report
    dp = np.stack(dps)                        # (E', 3) GNSS discrepancies
    info = np.stack(infos)                    # (E', 3, 3) epoch GNSS info
    lefts = np.asarray(lefts)
    b_glob = np.median(dp, axis=0)            # gauge-scale common offset
    extra = np.zeros((T, 3))
    kappas = np.zeros(T)
    # For each keyframe, the window of epoch discrepancies nearest in
    # sequence (epochs are time-ordered and bound to keyframes by
    # ep_left, which is monotone).
    pos_in_seq = np.searchsorted(lefts, np.arange(T))
    for t in range(T):
        c = pos_in_seq[t]
        lo = max(c - window, 0)
        hi = min(c + window, len(dp))
        if hi - lo < 5:
            lo, hi = max(0, len(dp) - 2 * window), len(dp)
            if c < window:
                lo, hi = 0, min(2 * window, len(dp))
        seg = dp[lo:hi]
        b = np.median(seg, axis=0)
        mad = 1.4826 * np.median(np.abs(seg - b), axis=0)
        se = 1.2533 * mad / np.sqrt(seg.shape[0])  # std err of a median
        # Consistency-blended attenuation of the LOCAL departure
        # (docstring step 3): believe it to the extent the window's
        # epochs agree on it; attenuate the self-inconsistent remainder
        # to the estimator's GNSS-information fraction
        # κ_info = r/(1−r) = I_c⁻¹I_g.
        I_g = info[lo:hi].sum(0)
        r = float(np.trace(cov[t, :3, :3] @ I_g)) / 3.0
        r = min(max(r, 0.0), 0.5)             # r ≥ 0.5 ⇒ GNSS dominates
        k_info = min(max(r / (1.0 - r), kappa_min), 1.0)
        b_loc = b - b_glob
        w_cons = b_loc * b_loc / (b_loc * b_loc + mad * mad + 1e-12)
        kappa = w_cons + (1.0 - w_cons) * k_info
        kappas[t] = float(np.mean(kappa))
        # Coherent sum, not quadrature: global and local components are
        # medians of the SAME evidence — when the window fully believes
        # its departure (κ=1) the honest bias is b_glob + b_loc = b
        # exactly (quadrature under-covered a drifting chain whose
        # global and local components share sign — sim-measured).
        extra[t] = (b_glob + kappa * b_loc) ** 2 + se * se
        extra[t, 2] += atm_floor_z ** 2
    cov[:, np.arange(3), np.arange(3)] += extra
    report.update(calibrated=True,
                  median_kappa=float(np.median(kappas)),
                  median_bias_3d=float(np.median(
                      np.linalg.norm(np.sqrt(extra), axis=-1))))
    return jnp.asarray(cov), report


# --- Atmospheric-bias batch variant ------------------------------------------
#
# The real-data parity floor vs the golden batch CSV is a smooth, mostly
# vertical ~7.5 m hump from the SYNTHESIZED base station's missing
# atmosphere (no real hksc1410.21o in the reference repo): DD only
# cancels atmosphere with a real base. A constant ZTD state measurably
# did NOT help (scripts/batch_whampoa.py docstring) — the residual is
# time-correlated. This variant adds a per-keyframe scalar zenith bias
# z_t with a Gauss-Markov prior chain, entering every DD row as
# (mf_i − mf_m)·z(t) with mf = 1/sin(el) — one extra dof per block, so
# the system stays banded (7×7 blocks) and every solver below applies.


def _gm_chain(z, kf_time, tau, sigma, sigma_abs):
    """Gauss-Markov whitened prior rows on the z chain.

    r_gm[k] = (z_{k+1} − φ_k z_k)/σ_w,k, φ_k = exp(−Δt_k/τ),
    σ_w,k = σ·√(1−φ_k²) (stationary-variance discretization), plus weak
    absolute rows z_k/σ_abs fixing the gauge."""
    dt = jnp.maximum(jnp.diff(kf_time), 1e-3)
    phi = jnp.exp(-dt / tau)
    sig_w = sigma * jnp.sqrt(jnp.maximum(1.0 - phi ** 2, 1e-8))
    r_gm = (z[1:] - phi * z[:-1]) / sig_w
    r_abs = z / sigma_abs
    return r_gm, r_abs, phi, sig_w


@partial(jax.jit, static_argnames=("cfg", "lm_iters", "solver", "robust",
                                   "mixed"))
def solve_batch_once_atm(cfg: GlioConfig, prob: BatchProblem, p0, q0, z0,
                         threshold, lm_iters: int = 10,
                         solver: str = "direct",
                         robust: RobustOpts = NO_ROBUST,
                         mixed: bool = True):
    """One annealing stage of the 7-dof (pose + zenith-bias) batch GN."""
    hw = cfg.estimator.search_range + 1
    est = cfg.estimator
    tau, sigma, sigma_abs = est.atm_tau, est.atm_sigma, est.atm_abs_sigma
    T = p0.shape[0]
    D = POSE_DOF + 1

    def gm_cost(z):
        r_gm, r_abs, _, _ = _gm_chain(z, prob.kf_time, tau, sigma,
                                      sigma_abs)
        return 0.5 * (jnp.sum(r_gm ** 2) + jnp.sum(r_abs ** 2))

    def trial_cost(p, q, z, w_rel, w_dd):
        # Matches _assemble_core's f32 precision context (see _total_cost).
        with jax.default_matmul_precision("float32"):
            r1 = _rel_residuals(p, q, prob, w_rel)
            R_el = r_ecef_local(prob.anchor_ecef, prob.yaw_enu_local)
            r2 = jax.vmap(
                lambda *a: _dd_row_jac(p, R_el, prob, threshold, *a[:-1],
                                       mixed=mixed, z=z,
                                       elevation=a[-1])[0])(
                prob.ep_left, prob.ep_ratio, prob.ep_valid, prob.sat_pos,
                prob.psr_rov, prob.psr_sta, prob.sv_valid, prob.system,
                prob.master, prob.whiten,
                w_dd, prob.elevation)
            return (0.5 * (jnp.sum(r1 * r1) + jnp.sum(r2 * r2))
                    + gm_cost(z))

    def step(carry, _):
        p, q, z, lam = carry
        band, grad, cost_cur, w_rel, w_dd = _assemble_core(
            p, q, prob, threshold, hw, False, None, None, robust, mixed,
            z=z)
        cost_cur = cost_cur + gm_cost(z)
        # GM chain rows: couple (k, k+1) at the z index.
        r_gm, r_abs, phi, sig_w = _gm_chain(z, prob.kf_time, tau, sigma,
                                            sigma_abs)
        a_k = -phi / sig_w          # ∂r_gm[k]/∂z_k
        b_k = 1.0 / sig_w           # ∂r_gm[k]/∂z_{k+1}
        kk = jnp.arange(T - 1)
        zi = POSE_DOF
        band = band.at[kk, hw, zi, zi].add(a_k * a_k)
        band = band.at[kk, hw + 1, zi, zi].add(a_k * b_k)
        band = band.at[kk + 1, hw - 1, zi, zi].add(a_k * b_k)
        band = band.at[kk + 1, hw, zi, zi].add(b_k * b_k)
        grad = grad.at[kk, zi].add(a_k * r_gm)
        grad = grad.at[kk + 1, zi].add(b_k * r_gm)
        band = band.at[:, hw, zi, zi].add(1.0 / sigma_abs ** 2)
        grad = grad.at[:, zi].add(r_abs / sigma_abs)

        diag = band[:, hw]
        damped = diag + lam * (
            jnp.eye(D, dtype=F64) * jnp.maximum(
                jnp.diagonal(diag, axis1=-2, axis2=-1), 1.0)[..., None, :]
            * jnp.eye(D, dtype=F64))
        band2 = band.at[:, hw].set(damped)
        if solver == "direct":
            dx = banded.cyclic_reduction_solve(band2, -grad)
        elif solver == "chol_pcg":
            dx = banded.pcg_chol_solve(band2, -grad)
        else:
            dx, _ = banded.pcg_solve(band2, -grad, iters=200)
        d = dx.reshape(T, D)
        p_new = p + d[:, :3]
        q_new = quat.normalize(quat.mul(q, quat.exp(d[:, 3:6])))
        z_new = z + d[:, 6]
        new_cost = trial_cost(p_new, q_new, z_new, w_rel, w_dd)
        better = new_cost < cost_cur
        p = jnp.where(better, p_new, p)
        q = jnp.where(better, q_new, q)
        z = jnp.where(better, z_new, z)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0), 1e-9, 1e6)
        return (p, q, z, lam), new_cost

    (p, q, z, _), _ = jax.lax.scan(
        step, (p0, q0, z0, jnp.asarray(1e-4, F64)), None, length=lm_iters)
    ones_rel = jnp.ones(prob.rel_valid.shape, F64)
    ones_dd = jnp.ones(prob.ep_valid.shape + prob.master.shape[1:]
                       + prob.sv_valid.shape[1:], F64)
    return p, q, z, trial_cost(p, q, z, ones_rel, ones_dd)


def optimize_batch_atm(cfg: GlioConfig, prob: BatchProblem,
                       thresholds=(1e9, 10.0, 8.0, 6.0),
                       lm_iters: int = 10, solver: str = "direct",
                       robust: RobustOpts = NO_ROBUST,
                       mixed: bool = True):
    """Annealed batch solve with the Gauss-Markov zenith-bias chain.

    Returns (p, q, z, costs)."""
    if cfg.estimator.doppler_in_batch:
        raise ValueError(
            "optimize_batch_atm does not support doppler_in_batch: the "
            "7-dof (pose+zenith) assembly has no Doppler rows — use "
            "optimize_batch, or extend _assemble_core's z-path first "
            "(silently dropping the factors would confound atm A/Bs).")
    p, q = prob.p_odo, prob.q_odo
    z = jnp.zeros(p.shape[0], F64)
    costs = []
    if isinstance(lm_iters, int):
        lm_iters = (lm_iters,) * len(thresholds)
    for th, iters in zip(thresholds, lm_iters):
        p, q, z, cost = solve_batch_once_atm(
            cfg, prob, p, q, z, jnp.asarray(th, F64), iters, solver,
            robust, mixed)
        costs.append(float(cost))
    return p, q, z, costs


# --- Incremental (reference-faithful) batch mode -----------------------------

def derive_relatives(p_odo, q_odo, kf_dt, R: int, max_speed: float = 30.0):
    """Relative-pose measurements to forward neighbors 1..R (jittable).

    In the reference these are re-derived from ``pose_info_keyframe`` at
    every batch run — i.e. from the continuously corrected trajectory —
    which is what lets later runs heal earlier odometry jumps.
    """
    T = p_odo.shape[0]
    rel_dp = jnp.zeros((T, R, 3), F64)
    rel_dq = jnp.zeros((T, R, 4), F64).at[..., 0].set(1.0)
    rel_valid = jnp.zeros((T, R), bool)
    for r in range(1, R + 1):
        qi = q_odo
        qj = jnp.roll(q_odo, -r, axis=0)
        pj = jnp.roll(p_odo, -r, axis=0)
        dq = quat.mul(quat.conj(qi), qj)
        dp = quat.rotate(quat.conj(qi), pj - p_odo)
        ok = jnp.arange(T) < T - r
        speed = jnp.linalg.norm(dp, axis=-1) / (r * kf_dt)
        rel_dp = rel_dp.at[:, r - 1].set(jnp.where(ok[:, None], dp, 0.0))
        rel_dq = rel_dq.at[:, r - 1].set(
            jnp.where(ok[:, None], dq, jnp.array([1.0, 0, 0, 0], F64)))
        rel_valid = rel_valid.at[:, r - 1].set(ok & (speed < max_speed))
    return rel_dp, rel_dq, rel_valid


@partial(jax.jit, static_argnames=("R",))
def _prep_prefix(p_cur, q_cur, kf_dt, ep_valid0, ep_left, n, R: int):
    """One fused device call per incremental re-solve: re-derive the
    relative measurements from the corrected trajectory and mask both
    relatives and GNSS epochs to the active prefix [0, n)."""
    rel_dp, rel_dq, rel_valid = derive_relatives(p_cur, q_cur, kf_dt, R)
    T = p_cur.shape[0]
    idx = jnp.arange(T)
    active = idx < n
    rel_valid = rel_valid & active[:, None] & \
        (idx[:, None] + jnp.arange(1, R + 1)[None, :] < n)
    ep_valid = ep_valid0 & (ep_left + 1 < n)
    return rel_dp, rel_dq, rel_valid, ep_valid


@jax.jit
def _mask_prefix(rel_valid0, ep_valid0, ep_left, n):
    T, R = rel_valid0.shape
    idx = jnp.arange(T)
    rel_valid = rel_valid0 & (idx < n)[:, None] & \
        (idx[:, None] + jnp.arange(1, R + 1)[None, :] < n)
    ep_valid = ep_valid0 & (ep_left + 1 < n)
    return rel_valid, ep_valid


def _original_hops(prob: BatchProblem):
    """Consecutive-keyframe odometry hops (Δp in the older frame, Δq) of
    the problem's original trajectory — numpy, computed once."""
    p_odo = np.asarray(prob.p_odo)
    qj = prob.q_odo
    hop_dq = np.asarray(quat.mul(quat.conj(qj[:-1]), qj[1:]))
    hop_dp = np.asarray(quat.rotate(quat.conj(qj[:-1]),
                                    prob.p_odo[1:] - prob.p_odo[:-1]))
    return hop_dp, hop_dq


def _chain_hops(p_cur, q_cur, hop_dp, hop_dq, lo, hi):
    """Chain original odometry hops from pose lo-1 through [lo, hi).

    MUTATES ``p_cur``/``q_cur`` IN PLACE (and returns them for call-site
    convenience) — callers must pass arrays they own; a shared array
    would be silently aliased. Pure numpy via :func:`quat.mul_np` /
    :func:`quat.rotate_np`: at the reference's every-10 cadence this
    runs ~T/10 times; device-side tiny ops here would cost a remote
    round trip per keyframe on the axon backend.
    """
    for k in range(max(lo, 1), hi):
        qp = q_cur[k - 1]
        qk = quat.mul_np(qp, hop_dq[k - 1])
        p_cur[k] = p_cur[k - 1] + quat.rotate_np(qp, hop_dp[k - 1])
        q_cur[k] = qk / np.linalg.norm(qk)
    return p_cur, q_cur


def optimize_batch_reference_cadence(cfg: GlioConfig, prob: BatchProblem,
                                     every: int = 10, lm_iters: int = 4,
                                     thresholds=(1e9, 10.0, 8.0, 6.0),
                                     final_lm_iters=(40, 12, 8, 8),
                                     solver: str = "direct",
                                     robust: RobustOpts = NO_ROBUST,
                                     warm_start: bool = False,
                                     warm_thresholds=(6.0,),
                                     warm_lm_iters: int = 4,
                                     verbose: bool = False):
    """The reference's ACTUAL backendFusionThread cadence: every `every`
    new keyframes (once ≥30 exist), run a FRESH annealed batch solve over
    the current sliding-window trajectory prefix.

    Faithfulness notes (Estimator.cpp): each run begins with
    ``*pose_info_keyframe_batch = *pose_info_keyframe`` (:2751) — the
    batch re-snapshots the live SW poses and derives all scan-to-multiscan
    constraints from THAT snapshot; its output goes only to
    ``pose_info_keyframe_batch``/CSV (:3306-3399) and is never written
    back into ``pose_info_keyframe`` (verified: no other writer), so
    consecutive batch runs share no state. The cadence gate is :2740-2748
    (<30 keyframes: skip; re-run per 10 new). The self-feedback
    alternative (``optimize_batch_incremental(rederive=True)``) was
    measured WORSE at this cadence (23.98 m vs golden batch at every=10:
    early small-prefix wander gets baked into the re-derived relatives
    and the absolute epoch gate locks recovery out) — evidence FOR the
    reference's no-feedback design, recorded in the README.

    Returns (p, q, stats): the final full-trajectory solve at the parity
    budget plus per-re-solve wall-time statistics (the real-time
    question: does a full re-solve fit in the 10-keyframe ≈ 3.4 s budget
    the reference's thread has at 3 Hz?).

    ``warm_start``: beyond-reference fast mode. Each re-solve keeps the
    reference's EXACT constraint set (original relatives, prefix-masked)
    but starts LM from the previous re-solve's solution with the new
    tail chained in by original odometry hops — a pure initialization
    change, so the optimum is unchanged; being near it, the anneal
    schedule collapses to ``warm_thresholds × warm_lm_iters`` (default:
    one stage at the final threshold). The final full-trajectory solve
    stays the cold fresh one-shot at ``final_lm_iters``, so the returned
    trajectory is bit-comparable to warm_start=False. Measured on the
    full real Whampoa problem (T=3493, TPU): mean 0.39 s / p50 0.37 per
    re-solve vs 1.39 s cold (3.6×), solve total 139.2 s vs 487 s, with
    the identical 8.59 m final parity (README table).
    """
    import time as _time
    T = prob.p_odo.shape[0]
    # Warm the two compile shapes (per-re-solve budget, final budget) so
    # the recorded latencies are execution, not compilation.
    rel_w, ep_w = _mask_prefix(prob.rel_valid, prob.ep_valid, prob.ep_left,
                               jnp.asarray(30, jnp.int32))
    pw = optimize_batch(cfg, prob._replace(rel_valid=rel_w, ep_valid=ep_w),
                        thresholds=thresholds, lm_iters=lm_iters,
                        solver=solver, robust=robust)
    jax.block_until_ready(pw[:2])
    pw = optimize_batch(cfg, prob._replace(rel_valid=rel_w, ep_valid=ep_w),
                        thresholds=thresholds, lm_iters=final_lm_iters,
                        solver=solver, robust=robust)
    jax.block_until_ready(pw[:2])
    if warm_start:
        hop_dp, hop_dq = _original_hops(prob)
        pw = optimize_batch(
            cfg, prob._replace(rel_valid=rel_w, ep_valid=ep_w),
            thresholds=warm_thresholds, lm_iters=warm_lm_iters,
            solver=solver, robust=robust)
        jax.block_until_ready(pw[:2])
    p_cur = q_cur = None
    n_prev = 0
    times = []
    for n in range(30, T, every):
        rel_valid, ep_valid = _mask_prefix(
            prob.rel_valid, prob.ep_valid, prob.ep_left,
            jnp.asarray(n, jnp.int32))
        prob_n = prob._replace(rel_valid=rel_valid, ep_valid=ep_valid)
        t0 = _time.perf_counter()
        if warm_start and p_cur is not None:
            # Warm init: previous solution + hop-chained new tail (the
            # chaining is host work inside the timed region — it is part
            # of what replaces the fresh solve).
            _chain_hops(p_cur, q_cur, hop_dp, hop_dq, n_prev, n)
            p, q, costs = optimize_batch(
                cfg, prob_n, thresholds=warm_thresholds,
                lm_iters=warm_lm_iters, solver=solver, robust=robust,
                init=(jnp.asarray(p_cur), jnp.asarray(q_cur)))
        else:
            p, q, costs = optimize_batch(cfg, prob_n, thresholds=thresholds,
                                         lm_iters=lm_iters, solver=solver,
                                         robust=robust)
        jax.block_until_ready((p, q))
        times.append(_time.perf_counter() - t0)
        if warm_start:
            if p_cur is None:
                p_cur, q_cur = np.asarray(p).copy(), np.asarray(q).copy()
            else:
                p_cur[:n] = np.asarray(p)[:n]
                q_cur[:n] = np.asarray(q)[:n]
            n_prev = n
        if verbose and (n // every) % 20 == 0:
            print(f"  batch re-solve n={n}: {times[-1]:.2f} s "
                  f"cost {costs[-1]:.0f}", flush=True)
    t0 = _time.perf_counter()
    p, q, costs = optimize_batch(cfg, prob, thresholds=thresholds,
                                 lm_iters=final_lm_iters, solver=solver,
                                 robust=robust)
    jax.block_until_ready((p, q))
    t_final = _time.perf_counter() - t0
    times_arr = np.asarray(times) if times else np.zeros(1)
    stats = {"n_resolves": len(times), "final_s": t_final,
             "resolve_mean_s": float(times_arr.mean()),
             "resolve_p50_s": float(np.median(times_arr)),
             "resolve_max_s": float(times_arr.max()),
             "total_s": float(times_arr.sum() + t_final)}
    return p, q, stats


def optimize_batch_incremental(cfg: GlioConfig, prob: BatchProblem, kf_time,
                               every: int = 50,
                               thresholds=(1e9, 10.0, 8.0, 6.0),
                               lm_iters: int = 4, solver: str = "direct",
                               relaxation_passes: int = 0,
                               robust: RobustOpts = NO_ROBUST,
                               rederive: bool = True,
                               verbose: bool = False):
    """Emulate the reference's incremental batch replay
    (``backendFusionThread``, Estimator.cpp:5352 + :2740-2748): re-solve
    the growing prefix every `every` keyframes. One compiled shape: the
    prefix is expressed with masks over the full-length problem.

    ``rederive`` (default True, matching the reference, which re-derives
    its batch constraints from the current poses every solve): re-derive
    the relative-pose measurements from the current corrected trajectory
    at each re-solve. MEASURED A/B on real Whampoa (robust, every=250):
    re-derivation is what lets the chain bend toward the GNSS evidence
    across re-solves — 18.1 m RMSE vs the golden batch (lm_iters=4);
    keeping the ORIGINAL odometry relatives instead is 44.8 m, because
    each incoming chunk is initialized by chaining raw odometry hops
    from the corrected boundary (tens of metres of accumulated vertical
    drift at every=250) and the rigid original chain + the ABSOLUTE
    epoch gate then lock the GNSS out (the documented robust lock-out).
    The residual gap to the 8.6 m one-shot is the re-solve coarseness:
    the reference re-solves every 10 keyframes with ≤100 LM iterations.

    `prob` supplies the static GNSS binding/whitening and the initial
    odometry; returns the final trajectory.
    """
    T = prob.p_odo.shape[0]
    R = prob.rel_valid.shape[1]
    kf_dt = float(np.median(np.diff(np.asarray(kf_time))))

    # Original odometry hop relatives (the actual measurements): used to
    # REBASE each incoming chunk onto the corrected boundary pose, exactly
    # as the reference's sliding window chains new keyframes from the
    # batch-corrected trajectory (pose_info_keyframe write-back). Without
    # this, a new chunk enters with its raw accumulated drift as an
    # absolute jump and the re-derived relatives become corrupt.
    hop_dp, hop_dq = _original_hops(prob)
    p_cur = np.asarray(prob.p_odo).copy()
    q_cur = np.asarray(prob.q_odo).copy()
    n_prev = 0

    kf_dt_j = jnp.asarray(kf_dt, F64)
    for n in list(range(max(every, 20), T, every)) + [T]:
        p_cur, q_cur = _chain_hops(p_cur, q_cur, hop_dp, hop_dq, n_prev, n)
        n_prev = n
        p_j, q_j = jnp.asarray(p_cur), jnp.asarray(q_cur)
        if rederive:
            rel_dp, rel_dq, rel_valid, ep_valid = _prep_prefix(
                p_j, q_j, kf_dt_j, prob.ep_valid, prob.ep_left,
                jnp.asarray(n, jnp.int32), R)
        else:
            idx = jnp.arange(T)
            active = idx < n
            rel_valid = prob.rel_valid & active[:, None] & \
                (idx[:, None] + jnp.arange(1, R + 1)[None, :] < n)
            rel_dp, rel_dq = prob.rel_dp, prob.rel_dq
            ep_valid = prob.ep_valid & (prob.ep_left + 1 < n)
        prob_n = prob._replace(
            p_odo=p_j, q_odo=q_j,
            rel_dp=rel_dp, rel_dq=rel_dq, rel_valid=rel_valid,
            ep_valid=ep_valid)
        p_new, q_new, costs = optimize_batch(
            cfg, prob_n, thresholds=thresholds, lm_iters=lm_iters,
            solver=solver, robust=robust)
        # Poses beyond the prefix keep their values until rebased in.
        p_new, q_new = np.asarray(p_new), np.asarray(q_new)
        p_cur[:n] = p_new[:n]
        q_cur[:n] = q_new[:n]
        if verbose:
            print(f"  incremental batch n={n}: cost {costs[-1]:.0f}",
                  flush=True)

    # Relaxation passes: each re-derivation of the relative measurements
    # from the current estimate allows the solve another equilibrium step
    # toward the GNSS evidence (the reference gets ~T/10 such passes for
    # free by re-running the batch every 10 keyframes over the whole
    # mission, Estimator.cpp:2740-2748; we run them explicitly). They
    # inherently re-derive — meaningful with ``rederive=True``; with
    # original-relative measurements the final n=T solve already IS the
    # one-shot problem, so pass relaxation_passes=0 there.
    for it in range(relaxation_passes):
        rel_dp, rel_dq, rel_valid = derive_relatives(
            jnp.asarray(p_cur), jnp.asarray(q_cur), kf_dt, R)
        prob_n = prob._replace(
            p_odo=jnp.asarray(p_cur), q_odo=jnp.asarray(q_cur),
            rel_dp=rel_dp, rel_dq=rel_dq, rel_valid=rel_valid)
        p_new, q_new, cost = solve_batch_once(
            cfg, prob_n, jnp.asarray(p_cur), jnp.asarray(q_cur),
            jnp.asarray(thresholds[-1], F64), 2, 60, solver, robust)
        p_cur = np.asarray(p_new)
        q_cur = np.asarray(q_new)
        if verbose and (it % 10 == 9):
            print(f"  relaxation {it + 1}: cost {float(cost):.0f}",
                  flush=True)
    return jnp.asarray(p_cur), jnp.asarray(q_cur)


# --- Scan-to-multiscan level 1: binary surf-feature constraints --------------

class Sms1Data(NamedTuple):
    """Correspondences for ``sms_fusion_level=1``: points of frame i vs
    plane (normal, centroid) in frame j=i+r's body frame
    (``BinaryLidarPlaneNormFactor``; reference association via
    ``findGlobalCorrespondingSurfFeatures_Batch``, Estimator.cpp:3710-3806,
    and 25-of-400 selection :4057-4116 — here deterministic top-25 by
    planarity)."""
    pts_i: jnp.ndarray       # (T, R, F, 3) body-frame points of frame i
    normal_j: jnp.ndarray    # (T, R, F, 3) plane normals in frame j body
    cent_j: jnp.ndarray      # (T, R, F, 3) plane centroids in frame j body
    score: jnp.ndarray       # (T, R, F)
    mask: jnp.ndarray        # (T, R, F) bool


def build_sms1(cfg: GlioConfig, scans, scans_valid, p_odo, q_odo,
               chunk: int = 64) -> Sms1Data:
    """Associate every (i, i+r) keyframe pair's scans (host-driven, jitted
    per chunk of pairs)."""
    from ..lidar import neighbors, plane_fit
    est = cfg.estimator
    fs = cfg.feature_selection
    T, S = scans_valid.shape
    R = est.search_range
    F = fs.batch_feature_res_num

    scans = jnp.asarray(scans, jnp.float32)
    scans_valid = jnp.asarray(scans_valid)
    p = jnp.asarray(p_odo)
    q = jnp.asarray(q_odo)

    @jax.jit
    def pair_assoc(i_idx, j_idx):
        def one(i, j):
            qi, pi = q[i], p[i]
            qj, pj = q[j], p[j]
            # Frame i points → world (odometry poses, association only).
            w_i = (quat.rotate(qi, scans[i].astype(F64)) + pi).astype(
                jnp.float32)
            w_j = (quat.rotate(qj, scans[j].astype(F64)) + pj).astype(
                jnp.float32)
            d2, idx = neighbors.knn(w_i, scans_valid[i], w_j,
                                    scans_valid[j], k=5)
            neigh = neighbors.gather_neighbors(w_j, idx)
            nrm, cent, planarity, ok = plane_fit.fit_planes_centroid(
                neigh, idx >= 0, min_planarity=0.8)
            good = ok & scans_valid[i] & (d2[:, 0] < est.kd_max_radius ** 2)
            sc = jnp.where(good, planarity, -1.0)
            top_s, top_i = jax.lax.top_k(sc, F)
            sel = top_s > 0
            pts_i = scans[i][top_i].astype(F64)
            n_w = nrm[top_i].astype(F64)
            c_w = cent[top_i].astype(F64)
            # World plane → frame j body.
            n_j = quat.rotate(quat.conj(qj), n_w)
            c_j = quat.rotate(quat.conj(qj), c_w - pj)
            return pts_i, n_j, c_j, est.lidar_const * top_s, sel

        return jax.vmap(one)(i_idx, j_idx)

    pts = np.zeros((T, R, F, 3))
    nrm = np.zeros((T, R, F, 3))
    cen = np.zeros((T, R, F, 3))
    sco = np.zeros((T, R, F))
    msk = np.zeros((T, R, F), bool)
    pairs = [(i, i + r + 1, r) for r in range(R) for i in range(T - r - 1)]
    for c0 in range(0, len(pairs), chunk):
        blk = pairs[c0:c0 + chunk]
        ii = jnp.asarray([b[0] for b in blk], jnp.int32)
        jj = jnp.asarray([b[1] for b in blk], jnp.int32)
        # Pad the chunk to fixed size for one compilation.
        padn = chunk - len(blk)
        if padn:
            ii = jnp.concatenate([ii, jnp.zeros(padn, jnp.int32)])
            jj = jnp.concatenate([jj, jnp.ones(padn, jnp.int32)])
        # ONE device->host transfer per chunk (per-element np.asarray was
        # a remote round trip per pair per field: 296 s for T=48 on the
        # tunneled backend), then vectorized host scatter.
        P, N, Cc, Sc, Ms = jax.device_get(pair_assoc(ii, jj))
        bi = np.array([b[0] for b in blk])
        br = np.array([b[2] for b in blk])
        nb = len(blk)
        pts[bi, br] = P[:nb]
        nrm[bi, br] = N[:nb]
        cen[bi, br] = Cc[:nb]
        sco[bi, br] = Sc[:nb]
        msk[bi, br] = Ms[:nb]
    return Sms1Data(jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(cen),
                    jnp.asarray(sco), jnp.asarray(msk))


def _sms1_residuals(p, q, sms: Sms1Data):
    """(T, R, F) binary point-to-plane residuals."""
    from ..factors.lidar import binary_plane_residual
    T, R, F, _ = sms.pts_i.shape

    def one(r):
        roll = r + 1
        pj = jnp.roll(p, -roll, axis=0)
        qj = jnp.roll(q, -roll, axis=0)

        def pair(pts, nrm, cen, sc, m, t1, q1, t2, q2):
            return binary_plane_residual(pts, nrm, cen, sc, t1, q1, t2, q2, m)

        return jax.vmap(pair)(sms.pts_i[:, r], sms.normal_j[:, r],
                              sms.cent_j[:, r], sms.score[:, r],
                              sms.mask[:, r], p, q, pj, qj)

    return jnp.stack([one(r) for r in range(R)], axis=1)


def _assemble_sms1_pose(p, q, prob: BatchProblem, sms: Sms1Data,
                        threshold, hw: int, mixed: bool = False):
    with jax.default_matmul_precision("float32"):
        return _assemble_sms1_pose_impl(p, q, prob, sms, threshold, hw,
                                        mixed)


def _assemble_sms1_pose_impl(p, q, prob: BatchProblem, sms: Sms1Data,
                             threshold, hw: int, mixed: bool = False):
    """6-dof band + gradient for attitude + binary-plane + DD rows.

    Shared by the pose-only level-1 solver and the 15-dof level-1-with-IMU
    solver (where it lands in the pose corner of each 15×15 block).

    ANALYTIC Jacobians throughout (round 3; replaces the 12-dof jacfwd
    per (i, r) pair): for the binary plane residual
    r = s·n_wᵀ(p_w − c_w) with the right-retraction q ⊞ δ = q·exp(δ),
      ∂r/∂t1 =  s·n_w          ∂r/∂δθ1 = s·(p_b × R1ᵀn_w)
      ∂r/∂t2 = −s·n_w          ∂r/∂δθ2 = s·(n_b × R2ᵀ(p_w−c_w) − c_b × n_b)
    (verified against autodiff in tests/test_batch.py). ``mixed`` runs
    the H-block einsums in f32 with f64 accumulation."""
    T = p.shape[0]
    band = jnp.zeros((T, 2 * hw + 1, POSE_DOF, POSE_DOF), F64)
    grad = jnp.zeros((T, POSE_DOF), F64)
    cdtype = jnp.float32 if mixed else F64
    R = prob.rel_valid.shape[1]

    def _cross(a, b):
        return jnp.cross(a, b, axis=-1)

    for r in range(R):
        roll = r + 1
        pj = jnp.roll(p, -roll, axis=0)
        qj = jnp.roll(q, -roll, axis=0)
        dqm = prob.rel_dq[:, r]
        m_att = prob.rel_valid[:, r].astype(F64)

        # Attitude rows (W_ATT·vec(Δq̄⁻¹ qi⁻¹ qj); level-1 keeps only
        # these of the level-0 relative rows — Estimator.cpp:2990-3077).
        Mq = quat.conj(dqm)
        Q = quat.mul(quat.conj(q), qj)
        MQ = quat.mul(Mq, Q)
        res_att = W_ATT * MQ[:, 1:] * m_att[:, None]
        JqjR = 0.5 * quat.qleft(MQ)[:, 1:, 1:]
        JqiR = -0.5 * jnp.matmul(quat.qleft(Mq), quat.qright(Q))[:, 1:, 1:]
        Ji_att = jnp.zeros((T, 3, POSE_DOF), F64)
        Ji_att = Ji_att.at[:, :, 3:6].set(W_ATT * JqiR)
        Jj_att = jnp.zeros((T, 3, POSE_DOF), F64)
        Jj_att = Jj_att.at[:, :, 3:6].set(W_ATT * JqjR)
        Ji_att = Ji_att * m_att[:, None, None]
        Jj_att = Jj_att * m_att[:, None, None]

        # Binary plane rows, fully batched over (T, F).
        pts = sms.pts_i[:, r]                     # (T, F, 3) frame-i body
        nrm = sms.normal_j[:, r]                  # (T, F, 3) frame-j body
        cen = sms.cent_j[:, r]
        sc = sms.score[:, r]                      # (T, F)
        msk = sms.mask[:, r].astype(F64)
        scm = sc * msk
        p_w = quat.rotate(q[:, None, :], pts) + p[:, None, :]
        n_w = quat.rotate(qj[:, None, :], nrm)
        c_w = quat.rotate(qj[:, None, :], cen) + pj[:, None, :]
        res_pl = scm * jnp.sum(n_w * (p_w - c_w), axis=-1)       # (T, F)
        R1t_nw = quat.rotate(quat.conj(q)[:, None, :], n_w)
        R2t_d = quat.rotate(quat.conj(qj)[:, None, :], p_w - c_w)
        Ji_pl = jnp.concatenate(
            [scm[..., None] * n_w,
             scm[..., None] * _cross(pts, R1t_nw)], axis=-1)     # (T,F,6)
        Jj_pl = jnp.concatenate(
            [-scm[..., None] * n_w,
             scm[..., None] * (_cross(nrm, R2t_d) - _cross(cen, nrm))],
            axis=-1)

        res = jnp.concatenate([res_att, res_pl], axis=1)
        Ji = jnp.concatenate([Ji_att, Ji_pl], axis=1).astype(cdtype)
        Jj = jnp.concatenate([Jj_att, Jj_pl], axis=1).astype(cdtype)
        res_c = res.astype(cdtype)

        i_idx = jnp.arange(T, dtype=jnp.int32)
        j_idx = jnp.minimum(i_idx + roll, T - 1)
        Hij = jnp.einsum("nri,nrj->nij", Ji, Jj).astype(F64)
        band = banded.scatter_add_blocks(
            band, i_idx, i_idx,
            jnp.einsum("nri,nrj->nij", Ji, Ji).astype(F64), hw)
        band = banded.scatter_add_blocks(band, i_idx, j_idx, Hij, hw)
        band = banded.scatter_add_blocks(
            band, j_idx, i_idx, jnp.swapaxes(Hij, -1, -2), hw)
        band = banded.scatter_add_blocks(
            band, j_idx, j_idx,
            jnp.einsum("nri,nrj->nij", Jj, Jj).astype(F64), hw)
        grad = grad.at[i_idx].add(
            jnp.einsum("nri,nr->ni", Ji, res_c).astype(F64))
        grad = grad.at[j_idx].add(
            jnp.einsum("nri,nr->ni", Jj, res_c).astype(F64))

    # DD rows (reuse level-0 assembly pieces via _assemble on a
    # relatives-free problem).
    band_dd, grad_dd = _assemble(
        p, q, prob._replace(rel_valid=jnp.zeros_like(prob.rel_valid)),
        threshold, hw, mixed=mixed)
    return band + band_dd, grad + grad_dd


@partial(jax.jit, static_argnames=("cfg", "lm_iters", "solver", "mixed"))
def _sms1_solve_once(cfg: GlioConfig, prob: BatchProblem, sms: Sms1Data,
                     p0, q0, threshold, lm_iters: int, solver: str,
                     mixed: bool):
    """One annealing stage of the pose-only level-1 solve.

    MODULE-LEVEL jit (like ``solve_batch_once``): a closure-local jit
    would create a fresh cache entry per ``optimize_batch_sms1`` call —
    measured on the level-1-with-IMU twin as 13 s/"iteration" of pure
    retracing/compile-cache reload against ~0.2 s of actual execution.
    """
    hw = cfg.estimator.search_range + 1

    def cost_fn(p, q):
        r_att = _rel_residuals(p, q, prob)[..., :3]     # attitude rows
        r_sms = _sms1_residuals(p, q, sms)
        r_dd = _dd_residuals(p, prob, threshold)
        return 0.5 * (jnp.sum(r_att ** 2) + jnp.sum(r_sms ** 2)
                      + jnp.sum(r_dd ** 2))

    def step(carry, _):
        p, q, lam, cost = carry
        band, grad = _assemble_sms1_pose(p, q, prob, sms, threshold,
                                         hw, mixed=mixed)
        diag = band[:, hw]
        damped = diag + lam * (
            jnp.eye(POSE_DOF, dtype=F64) * jnp.maximum(
                jnp.diagonal(diag, axis1=-2, axis2=-1),
                1.0)[..., None, :] * jnp.eye(POSE_DOF, dtype=F64))
        band2 = band.at[:, hw].set(damped)
        if solver == "direct":
            dx = (banded.cyclic_reduction_solve_mixed(band2, -grad)
                  if mixed else
                  banded.cyclic_reduction_solve(band2, -grad))
        elif solver == "chol_pcg":
            dx = banded.pcg_chol_solve(band2, -grad)
        else:
            dx, _ = banded.pcg_solve(band2, -grad, iters=200)
        p_new, q_new = _retract(p, q, dx.reshape(-1))
        new_cost = cost_fn(p_new, q_new)
        better = new_cost < cost
        p = jnp.where(better, p_new, p)
        q = jnp.where(better, q_new, q)
        cost = jnp.where(better, new_cost, cost)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0),
                       1e-9, 1e6)
        return (p, q, lam, cost), None

    cost0 = cost_fn(p0, q0)
    (p, q, _, cost), _ = jax.lax.scan(
        step, (p0, q0, jnp.asarray(1e-4, F64), cost0), None,
        length=lm_iters)
    return p, q, cost


def optimize_batch_sms1(cfg: GlioConfig, prob: BatchProblem, sms: Sms1Data,
                        thresholds=(1e9, 10.0, 8.0, 6.0), lm_iters=6,
                        solver: str = "direct", mixed: bool = True):
    """Batch solve with level-1 scan-to-multiscan constraints (pose-only).

    Replaces the level-0 relative-pose rows with binary plane factors
    (the relative-attitude factors remain, as in the reference's level-1
    branch, Estimator.cpp:2990-3077). For the reference's full level-1 —
    which also chains ImuFactors over 15-dof states — see
    ``optimize_batch_sms1_imu``.
    """
    p, q = prob.p_odo, prob.q_odo
    costs = []
    for th in thresholds:
        p, q, cost = _sms1_solve_once(cfg, prob, sms, p, q,
                                      jnp.asarray(th, F64), lm_iters,
                                      solver, mixed)
        costs.append(float(cost))
    return p, q, costs


# --- Level 1 with IMU chains: full 15-dof batch states ------------------------

STATE15 = 15  # δp, δθ, δv, δba, δbg per keyframe (batch level-1 state)


class ImuChainData(NamedTuple):
    """Preintegrated IMU edges i → i+1 for the batch level-1 chains
    (``ImuFactor`` rows at Estimator.cpp:2992-3001; edge k uses
    ``pre_integrations[k+1]`` — the interval ending at keyframe k+1)."""
    pres: object              # Preintegrated, leading dim (T-1,)
    sqrt_info: jnp.ndarray    # (T-1, 15, 15)
    valid: jnp.ndarray        # (T-1,) bool


def build_imu_chain(cfg: GlioConfig, imu_acc, imu_gyr, imu_dt, imu_valid,
                    imu_seed=None, ba0=None, bg0=None) -> ImuChainData:
    """Preintegrate every keyframe interval (vmapped) at a fixed bias
    linearization — matching the reference, whose batch reuses the
    sliding-window-time ``pre_integrations`` objects (first-order bias
    correction inside the factor handles the batch's bias updates).

    Args are the Episode per-interval buffers (T, NI, ...); interval 0
    (before the first keyframe) is skipped — edge k couples (k, k+1) using
    interval k+1's run.
    """
    from ..factors import imu as imu_factors
    params = imu_factors.ImuParams(
        cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w,
        cfg.imu.gravity)
    T = imu_acc.shape[0]
    acc = jnp.asarray(imu_acc, F64)[1:]
    gyr = jnp.asarray(imu_gyr, F64)[1:]
    dt = jnp.asarray(imu_dt, F64)[1:]
    val = jnp.asarray(imu_valid)[1:]
    if imu_seed is None:
        # Seed each interval's midpoint pair with its own first sample
        # (the reference seeds with the sample AT the previous keyframe;
        # at 100 Hz the difference is one sub-sample of lever).
        seed_a = acc[:, 0]
        seed_g = gyr[:, 0]
    else:
        seed_a = jnp.asarray(imu_seed, F64)[1:, :3]
        seed_g = jnp.asarray(imu_seed, F64)[1:, 3:]
    ba0 = jnp.zeros(3, F64) if ba0 is None else jnp.asarray(ba0, F64)
    bg0 = jnp.zeros(3, F64) if bg0 is None else jnp.asarray(bg0, F64)

    def pre_one(a, g, d, v, sa, sg):
        return imu_factors.preintegrate(a, g, d, v, ba0, bg0, sa, sg,
                                        params=params)

    pres = jax.vmap(pre_one)(acc, gyr, dt, val, seed_a, seed_g)
    S = jax.vmap(imu_factors.sqrt_info)(pres)
    edge_valid = jnp.any(val, axis=1)
    return ImuChainData(pres=pres, sqrt_info=S, valid=edge_valid)


def _retract15(p, q, v, ba, bg, dx):
    d = dx.reshape(p.shape[0], STATE15)
    return (p + d[:, 0:3],
            quat.normalize(quat.mul(q, quat.exp(d[:, 3:6]))),
            v + d[:, 6:9], ba + d[:, 9:12], bg + d[:, 12:15])


def _imu_chain_residuals(p, q, v, ba, bg, chain: ImuChainData, gravity):
    """(T-1, 15) whitened IMU edge residuals."""
    from ..factors import imu as imu_factors

    def one(S, pre, valid, pi, qi, vi, bai, bgi, pj, qj, vj, baj, bgj):
        r = imu_factors.whitened_residual_cached(
            S, pre, pi, qi, vi, bai, bgi, pj, qj, vj, baj, bgj,
            gravity=gravity)
        return jnp.where(valid, r, 0.0)

    return jax.vmap(one)(chain.sqrt_info, chain.pres, chain.valid,
                         p[:-1], q[:-1], v[:-1], ba[:-1], bg[:-1],
                         p[1:], q[1:], v[1:], ba[1:], bg[1:])


def optimize_batch_sms1_imu(cfg: GlioConfig, prob: BatchProblem,
                            sms: Sms1Data, chain: ImuChainData,
                            v0=None, ba0=None, bg0=None,
                            thresholds=(1e9, 10.0, 8.0, 6.0), lm_iters=6,
                            solver: str = "direct", mixed: bool = True):
    """Full reference level-1 batch: ImuFactor chains + binary plane +
    relative-attitude + DD pseudorange over 15-dof keyframe states
    (Estimator.cpp:2990-3077: ``gl_tmpSpeedBias`` join the problem).

    TPU-first: one block-banded system with 15×15 blocks — the pose
    factors land in the [0:6, 0:6] corner of each block, the IMU edges
    fill the full blocks of the first off-diagonal. Bias random-walk
    whitening comes from the preintegration covariance, so speed/bias
    states stay observable through the chain exactly as in the reference.

    Returns (p, q, v, ba, bg, costs).
    """
    p, q = prob.p_odo, prob.q_odo
    T = prob.p_odo.shape[0]
    # Velocity init: central differences of the odometry (like the
    # reference's speedBias states carried from the sliding window).
    if v0 is None:
        dtm = jnp.maximum(prob.kf_dt, 1e-3)
        v0 = jnp.gradient(p, axis=0) / dtm
    v = jnp.asarray(v0, F64)
    ba = (jnp.zeros((T, 3), F64) if ba0 is None
          else jnp.broadcast_to(jnp.asarray(ba0, F64), (T, 3)))
    bg = (jnp.zeros((T, 3), F64) if bg0 is None
          else jnp.broadcast_to(jnp.asarray(bg0, F64), (T, 3)))
    costs = []
    for th in thresholds:
        p, q, v, ba, bg, cost = _sms1_imu_solve_once(
            cfg, prob, sms, chain, p, q, v, ba, bg, jnp.asarray(th, F64),
            lm_iters, solver, mixed)
        costs.append(float(cost))
    return p, q, v, ba, bg, costs


@partial(jax.jit, static_argnames=("cfg", "lm_iters", "solver", "mixed"))
def _sms1_imu_solve_once(cfg: GlioConfig, prob: BatchProblem,
                         sms: Sms1Data, chain: ImuChainData,
                         p0, q0, vv0, bba0, bbg0, threshold,
                         lm_iters: int, solver: str, mixed: bool):
    """One annealing stage of the 15-dof level-1 solve.

    MODULE-LEVEL jit: the round-3 version jitted a closure inside
    ``optimize_batch_sms1_imu``, so every call (including a benchmark's
    timed second call) re-traced the 10-iteration scan and re-loaded the
    executable from the persistent compile cache — measured 13.1 s per
    "iteration" on the chip against ~0.2 s of actual per-iteration
    execution (scripts/profile_sms1.py: assembly 40 ms + 15×15 mixed CR
    78 ms + residuals ~55 ms + IMU jacfwd 23 ms).
    """
    from ..factors import imu as imu_factors
    hw = cfg.estimator.search_range + 1
    T = prob.p_odo.shape[0]
    gravity = imu_factors.ImuParams(
        cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w,
        cfg.imu.gravity).gravity_vec()

    def cost_fn(p, q, v, ba, bg):
        r_att = _rel_residuals(p, q, prob)[..., :3]
        r_sms = _sms1_residuals(p, q, sms)
        r_dd = _dd_residuals(p, prob, threshold)
        r_imu = _imu_chain_residuals(p, q, v, ba, bg, chain, gravity)
        return 0.5 * (jnp.sum(r_att ** 2) + jnp.sum(r_sms ** 2)
                      + jnp.sum(r_dd ** 2) + jnp.sum(r_imu ** 2))

    def step(carry, _):
        p, q, v, ba, bg, lam, cost = carry
        # Pose rows → 6-dof band, embedded in the 15-block corner.
        band6, grad6 = _assemble_sms1_pose(p, q, prob, sms, threshold,
                                           hw, mixed=mixed)
        band = jnp.zeros((T, 2 * hw + 1, STATE15, STATE15), F64)
        band = band.at[:, :, :POSE_DOF, :POSE_DOF].set(band6)
        grad = jnp.zeros((T, STATE15), F64)
        grad = grad.at[:, :POSE_DOF].set(grad6)

        # IMU edges (i, i+1): full 15×15 coupling via per-edge jacfwd.
        zero15 = jnp.zeros(STATE15, F64)

        def imu_fn(di, dj, S, pre, valid, pi, qi, vi, bai, bgi,
                   pj, qj, vj, baj, bgj):
            pi2, qi2, vi2, bai2, bgi2 = (
                pi + di[0:3], quat.mul(qi, quat.exp(di[3:6])),
                vi + di[6:9], bai + di[9:12], bgi + di[12:15])
            pj2, qj2, vj2, baj2, bgj2 = (
                pj + dj[0:3], quat.mul(qj, quat.exp(dj[3:6])),
                vj + dj[6:9], baj + dj[9:12], bgj + dj[12:15])
            r = imu_factors.whitened_residual_cached(
                S, pre, pi2, qi2, vi2, bai2, bgi2,
                pj2, qj2, vj2, baj2, bgj2, gravity=gravity)
            return jnp.where(valid, r, 0.0)

        res, (Ji, Jj) = jax.vmap(
            lambda *a: (imu_fn(zero15, zero15, *a),
                        jax.jacfwd(imu_fn, argnums=(0, 1))(
                            zero15, zero15, *a)))(
            chain.sqrt_info, chain.pres, chain.valid,
            p[:-1], q[:-1], v[:-1], ba[:-1], bg[:-1],
            p[1:], q[1:], v[1:], ba[1:], bg[1:])
        i_idx = jnp.arange(T - 1, dtype=jnp.int32)
        j_idx = i_idx + 1
        Hij = jnp.einsum("nri,nrj->nij", Ji, Jj)
        band = banded.scatter_add_blocks(
            band, i_idx, i_idx, jnp.einsum("nri,nrj->nij", Ji, Ji), hw)
        band = banded.scatter_add_blocks(band, i_idx, j_idx, Hij, hw)
        band = banded.scatter_add_blocks(
            band, j_idx, i_idx, jnp.swapaxes(Hij, -1, -2), hw)
        band = banded.scatter_add_blocks(
            band, j_idx, j_idx, jnp.einsum("nri,nrj->nij", Jj, Jj), hw)
        grad = grad.at[i_idx].add(jnp.einsum("nri,nr->ni", Ji, res))
        grad = grad.at[j_idx].add(jnp.einsum("nri,nr->ni", Jj, res))

        diag = band[:, hw]
        damped = diag + lam * (
            jnp.eye(STATE15, dtype=F64) * jnp.maximum(
                jnp.diagonal(diag, axis1=-2, axis2=-1),
                1.0)[..., None, :] * jnp.eye(STATE15, dtype=F64))
        band2 = band.at[:, hw].set(damped)
        if solver == "direct":
            dx = (banded.cyclic_reduction_solve_mixed(band2, -grad)
                  if mixed else
                  banded.cyclic_reduction_solve(band2, -grad))
        elif solver == "chol_pcg":
            dx = banded.pcg_chol_solve(band2, -grad)
        else:
            dx, _ = banded.pcg_solve(band2, -grad, iters=200)
        p_new, q_new, v_new, ba_new, bg_new = _retract15(
            p, q, v, ba, bg, dx.reshape(-1))
        new_cost = cost_fn(p_new, q_new, v_new, ba_new, bg_new)
        better = new_cost < cost
        p = jnp.where(better, p_new, p)
        q = jnp.where(better, q_new, q)
        v = jnp.where(better, v_new, v)
        ba = jnp.where(better, ba_new, ba)
        bg = jnp.where(better, bg_new, bg)
        cost = jnp.where(better, new_cost, cost)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0),
                       1e-9, 1e6)
        return (p, q, v, ba, bg, lam, cost), None

    cost0 = cost_fn(p0, q0, vv0, bba0, bbg0)
    (p, q, v, ba, bg, _, cost), _ = jax.lax.scan(
        step, (p0, q0, vv0, bba0, bbg0, jnp.asarray(1e-4, F64), cost0),
        None, length=lm_iters)
    return p, q, v, ba, bg, cost


# --- Doppler rows (optional; reference ships them compiled out) --------------

def _dopp_residuals(p, prob: BatchProblem, sat_vel, sat_ddt,
                    dopp_rng_rate, dopp_sigma=None):
    """Per-epoch Doppler residuals with the receiver clock drift
    eliminated analytically.

    The reference's tcdopplerFactor (dopp_factor.hpp:19-85) uses
    interpolated positions/velocities plus a per-epoch rcv_ddt state tied
    by constantClockDriftFactor. TPU-first reformulation: velocities from
    central differences of the pose chain (couples poses k−1..k+1, still
    inside the band) over the ACTUAL keyframe intervals (prob.kf_time —
    the round-2 code used the global median spacing, wrong for irregular
    keyframes), and rcv_ddt — a scalar appearing linearly in every row of
    its epoch — projected out in closed form under the row weights, so no
    per-epoch states enter the solver.

    Rows are whitened by the reference's per-satellite Doppler sigma
    √(10·var_elesnr) (Estimator.cpp:71,2288; prob.dopp_sigma) — the
    weighted elimination of rcv_ddt uses the same weights, keeping the
    projection exact. ``dopp_sigma`` overrides prob's."""
    from ..factors.gnss import r_ecef_local
    R = r_ecef_local(prob.anchor_ecef, prob.yaw_enu_local)
    OMGE_, CL = 7.2921151467e-5, 299792458.0
    kt = prob.kf_time
    sigma_all = prob.dopp_sigma if dopp_sigma is None else dopp_sigma
    T_ = p.shape[0]

    def one(left, ratio, valid, sat_pos, sv, sddt, meas, sv_valid, sigma):
        li = left
        im1 = jnp.maximum(li - 1, 0)
        ip2 = jnp.minimum(li + 2, T_ - 1)
        dt_i = jnp.maximum(kt[li + 1] - kt[im1], 1e-3)
        dt_j = jnp.maximum(kt[ip2] - kt[li], 1e-3)
        v_i = (p[li + 1] - p[im1]) / dt_i
        v_j = (p[ip2] - p[li]) / dt_j
        p_local = ratio * p[li] + (1.0 - ratio) * p[li + 1]
        v_local = ratio * v_i + (1.0 - ratio) * v_j
        P = R @ p_local + prob.anchor_ecef
        V = R @ v_local
        d = sat_pos - P
        los = d / jnp.maximum(jnp.linalg.norm(d, axis=-1), 1.0)[:, None]
        sagnac = OMGE_ / CL * (
            sv[:, 0] * P[1] + sat_pos[:, 0] * V[1]
            - sv[:, 1] * P[0] - sat_pos[:, 1] * V[0])
        est = jnp.sum((sv - V) * los, axis=-1) + sagnac - sddt
        a = est - meas                       # residual before +rcv_ddt
        w = sv_valid.astype(a.dtype) / jnp.maximum(sigma, 1e-3)
        w2 = jnp.maximum(jnp.sum(w * w), 1e-12)
        ddt_opt = -jnp.sum(w * w * a) / w2   # weighted exact elimination
        r = (a + ddt_opt) * w                # whitened rows, masked by w
        return jnp.where(valid, r, 0.0)

    return jax.vmap(one)(prob.ep_left, prob.ep_ratio, prob.ep_valid,
                         prob.sat_pos, sat_vel, sat_ddt, dopp_rng_rate,
                         prob.sv_valid, sigma_all)
