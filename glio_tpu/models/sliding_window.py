"""Tightly-coupled sliding-window estimator — the core model.

TPU-native re-design of ``Estimator::optimizeSlidingWindowWithLandMark``
(``GLIO/src/Estimator.cpp:2046-2736``) and its surrounding replay loop
(``saveKeyFramesAndFactors`` :4145-4655):

Per keyframe the reference (single-threaded, Ceres, pointer-heavy):
  1. preintegrates IMU to the keyframe time,
  2. builds a local map from the last 50 keyframe surf clouds (PCL voxel
     grid + KD-tree),
  3. finds 5-NN plane correspondences for every window keyframe and
     subselects ~100 per frame,
  4. solves a 5-keyframe problem (prior + IMU + point-to-plane factors,
     SPARSE_NORMAL_CHOLESKY dogleg, ≤15 iters),
  5. Schur-marginalizes the oldest keyframe into a linearized prior.

Here the WHOLE replay is one ``lax.scan`` over keyframes — each step is the
fused batched equivalent of (1)-(5):
  * preintegration = masked ``lax.scan`` over a fixed IMU buffer,
  * the local map is a ring buffer of body-frame clouds + poses; transform
    to world is one batched rotate; association is a tiled-matmul kNN that
    rides the MXU (no trees),
  * plane fits are a batched closed-form 3×3 solve,
  * the window solve is dense manifold LM (75-dim tangent): JᵀJ in one
    matmul — at this size dense beats any sparse structure on TPU,
  * marginalization is an eigen-clipped Schur complement (same semantics
    as MarginalizationFactor.cpp:176-201).

Deterministic by construction: feature subselection is top-k by fit weight
instead of the reference's random subset (``featureSelection``,
Estimator.cpp:3894-3992 — whose log-det search is vestigial; see SURVEY.md
§3.4), so replays are bit-identical.

The released reference compiles GNSS factors out of the sliding window
(``#if 0``, Estimator.cpp:2255-2421); `gnss_in_sliding_window=False`
matches that. DD-pseudorange/Doppler enter through the batch stage.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GlioConfig
from ..factors import gnss as gnss_factors
from ..factors import imu as imu_factors
from ..factors import lidar as lidar_factors
from ..lidar import neighbors, plane_fit
from ..solver import dense, marginalization
from ..solver.manifold import WindowState, retract, local_coordinates, POSE_DOF
from ..utils import quat

F64 = jnp.float64
F32 = jnp.float32


class GnssKfData(NamedTuple):
    """DD epoch bound to the keyframe's interval (zeros when absent).

    Feeds the optional GNSS-in-window factors (the reference carries the
    same data into ``optimizeSlidingWindowWithLandMark`` but compiles the
    factors out — ``#if 0`` Estimator.cpp:2255-2421).  The Doppler channel
    (sat_vel/sat_ddt/dopp) feeds ``tcdopplerFactor`` rows
    (dopp_factor.hpp:19-85); ``dopp_std`` is the reference's per-satellite
    sigma sqrt(1/(Doppler2PSRWeight · W_jj)) with Doppler2PSRWeight=0.1
    (Estimator.cpp:71,2288)."""
    sat_pos: jnp.ndarray     # (M, 3)
    psr_rov: jnp.ndarray     # (M,)
    psr_sta: jnp.ndarray     # (M,)
    sv_valid: jnp.ndarray    # (M,) bool
    system: jnp.ndarray      # (M,) int32
    master: jnp.ndarray      # (4,) int32
    whiten: jnp.ndarray      # (4, M, M)
    ratio: jnp.ndarray       # () interpolation toward the older keyframe
    valid: jnp.ndarray       # () bool
    sat_vel: jnp.ndarray     # (M, 3) ECEF satellite velocity
    sat_ddt: jnp.ndarray     # (M,) satellite clock drift (m/s)
    dopp: jnp.ndarray        # (M,) measured range-rate (m/s)
    dopp_valid: jnp.ndarray  # (M,) bool
    dopp_std: jnp.ndarray    # (M,) per-satellite Doppler sigma (m/s)


class WindowStateDdt(NamedTuple):
    """Window state + per-slot receiver clock drift — the optimization
    state of the GNSS-in-window path.

    The reference allocates a global ``para_rcv_ddt[EPOCH_SIZE]`` array and
    lets each window solve touch the epochs inside it
    (Estimator.cpp:2100-2148); here slot k carries the ddt of the epoch
    bound to interval (k-1, k], sliding with the window."""
    win: WindowState
    ddt: jnp.ndarray   # (K,) receiver clock drift per bound epoch (m/s)


def retract_ddt(state: WindowStateDdt, delta) -> WindowStateDdt:
    """Tangent update for the extended state: [K*15 pose dofs | K ddt]."""
    n = state.win.p.shape[0] * POSE_DOF
    return WindowStateDdt(retract(state.win, delta[:n]),
                          state.ddt + delta[n:])


class KeyframeInput(NamedTuple):
    """Per-keyframe measurements (stack these over time for the replay)."""
    imu_acc: jnp.ndarray     # (MAX_IMU, 3)
    imu_gyr: jnp.ndarray     # (MAX_IMU, 3)
    imu_dt: jnp.ndarray      # (MAX_IMU,)
    imu_valid: jnp.ndarray   # (MAX_IMU,) bool
    scan: jnp.ndarray        # (S, 3) body-frame surf points (deskewed)
    scan_valid: jnp.ndarray  # (S,) bool
    time: jnp.ndarray        # () keyframe timestamp
    gnss: GnssKfData         # DD epoch for this interval


class SlidingWindowCarry(NamedTuple):
    window: WindowState               # (K, ...) current window estimates
    window_scans: jnp.ndarray         # (K, S, 3) body-frame clouds
    window_scan_valid: jnp.ndarray    # (K, S)
    prior_sqrt_jac: jnp.ndarray       # (K*15, K*15)
    prior_sqrt_res: jnp.ndarray       # (K*15,)
    prior_valid: jnp.ndarray          # () bool
    prior_lin: WindowState            # linearization point of the prior
    map_scans: jnp.ndarray            # (M, S, 3) ring buffer body clouds
    map_scan_valid: jnp.ndarray       # (M, S)
    map_world: jnp.ndarray            # (M, S, 3) f32 cached world clouds
                                      # (recomputed only for slots whose
                                      # pose changed — K of M per step)
    map_p: jnp.ndarray                # (M, 3) poses of ring buffer frames
    map_q: jnp.ndarray                # (M, 4)
    map_slot_valid: jnp.ndarray       # (M,) bool
    map_head: jnp.ndarray             # () int32 next write slot
    kf_count: jnp.ndarray             # () int32 keyframes processed
    last_acc: jnp.ndarray             # (3,) last IMU sample (midpoint seed)
    last_gyr: jnp.ndarray             # (3,)


class StepOutput(NamedTuple):
    p: jnp.ndarray
    q: jnp.ndarray
    v: jnp.ndarray
    ba: jnp.ndarray
    bg: jnp.ndarray
    cost: jnp.ndarray
    n_lidar_factors: jnp.ndarray
    ddt: jnp.ndarray   # receiver clock drift of the newest bound epoch (m/s)


def init_carry(cfg: GlioConfig, p0, q0, v0) -> SlidingWindowCarry:
    K = cfg.estimator.slide_window_width
    S = cfg.shapes.scan_points
    M = cfg.estimator.local_map_width
    w = WindowState.identity(K)
    w = w._replace(
        p=jnp.tile(jnp.asarray(p0, F64), (K, 1)),
        q=jnp.tile(jnp.asarray(q0, F64), (K, 1)),
        v=jnp.tile(jnp.asarray(v0, F64), (K, 1)))
    n = K * POSE_DOF
    return SlidingWindowCarry(
        window=w,
        window_scans=jnp.zeros((K, S, 3), F32),
        window_scan_valid=jnp.zeros((K, S), bool),
        prior_sqrt_jac=jnp.zeros((n, n), F64),
        prior_sqrt_res=jnp.zeros((n,), F64),
        prior_valid=jnp.asarray(False),
        prior_lin=w,
        map_scans=jnp.zeros((M, S, 3), F32),
        map_scan_valid=jnp.zeros((M, S), bool),
        map_world=jnp.zeros((M, S, 3), F32),
        map_p=jnp.zeros((M, 3), F64),
        map_q=jnp.tile(jnp.array([1.0, 0, 0, 0], F64), (M, 1)),
        map_slot_valid=jnp.zeros((M,), bool),
        map_head=jnp.asarray(0, jnp.int32),
        kf_count=jnp.asarray(0, jnp.int32),
        last_acc=jnp.zeros(3, F64),
        last_gyr=jnp.zeros(3, F64),
    )


def _associate(cfg: GlioConfig, window: WindowState, window_scans,
               window_scan_valid, map_points, map_valid):
    """Scan-to-map plane correspondences for every window keyframe.

    Fused equivalent of ``findCorrespondingSurfFeatures``
    (Estimator.cpp:3633-3708) + ``featureSelection`` (:3894-3992):
    5-NN within kd_max_radius → plane fit with surf_dist_thres planarity →
    weight threshold 0.3 → keep top feature_res_num by weight
    (deterministic replacement for the reference's random subset).
    """
    est = cfg.estimator
    K = window.p.shape[0]
    S = cfg.shapes.scan_points
    Fsel = min(cfg.feature_selection.feature_res_num, S)

    # World-frame query points for all window frames at once. Entirely in
    # f32: only the f32 cast was ever consumed (association + plane fits
    # are f32), and the K·S emulated-f64 quaternion rotate was ~1.5 ms of
    # the step's fixed cost (measured, profile_stages.py). f32 keeps
    # ~0.1 mm at local-map scale — same budget as the map transform.
    q_lb = jnp.asarray(est.ql2b, F32)
    t_lb = jnp.asarray(est.tl2b, F32)
    body = lidar_factors.body_from_lidar(
        window_scans.astype(F32), q_lb, t_lb)             # (K, S, 3)
    world32 = (quat.rotate(window.q[:, None, :].astype(F32), body)
               + window.p[:, None, :].astype(F32)).reshape(K * S, 3)
    valid_flat = window_scan_valid.reshape(K * S)

    d2, idx = neighbors.knn(world32, valid_flat, map_points, map_valid,
                            k=5)
    neigh = neighbors.gather_neighbors(map_points, idx)   # (K*S, 5, 3)
    neigh_ok = (idx >= 0) & (d2 <= est.kd_max_radius ** 2)
    fit = plane_fit.fit_planes(neigh, neigh_ok, world32,
                               plane_tol=est.surf_dist_thres)
    w = fit.weight
    good = fit.valid & valid_flat & (w > 0.3) & jnp.all(neigh_ok, axis=-1)

    w = jnp.where(good, w, -1.0).reshape(K, S)
    # Deterministic NORMAL-DIVERSE top-F selection per keyframe: top-k
    # within each dominant-normal-axis bucket, then the best Fsel of the
    # union. A plain global top-k-by-weight concentrates on the
    # flattest planes — on ground-dominated scans that is ~100% ground
    # (vertical normals), leaving horizontal translation unconstrained
    # and the window slipping quadratically (measured on HDL-32E-shaped
    # raycast frames: 19.6 m over 60 keyframes; diverse selection
    # restores the constraint). The reference's RANDOM subset
    # (featureSelection, Estimator.cpp:3894-3992) achieves the same
    # diversity statistically; bucketing is its deterministic
    # counterpart.
    if cfg.feature_selection.diverse_select:
        # Half-exploit / half-spread selection (see
        # FeatureSelectionConfig.diverse_select). A pure global
        # top-F-by-weight concentrates on the flattest, NEAREST fits —
        # on ground-dominated scans that is ~100% vertical-normal
        # near-field points, leaving horizontal translation and yaw
        # soft (measured on HDL-32E-shaped raycast frames: 19.6 m
        # quadratic drift over 60 keyframes vs 0.6 m with 10× the
        # features). So: the best F/2 globally by weight, plus F/2
        # spread over 3 dominant-normal axes × 6 azimuth sextants
        # (normal diversity constrains every translation axis; azimuth
        # spread buys yaw lever arms — the intent of the reference's
        # information-aware featureSelection, Estimator.cpp:3894-3992,
        # whose released code degenerated to a uniform random subset).
        G = Fsel // 2
        gw, gi = jax.lax.top_k(w, G)                      # global picks
        # Mask global picks before the diverse pass (no duplicates).
        rows = jnp.arange(K)[:, None]
        w2 = w.at[rows, gi].set(-1.0)
        dom = jnp.argmax(jnp.abs(fit.normal), axis=-1).reshape(K, S)
        az = jnp.arctan2(window_scans[..., 1], window_scans[..., 0])
        sect = jnp.clip((az + jnp.pi) / (jnp.pi / 3.0), 0,
                        5).astype(jnp.int32)
        bucket = dom * 6 + sect.reshape(K, S)             # 0..17
        n_buckets = 18
        D = Fsel - G
        Fb = -(-D // n_buckets)
        parts_w, parts_i = [], []
        for b in range(n_buckets):
            wa = jnp.where(bucket == b, w2, -1.0)
            twa, tia = jax.lax.top_k(wa, Fb)
            parts_w.append(twa)
            parts_i.append(tia)
        cw = jnp.concatenate(parts_w, -1)                 # (K, 18·Fb)
        ci = jnp.concatenate(parts_i, -1)
        dw, sub = jax.lax.top_k(cw, D)
        di = jnp.take_along_axis(ci, sub, -1)
        top_w = jnp.concatenate([gw, dw], -1)             # (K, F)
        top_i = jnp.concatenate([gi, di], -1)
    else:
        # Deterministic global top-F by weight: the most confident
        # fits; best on corner-rich content (noise-free sim <0.1 m).
        top_w, top_i = jax.lax.top_k(w, Fsel)             # (K, F)
    sel_mask = top_w > 0
    flat_i = top_i + jnp.arange(K)[:, None] * S

    sel_points = window_scans.reshape(K * S, 3)[flat_i]   # lidar-frame points
    sel_normal = fit.normal.reshape(K * S, 3)[flat_i].astype(F64)
    sel_d = fit.d.reshape(K * S)[flat_i].astype(F64)
    sel_score = (est.lidar_const * top_w).astype(F64)
    return (sel_points.astype(F64), sel_normal, sel_d, sel_score, sel_mask)


def _window_residual(cfg: GlioConfig, state: WindowState, pres, imu_sqrt_info,
                     imu_edge_valid, lidar_meas, prior_sqrt_jac,
                     prior_sqrt_res, prior_valid, prior_lin, gravity,
                     gnss_win: "GnssKfData" = None, ddt=None):
    """All window residuals, concatenated (fixed shape)."""
    est = cfg.estimator
    K = state.p.shape[0]
    q_lb = jnp.asarray(est.ql2b, F64)
    t_lb = jnp.asarray(est.tl2b, F64)

    # Marginalization prior.
    dx = local_coordinates(state, prior_lin)
    r_prior = prior_sqrt_res + prior_sqrt_jac @ dx
    r_prior = jnp.where(prior_valid, r_prior, jnp.zeros_like(r_prior))

    # IMU edges i → i+1 (whitening precomputed outside the LM loop).
    def imu_res(S, pre, i_valid, pi, qi, vi, bai, bgi, pj, qj, vj, baj, bgj):
        r = imu_factors.whitened_residual_cached(
            S, pre, pi, qi, vi, bai, bgi, pj, qj, vj, baj, bgj,
            gravity=gravity)
        return jnp.where(i_valid, r, jnp.zeros_like(r))

    r_imu = jax.vmap(imu_res)(
        imu_sqrt_info, pres, imu_edge_valid,
        state.p[:-1], state.q[:-1], state.v[:-1], state.ba[:-1], state.bg[:-1],
        state.p[1:], state.q[1:], state.v[1:], state.ba[1:], state.bg[1:])

    # LiDAR plane factors per window frame. Evaluated in f32: point
    # clouds are metre-scale around a local origin, so f32 holds ~0.1 mm —
    # and the f32 path avoids TPU f64 emulation in the hot jacfwd (the
    # pose still enters in f64 and Jacobians are accumulated in f64).
    pts, nrm, d, score, mask = lidar_meas
    F32_ = jnp.float32

    def lid_res(pts_k, nrm_k, d_k, score_k, mask_k, t_k, q_k):
        return lidar_factors.plane_norm_residual(
            pts_k.astype(F32_), nrm_k.astype(F32_), d_k.astype(F32_),
            score_k.astype(F32_), t_k.astype(F32_), q_k.astype(F32_),
            q_lb.astype(F32_), t_lb.astype(F32_), mask_k)

    r_lidar = jax.vmap(lid_res)(pts, nrm, d, score, mask,
                                state.p, state.q).astype(F64)
    # Robust loss on lidar residuals (reference: HuberLoss(1.0)).
    r_lidar = r_lidar * dense.huber_weight(r_lidar, 1.0)

    parts = [r_prior, r_imu.reshape(-1), r_lidar.reshape(-1)]

    # Optional DD pseudorange rows (the reference carries these factors in
    # optimizeSlidingWindowWithLandMark but ships them compiled out,
    # `#if 0` Estimator.cpp:2255-2421; batch-stage weighting re-used).
    # Slot k's epoch binds to the interval (k-1, k); slot 0's older pose
    # has left the window, so it is masked.  These rows are deliberately
    # NOT in the marginalization factor set (like the bias regularizer):
    # the epoch drops out with its interval instead of baking into the
    # prior.
    if gnss_win is not None:
        init = cfg.initialization
        anchor = jnp.asarray(init.anc_ecef, F64)
        yaw = jnp.asarray(init.yaw_enu_local, F64)
        station = jnp.asarray(init.station_ecef, F64)
        lever = jnp.asarray(init.lever_arm, F64)

        def dd_k(g, p_older, p_newer, pair_ok):
            r = gnss_factors.dd_psr_residual(
                p_older.astype(F64), p_newer.astype(F64), g.ratio, anchor,
                yaw, station, g.sat_pos, g.psr_rov, g.psr_sta, g.sv_valid,
                g.system, g.master, g.whiten,
                threshold=est.window_dd_threshold, lever_arm=lever)
            return jnp.where(g.valid & pair_ok, r, jnp.zeros_like(r))

        pair_ok = jnp.arange(K) >= 1
        p_older = jnp.concatenate([state.p[:1], state.p[:-1]])
        r_dd = jax.vmap(dd_k)(gnss_win, p_older, state.p, pair_ok)
        parts.append(r_dd.reshape(-1))

        # Doppler rows (tcdopplerFactor, dopp_factor.hpp:19-85): interpolated
        # position AND velocity of the bounding keyframes, per-slot receiver
        # clock drift, HuberLoss(1.0) like the reference.
        if ddt is not None:
            v_older = jnp.concatenate([state.v[:1], state.v[:-1]])

            def dopp_k(g, p_o, v_o, p_n, v_n, ddt_k, pair):
                r = gnss_factors.doppler_residual(
                    p_o.astype(F64), v_o.astype(F64), p_n.astype(F64),
                    v_n.astype(F64), g.ratio, ddt_k, anchor, yaw,
                    g.sat_pos, g.sat_vel, g.sat_ddt, g.dopp,
                    g.dopp_valid & g.sv_valid,
                    jnp.maximum(g.dopp_std, 1e-3), lever_arm=lever)
                return jnp.where(g.valid & pair, r, jnp.zeros_like(r))

            r_dopp = jax.vmap(dopp_k)(gnss_win, p_older, v_older, state.p,
                                      state.v, ddt, pair_ok)
            r_dopp = r_dopp * dense.huber_weight(r_dopp, 1.0)
            # Consecutive-epoch clock-drift tie (constantClockDriftFactor,
            # dopp_factor.hpp:88-103; Estimator.cpp:3192): with fixed window
            # shapes we tie adjacent slots that BOTH carry an epoch — a tie
            # across an epoch-less interval is dropped rather than skipped
            # to the next epoch (the drift random-walk just restarts).
            tie_ok = gnss_win.valid[:-1] & gnss_win.valid[1:] & pair_ok[1:]
            r_tie = jnp.where(tie_ok, ddt[:-1] - ddt[1:], 0.0)
            r_tie = r_tie * dense.huber_weight(r_tie, 1.0)
            parts += [r_dopp.reshape(-1), r_tie]

    return jnp.concatenate(parts)


def _marginalize_oldest(cfg: GlioConfig, state: WindowState, pres, imu_sqrt_info,
                        imu_edge_valid, lidar_meas, prior_sqrt_jac,
                        prior_sqrt_res, prior_valid, prior_lin, gravity):
    """Schur-drop keyframe 0 → new prior over frames 1..K-1 (re-indexed).

    Factor subset matching Estimator.cpp:2462-2608: the previous prior, the
    IMU edge (0,1), and keyframe 0's lidar factors.
    """
    K = state.p.shape[0]
    n = K * POSE_DOF
    pts, nrm, d, score, mask = lidar_meas
    est = cfg.estimator
    q_lb = jnp.asarray(est.ql2b, F64)
    t_lb = jnp.asarray(est.tl2b, F64)

    def res_fn(delta, dtype):
        s = retract(state, delta.astype(F64))
        s = jax.tree.map(lambda a: a.astype(dtype), s)
        lin = jax.tree.map(lambda a: a.astype(dtype), prior_lin)
        dx = local_coordinates(s, lin)
        r_prior = (prior_sqrt_res.astype(dtype)
                   + prior_sqrt_jac.astype(dtype) @ dx)
        r_prior = jnp.where(prior_valid, r_prior, jnp.zeros_like(r_prior))
        pre0 = jax.tree.map(lambda a: a[0].astype(dtype), pres)
        r_imu = imu_factors.whitened_residual_cached(
            imu_sqrt_info[0].astype(dtype), pre0,
            s.p[0], s.q[0], s.v[0], s.ba[0], s.bg[0],
            s.p[1], s.q[1], s.v[1], s.ba[1], s.bg[1],
            gravity=gravity.astype(dtype))
        r_imu = jnp.where(imu_edge_valid[0], r_imu, jnp.zeros_like(r_imu))
        r_lid = lidar_factors.plane_norm_residual(
            pts[0].astype(dtype), nrm[0].astype(dtype), d[0].astype(dtype),
            score[0].astype(dtype), s.p[0], s.q[0], q_lb.astype(dtype),
            t_lb.astype(dtype), mask[0])
        r_lid = r_lid * dense.huber_weight(r_lid, 1.0)
        return jnp.concatenate([r_prior, r_imu, r_lid])

    zero = jnp.zeros(n, F64)
    r = res_fn(zero, F64)
    # f32 Jacobian (same trick as the window LM: the GN quadratic model is
    # insensitive to 1e-5-relative J error; H/b accumulate in f64).
    J = jax.jacfwd(
        lambda d32: res_fn(d32, jnp.float32))(
        jnp.zeros(n, jnp.float32)).astype(F64)
    H = J.T @ J
    b = J.T @ r
    new_prior = marginalization.marginalize(H, b, POSE_DOF)
    # Pad back to full window dimension: prior over frames 1..K-1 becomes
    # frames 0..K-2 of the next window; the incoming frame K-1 is
    # unconstrained by the prior.
    m = n - POSE_DOF
    sj = jnp.zeros((n, n), F64).at[:m, :m].set(new_prior.sqrt_jac)
    sr = jnp.zeros((n,), F64).at[:m].set(new_prior.sqrt_res)
    return sj, sr


def _shift_window(w: WindowState) -> WindowState:
    """Roll out the oldest frame; duplicate the newest slot (overwritten by
    the incoming keyframe's IMU prediction)."""
    def roll(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)
    return WindowState(*(roll(x) for x in w))


def make_replay(cfg: GlioConfig):
    """Build the jitted full-trajectory replay (see module docstring).

    Returns replay(inputs: KeyframeInput stacked over T, init) →
    StepOutput stacked over T.

    Keeping per-edge IMU buffers inside the carry would waste memory; the
    windowed IMU preintegration instead recomputes from a (K-1)-deep ring
    of raw IMU runs carried as arrays.
    """
    est = cfg.estimator
    K = est.slide_window_width
    S = cfg.shapes.scan_points
    M = est.local_map_width
    NI = cfg.shapes.max_imu_per_interval
    params = imu_factors.ImuParams(
        cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w,
        cfg.imu.gravity)
    gravity = params.gravity_vec()
    q_lb = jnp.asarray(est.ql2b, F64)
    t_lb = jnp.asarray(est.tl2b, F64)

    class Carry(NamedTuple):
        base: SlidingWindowCarry
        imu_acc: jnp.ndarray    # (K-1, NI, 3) edge IMU ring (edge k: k→k+1)
        imu_gyr: jnp.ndarray
        imu_dt: jnp.ndarray     # (K-1, NI)
        imu_valid: jnp.ndarray  # (K-1, NI)
        imu_seed: jnp.ndarray   # (K-1, 6) acc0/gyr0 seeds per edge
        gnss_win: GnssKfData    # (K, ...) ring of interval DD epochs
        ddt: jnp.ndarray        # (K,) receiver clock drift per bound epoch

    use_gnss = est.gnss_in_sliding_window
    use_dopp = use_gnss and est.doppler_in_window

    def step(carry: Carry, inp: KeyframeInput):
        c = carry.base
        w = c.window
        newest = K - 1
        first = c.kf_count == 0

        # IMU accel sanity clamp (reference: saveKeyFramesAndFactors clamps
        # spikes at +/-15..18 m/s^2, Estimator.cpp:4176-4182).
        inp = inp._replace(imu_acc=jnp.clip(inp.imu_acc, -18.0, 18.0))

        # 1. Slide window state/scans/prior (the incoming frame's slot is
        # filled with the IMU prediction in step 3a below).
        w_slid = _shift_window(w)

        scans = jnp.where(
            first, c.window_scans.at[newest].set(inp.scan),
            jnp.concatenate([c.window_scans[1:], inp.scan[None]], 0))
        scan_valid = jnp.where(
            first, c.window_scan_valid.at[newest].set(inp.scan_valid),
            jnp.concatenate([c.window_scan_valid[1:], inp.scan_valid[None]], 0))

        # IMU ring: shift, append the new edge (only when not first).
        def shift_append(ring, new):
            rolled = jnp.concatenate([ring[1:], new[None]], 0)
            return jnp.where(first, ring, rolled)

        imu_acc = shift_append(carry.imu_acc, inp.imu_acc.astype(F64))
        imu_gyr = shift_append(carry.imu_gyr, inp.imu_gyr.astype(F64))
        imu_dt = shift_append(carry.imu_dt, inp.imu_dt.astype(F64))
        imu_valid = shift_append(carry.imu_valid,
                                 inp.imu_valid & (~first))
        imu_seed = shift_append(
            carry.imu_seed, jnp.concatenate([c.last_acc, c.last_gyr]))
        gnss_win = jax.tree.map(
            lambda ring, new: jnp.where(
                first,
                ring if ring.ndim == 0 else ring,
                jnp.concatenate([ring[1:], new[None]], 0)),
            carry.gnss_win, inp.gnss)
        # Clock-drift ring slides with the epochs; the incoming slot warm-
        # starts from the last estimate (drift is slowly varying — that is
        # exactly what constantClockDriftFactor encodes).
        ddt_ring = jnp.where(
            first, carry.ddt,
            jnp.concatenate([carry.ddt[1:], carry.ddt[-1:]], 0))

        # Edge validity: edge k valid once kf_count > K-1-k ... simpler:
        # number of edges available = min(kf_count, K-1) (after append).
        n_edges = jnp.minimum(c.kf_count, K - 1)
        edge_idx = jnp.arange(K - 1)
        imu_edge_valid = edge_idx >= (K - 1 - n_edges)

        # 2. Preintegrate window edges (vmapped masked scans, zero bias
        # linearization at the *current* window bias estimates; biases are
        # untouched by the step-3 prediction install, so this can run
        # first and the prediction reuse the new edge's deltas).
        def preint(acc, gyr, dt, valid, seed, ba, bg):
            # f32 Jacobian/covariance propagation: the whitening it feeds
            # tolerates 1e-7 relative error, and the 40-step 15×15 matmul
            # chain is the step's dominant cost in emulated f64.
            return imu_factors.preintegrate(
                acc, gyr, dt, valid, ba, bg, seed[:3], seed[3:],
                params=params, cov_dtype=jnp.float32)

        ba_sel = jnp.where(first, w.ba, w_slid.ba)
        bg_sel = jnp.where(first, w.bg, w_slid.bg)
        pres = jax.vmap(preint)(
            imu_acc, imu_gyr, imu_dt, imu_valid, imu_seed,
            ba_sel[:-1], bg_sel[:-1])
        imu_S = jax.vmap(imu_factors.sqrt_info)(pres)

        # 3. Predict the incoming keyframe by composing the newest state
        # with the NEW edge's preintegrated delta (the world-frame
        # midpoint propagation of Estimator.cpp:1581-1604 equals
        # i-frame preintegration + gravity composition exactly — the
        # gravity term telescopes to ½g·Δt² for any step partition).
        # This removes a 40-iteration sequential f64 scan whose
        # per-iteration loop overhead was ~4.4 ms/keyframe — HALF the
        # step's fixed cost (measured via the device trace; the op work
        # inside it was only 0.6 ms).
        pre_new = jax.tree.map(lambda a: a[K - 2], pres)
        p_i, q_i, v_i = w.p[newest], w.q[newest], w.v[newest]
        dt_e = pre_new.sum_dt
        p_pred = (p_i + v_i * dt_e - 0.5 * gravity * dt_e * dt_e
                  + quat.rotate(q_i, pre_new.delta_p))
        q_pred = quat.normalize(quat.mul(q_i, pre_new.delta_q))
        v_pred = v_i - gravity * dt_e + quat.rotate(q_i, pre_new.delta_v)
        # Seed for the next interval: the last valid IMU sample of this
        # one (the sequential propagate's carry, now a masked pick).
        last_i = inp.imu_valid.shape[0] - 1 - jnp.argmax(inp.imu_valid[::-1])
        any_imu = jnp.any(inp.imu_valid)
        a_last = jnp.where(any_imu, inp.imu_acc[last_i].astype(F64),
                           c.last_acc)
        g_last = jnp.where(any_imu, inp.imu_gyr[last_i].astype(F64),
                           c.last_gyr)

        # 3a. Install the new frame.
        w_new = WindowState(
            p=w_slid.p.at[newest].set(p_pred),
            q=w_slid.q.at[newest].set(q_pred),
            v=w_slid.v.at[newest].set(v_pred),
            ba=w_slid.ba, bg=w_slid.bg)
        w_new = jax.tree.map(lambda a, b: jnp.where(first, a, b), w, w_new)

        # 4. Local map in world frame: read the CACHED world clouds.
        # Poses freeze once a frame leaves the window, so only K of the
        # M slots change per step — step 8 retransforms exactly those
        # (same f32 elementwise math as the old per-step full rebuild,
        # bit-identical values). Then voxel the map to 0.4 m exactly as
        # the reference does before its kd-tree
        # (``ds_filter_surf_map.setLeafSize(0.4,..)``, Estimator.cpp:854,
        # applied at :3618-3631): at width 50 the raw ring is M·S=51k
        # points; the unvoxelized kNN over it was the dominant
        # width-scaled fixed cost (r5 ablation), and the reference's
        # association semantics are against the DOWNSAMPLED map.
        map_valid_pts = c.map_scan_valid & c.map_slot_valid[:, None]
        map_flat, map_valid_flat = neighbors.voxel_downsample(
            c.map_world.reshape(M * S, 3), map_valid_pts.reshape(M * S),
            0.4, cfg.shapes.map_points, scatter_keys=True)

        # 5. Associate window scans against the map.
        lidar_meas = _associate(cfg, w_new, scans, scan_valid,
                                map_flat, map_valid_flat)
        have_map = jnp.any(map_valid_flat)
        lidar_meas = lidar_meas[:4] + (lidar_meas[4] & have_map,)

        # 6. Solve. With GNSS in the window the state extends to
        # WindowStateDdt (per-slot receiver clock drift for the Doppler
        # rows); `split` keeps every residual closure generic over both.
        def split(s):
            if use_dopp:
                return s.win, s.ddt
            return s, None

        def residual(s):
            w_, ddt_ = split(s)
            return _window_residual(
                cfg, w_, pres, imu_S, imu_edge_valid, lidar_meas,
                c.prior_sqrt_jac, c.prior_sqrt_res, c.prior_valid,
                c.prior_lin, gravity,
                gnss_win if use_gnss else None, ddt=ddt_)

        # f32 twin for the LM Jacobian: all measurement tensors cast once;
        # state casts inside. GNSS rows stay f64 (pseudorange magnitudes).
        F32c = jnp.float32
        pres32 = jax.tree.map(lambda a: a.astype(F32c), pres)
        imu_S32 = imu_S.astype(F32c)
        lidar_meas32 = tuple(
            a.astype(F32c) if a.dtype != jnp.bool_ else a
            for a in lidar_meas)
        prior_sj32 = c.prior_sqrt_jac.astype(F32c)
        prior_sr32 = c.prior_sqrt_res.astype(F32c)
        prior_lin32 = jax.tree.map(lambda a: a.astype(F32c), c.prior_lin)
        gravity32 = gravity.astype(F32c)

        def residual32(s):
            w_, ddt_ = split(s)
            s32 = jax.tree.map(lambda a: a.astype(F32c), w_)
            r = _window_residual(
                cfg, s32, pres32, imu_S32, imu_edge_valid, lidar_meas32,
                prior_sj32, prior_sr32, c.prior_valid, prior_lin32,
                gravity32,
                gnss_win if use_gnss else None, ddt=ddt_)
            return r.astype(F32c)

        # Gauge handling during warm-up (before the first marginalization
        # prior exists): pin frame 0's POSE only — pinning velocity would
        # freeze a biased IMU prediction and let (v0, ba) lock onto a
        # wrong-but-low-cost pair that the prior then bakes in forever.
        # Biases get a weak zero prior until the marginal prior takes over
        # (the reference's initialization phase provides the same
        # regularization through its GNSS/odometry alignment).
        def residual_anchored(s):
            r = residual(s)
            s, _ = split(s)
            anchor = jnp.concatenate([
                1e2 * (s.p[0] - w_new.p[0]),
                1e2 * quat.log(quat.mul(quat.conj(w_new.q[0]), s.q[0])),
            ])
            anchor = jnp.where(c.prior_valid, jnp.zeros_like(anchor), anchor)
            # Always-on weak zero-prior on biases (σ≈0.3 m/s², 0.03 rad/s).
            # Deliberately NOT part of the marginalization factor set, so it
            # regularizes each window without accumulating information —
            # this is what keeps the weakly-observable (v0, ba) direction
            # from locking in a wrong value through the prior.
            bias_reg = jnp.concatenate([
                10.0 * s.ba.reshape(-1), 30.0 * s.bg.reshape(-1)])
            return jnp.concatenate([r, anchor, bias_reg])

        def residual_anchored32(s):
            r = residual32(s)
            s, _ = split(s)
            s32 = jax.tree.map(lambda a: a.astype(F32c), s)
            anchor = jnp.concatenate([
                1e2 * (s32.p[0] - w_new.p[0].astype(F32c)),
                1e2 * quat.log(quat.mul(
                    quat.conj(w_new.q[0].astype(F32c)), s32.q[0])),
            ])
            anchor = jnp.where(c.prior_valid, jnp.zeros_like(anchor), anchor)
            bias_reg = jnp.concatenate([
                10.0 * s32.ba.reshape(-1), 30.0 * s32.bg.reshape(-1)])
            return jnp.concatenate([r, anchor, bias_reg])

        if use_dopp:
            out = dense.lm_solve(
                residual_anchored, retract_ddt,
                WindowStateDdt(w_new, ddt_ring), K * POSE_DOF + K,
                max_iters=est.sw_max_iter,
                residual32_fn=residual_anchored32)
            solved, ddt_solved = out.x.win, out.x.ddt
        else:
            out = dense.lm_solve(
                residual_anchored, retract, w_new, K * POSE_DOF,
                max_iters=est.sw_max_iter,
                residual32_fn=residual_anchored32)
            solved, ddt_solved = out.x, ddt_ring

        # Divergence gates (Estimator.cpp:2650-2726): reject absurd
        # solutions, keep prediction instead.
        ok = (jnp.all(jnp.isfinite(solved.p))
              & (jnp.linalg.norm(solved.p[newest] - w_new.p[newest]) < 100.0)
              & (jnp.linalg.norm(solved.v) < 100.0 * K)
              & (jnp.max(jnp.abs(solved.ba)) < 2.0)
              & (jnp.max(jnp.abs(solved.bg)) < 2.0)
              & jnp.all(jnp.abs(ddt_solved) < 1e4))
        solved = jax.tree.map(lambda a, b: jnp.where(ok, a, b), solved, w_new)
        ddt_solved = jnp.where(ok, ddt_solved, ddt_ring)

        # 7. Marginalize the oldest frame once the window is full.
        sj, sr = _marginalize_oldest(
            cfg, solved, pres, imu_S, imu_edge_valid, lidar_meas,
            c.prior_sqrt_jac, c.prior_sqrt_res, c.prior_valid, c.prior_lin,
            gravity)
        window_full = (c.kf_count >= K - 1) & est.enable_marginalization
        prior_sqrt_jac = jnp.where(window_full, sj, c.prior_sqrt_jac)
        prior_sqrt_res = jnp.where(window_full, sr, c.prior_sqrt_res)
        prior_valid = c.prior_valid | window_full
        # Prior linearization point: the post-solve window *shifted* so that
        # old frame k+1 sits at slot k (ready for the next step's indexing).
        prior_lin = jax.tree.map(
            lambda a, b: jnp.where(window_full, a, b),
            _shift_window(solved), c.prior_lin)

        # 8. Update the map ring buffer: write back window poses for frames
        # still present, then append the (about-to-leave or newest) frame.
        # Slot mapping: the j-th most recent map slot corresponds to window
        # frame K-1-j while j < K. We append the newest frame each step.
        head = c.map_head
        slot = head % M

        def to_world(scan_body, p_, q_):
            # Exactly the transform the old per-step map rebuild applied
            # (extrinsic + pose, all f32) — values stay bit-identical.
            b = lidar_factors.body_from_lidar(
                scan_body.astype(F32), q_lb.astype(F32), t_lb.astype(F32))
            return (quat.rotate(q_.astype(F32), b)
                    + p_.astype(F32))

        map_scans = c.map_scans.at[slot].set(inp.scan)
        map_scan_valid = c.map_scan_valid.at[slot].set(inp.scan_valid)
        map_p = c.map_p.at[slot].set(solved.p[newest])
        map_q = c.map_q.at[slot].set(solved.q[newest])
        map_world = c.map_world.at[slot].set(
            to_world(inp.scan, solved.p[newest], solved.q[newest]))
        map_slot_valid = c.map_slot_valid.at[slot].set(True)
        # Write back refreshed poses for the last K-1 slots (window
        # frames) and refresh their cached world clouds.
        def write_back(i, arrs):
            mp, mq, mw = arrs
            # window frame index K-1-1-i (skip newest already written),
            # slot head-1-i.
            wf = K - 2 - i
            sl = (head - 1 - i) % M
            in_window = (i < n_edges)
            mp = mp.at[sl].set(jnp.where(in_window, solved.p[wf], mp[sl]))
            mq = mq.at[sl].set(jnp.where(in_window, solved.q[wf], mq[sl]))
            w_sl = to_world(map_scans[sl], solved.p[wf], solved.q[wf])
            mw = mw.at[sl].set(jnp.where(in_window, w_sl, mw[sl]))
            return mp, mq, mw

        map_p, map_q, map_world = jax.lax.fori_loop(
            0, K - 1, write_back, (map_p, map_q, map_world))

        new_base = SlidingWindowCarry(
            window=solved,
            window_scans=scans,
            window_scan_valid=scan_valid,
            prior_sqrt_jac=prior_sqrt_jac,
            prior_sqrt_res=prior_sqrt_res,
            prior_valid=prior_valid,
            prior_lin=prior_lin,
            map_scans=map_scans,
            map_scan_valid=map_scan_valid,
            map_world=map_world,
            map_p=map_p,
            map_q=map_q,
            map_slot_valid=map_slot_valid,
            map_head=head + 1,
            kf_count=c.kf_count + 1,
            last_acc=a_last,
            last_gyr=g_last,
        )
        new_carry = Carry(new_base, imu_acc, imu_gyr, imu_dt, imu_valid,
                          imu_seed, gnss_win, ddt_solved)
        out_rec = StepOutput(
            p=solved.p[newest], q=solved.q[newest], v=solved.v[newest],
            ba=solved.ba[newest], bg=solved.bg[newest], cost=out.cost,
            n_lidar_factors=jnp.sum(lidar_meas[4]).astype(jnp.int32),
            ddt=ddt_solved[newest])
        return new_carry, out_rec

    def make_initial_carry(p0, q0, v0, acc0=None, gyr0=None,
                           inputs_template=None):
        """Fresh carry for replay_from; inputs_template is one stacked
        KeyframeInput (shapes taken from it, like replay() does)."""
        base = init_carry(cfg, p0, q0, v0)
        if acc0 is not None:
            base = base._replace(last_acc=jnp.asarray(acc0, F64),
                                 last_gyr=jnp.asarray(gyr0, F64))
        ni = inputs_template.imu_acc.shape[-2]
        gnss0 = jax.tree.map(
            lambda a: jnp.zeros((K,) + a.shape[1:], a.dtype),
            inputs_template.gnss)
        return Carry(
            base,
            imu_acc=jnp.zeros((K - 1, ni, 3), F64),
            imu_gyr=jnp.zeros((K - 1, ni, 3), F64),
            imu_dt=jnp.zeros((K - 1, ni), F64),
            imu_valid=jnp.zeros((K - 1, ni), bool),
            imu_seed=jnp.zeros((K - 1, 6), F64),
            gnss_win=gnss0,
            ddt=jnp.zeros((K,), F64),
        )

    @jax.jit
    def replay_from(carry, inputs: KeyframeInput):
        """Resume a replay from a saved carry (checkpoint/resume API —
        the estimator state is one pytree; see utils.checkpoint). Returns
        (final_carry, outputs); bit-identical to an uninterrupted run."""
        return jax.lax.scan(step, carry, inputs)

    def replay(inputs: KeyframeInput, p0, q0, v0, acc0=None, gyr0=None):
        base = init_carry(cfg, p0, q0, v0)
        if acc0 is not None:
            base = base._replace(last_acc=jnp.asarray(acc0, F64),
                                 last_gyr=jnp.asarray(gyr0, F64))
        NI = inputs.imu_acc.shape[-2]  # per-interval IMU padding from data
        gnss0 = jax.tree.map(
            lambda a: jnp.zeros((K,) + a.shape[1:], a.dtype), inputs.gnss)
        carry = Carry(
            base,
            imu_acc=jnp.zeros((K - 1, NI, 3), F64),
            imu_gyr=jnp.zeros((K - 1, NI, 3), F64),
            imu_dt=jnp.zeros((K - 1, NI), F64),
            imu_valid=jnp.zeros((K - 1, NI), bool),
            imu_seed=jnp.zeros((K - 1, 6), F64),
            gnss_win=gnss0,
            ddt=jnp.zeros((K,), F64),
        )
        final, outs = jax.lax.scan(step, carry, inputs)
        return outs

    replay_jit = jax.jit(replay)
    replay_jit.make_initial_carry = make_initial_carry
    replay_jit.replay_from = replay_from
    return replay_jit, step
