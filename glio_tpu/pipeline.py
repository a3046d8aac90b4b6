"""End-to-end pipeline orchestration.

The reference wires four ROS processes via topics and writes three result
CSVs (``run_urban_hk.launch`` + the Estimator's writer threads).  This
module is that launch file's equivalent: one deterministic call that runs

  episode → sliding-window fusion        → tc_sw_result.csv
          → batch fusion (with GNSS DD)  → tc_batch_result.csv
          → RTK-float fixes + LC fusion  → lc_result.csv

over tensorized episodes, with the same CSV schema
(``t, week, tow, lat, lon, alt, yaw, pitch, roll, E, N, U``).
"""

import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import GlioConfig
from .data.episode import Episode
from .eval import trajectory as traj
from .models import batch as batch_mod
from .models import lc_fusion
from .models.sliding_window import make_replay
from .gnss import rtk
from .utils import coords as C
from .utils import quat


@dataclass
class PipelineResult:
    kf_time: np.ndarray
    p_sw: np.ndarray
    q_sw: np.ndarray
    p_batch: Optional[np.ndarray] = None
    q_batch: Optional[np.ndarray] = None
    cov_batch: Optional[np.ndarray] = None      # (T, 6, 6) formal marginals
    cov_batch_cal: Optional[np.ndarray] = None  # (T, 6, 6) residual-
                                                # consistency calibrated
    p_lc: Optional[np.ndarray] = None
    q_lc: Optional[np.ndarray] = None
    n_loop_edges: int = 0
    # Dense inter-keyframe interpolation (optimizeLocalGraph parity).
    p_dense: Optional[np.ndarray] = None        # (T-1, D, 3)
    q_dense: Optional[np.ndarray] = None        # (T-1, D, 4)
    dense_valid: Optional[np.ndarray] = None    # (T-1, D)


def _georef(p_local, q_local, anchor_ecef, yaw_enu_local):
    """Local → (llh, ypr, enu) for CSV output. With yaw=0 local == ENU."""
    sy, cy = np.sin(yaw_enu_local), np.cos(yaw_enu_local)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    enu = p_local @ Rz.T
    ecef = np.asarray(C.enu2ecef(jnp.asarray(enu), jnp.asarray(anchor_ecef)))
    llh = np.asarray(C.ecef2llh(jnp.asarray(ecef)))
    ypr = np.rad2deg(np.asarray(quat.to_ypr(jnp.asarray(q_local))))
    return llh, ypr, enu


def _slice_epochs_fixed(g, t0, t1, n_out):
    """Fixed-shape epoch window: epochs with time in [t0, t1], padded with
    invalid entries (time sentinel < every keyframe time → ep_valid False
    in ``batch.build_problem``). Keeps the interleaved fusion solve at one
    compiled shape."""
    time = np.asarray(g.time)
    idx = np.nonzero((time >= t0) & (time <= t1))[0][:n_out]

    class _G:
        pass

    out = _G()
    for f in ("sat_pos", "psr_rov", "psr_sta", "valid", "system",
              "master", "elevation", "snr", "sat_vel", "sat_ddt",
              "dopp_rov"):
        a = np.asarray(getattr(g, f))
        pad = np.zeros((n_out,) + a.shape[1:], a.dtype)
        pad[:len(idx)] = a[idx]
        setattr(out, f, pad)
    t = np.full(n_out, -1e18)
    t[:len(idx)] = time[idx]
    out.time = t
    return out


def replay_with_backend_fusion(cfg: GlioConfig, ep: Episode, inputs,
                               anchor, yaw, station,
                               every: int = 40, fusion_span: int = 160,
                               debug: bool = False):
    """Sliding window interleaved with online batch correction.

    Reference-parity for ``backendFusionThread`` (Estimator.cpp:5352 +
    :2739-2748): the reference's batch stage runs CONCURRENTLY with the
    sliding window and writes corrected keyframe poses back into
    ``pose_info_keyframe``, which ``buildLocalMapWithLandMark`` reads — so
    the window always associates against a drift-corrected local map. A
    purely sequential sw→batch pipeline loses that feedback: local-map
    drift compounds (pose error → warped map → worse association), and on
    long trajectories the window eventually decouples from the map.

    Every `every` keyframes this driver batch-solves the trailing
    `fusion_span` keyframes against the GNSS DD factors (fixed problem
    shape → one XLA compile) and writes the corrected poses into the
    estimator's map ring for frames that have left the window.
    """
    import jax as _jax
    from .models.sliding_window import make_replay

    est = cfg.estimator
    K = est.slide_window_width
    M = est.local_map_width
    replay, _ = make_replay(cfg)
    kf_time = np.asarray(ep.kf_time)
    T = kf_time.shape[0]
    kf_dt = float(np.median(np.diff(kf_time))) if T > 1 else 0.33
    carry = replay.make_initial_carry(
        jnp.asarray(ep.p0), jnp.asarray(ep.q0), jnp.asarray(ep.v0),
        None if ep.acc0 is None else jnp.asarray(ep.acc0),
        None if ep.gyr0 is None else jnp.asarray(ep.gyr0),
        inputs_template=inputs)
    p_hist = np.zeros((0, 3))
    q_hist = np.zeros((0, 4))
    for s in range(0, T, every):
        part = jax_tree_slice(inputs, s, s + every)
        carry, out = replay.replay_from(carry, part)
        p_hist = np.concatenate([p_hist, np.asarray(out.p)])
        q_hist = np.concatenate([q_hist, np.asarray(out.q)])
        t = p_hist.shape[0]
        s0 = max(0, t - fusion_span)
        n = t - s0
        if n < 3 * K or ep.gnss is None:
            continue
        pw = np.zeros((fusion_span, 3))
        qw = np.zeros((fusion_span, 4))
        qw[:, 0] = 1.0
        tw = np.zeros(fusion_span)
        pw[:n] = p_hist[s0:t]
        qw[:n] = q_hist[s0:t]
        tw[:n] = kf_time[s0:t]
        if n < fusion_span:
            # Pad by extending the last pose (relatives stay consistent;
            # no epochs bind past the real segment).
            pw[n:] = pw[n - 1]
            qw[n:] = qw[n - 1]
            tw[n:] = tw[n - 1] + kf_dt * np.arange(1, fusion_span - n + 1)
        gsub = _slice_epochs_fixed(ep.gnss, tw[0], kf_time[t - 1],
                                   fusion_span)
        prob = batch_mod.build_problem(cfg, pw, qw, tw, gsub,
                                       anchor, yaw, station)
        # Robust IRLS matches the production batch configuration (bench):
        # without it a diverged window tail drags the WHOLE fused chain
        # toward the divergence instead of being rejected, and the
        # guarded reset then snaps the window to a compromised target.
        pc, qc, _ = batch_mod.optimize_batch(
            cfg, prob, solver=cfg.estimator.batch_solver,
            robust=batch_mod.RobustOpts(dd_huber=1.0, epoch_gate=2.0,
                                        rel_huber=5.0))
        p_hist[s0:t] = np.asarray(pc)[:n]
        q_hist[s0:t] = np.asarray(qc)[:n]
        # Correct the map ring for frames that already left the window
        # (the window itself refreshes the newest K slots every step).
        base = carry.base
        mp = np.array(base.map_p)
        mq = np.array(base.map_q)
        for i in range(max(s0, t - M), t - K):
            mp[i % M] = p_hist[i]
            mq[i % M] = q_hist[i]
        base = base._replace(map_p=jnp.asarray(mp), map_q=jnp.asarray(mq))
        # Re-initialize the window if it has walked away from the fused
        # estimate (divergence recovery: the reference's loose per-frame
        # gates let an INS runaway persist once associations are lost;
        # snapping the window states back to the GNSS-corrected trajectory
        # and dropping the — now inconsistent — marginalization prior
        # restores tracking; velocities are re-seeded by finite
        # differences).
        w = base.window
        # Divergence signals (gates in EstimatorConfig, VERDICT r2 #8):
        # (a) window tail vs fused tail — catches the batch correcting
        #     the trajectory away from a runaway window;
        # (b) fused tail vs an INDEPENDENT per-epoch RTK DD fix — catches
        #     the case where the robust batch *rejected* the diverged
        #     tail's GNSS epochs as outliers, so fused == window and
        #     signal (a) stays silent while the error grows unbounded.
        drift_thr = cfg.estimator.reset_drift_threshold
        fix_gate = cfg.estimator.reset_fix_disagree
        vmax = cfg.estimator.reset_max_speed
        g = ep.gnss

        def dd_fix_at(t_query):
            """Single-epoch RTK DD position at the epoch nearest t_query,
            rotated into the local frame; None when no epoch solves."""
            ei = int(np.searchsorted(np.asarray(g.time), t_query)) - 1
            if ei < 0:
                return None
            fx, _, ok, _ = rtk.solve_epoch_dd(
                jnp.asarray(g.sat_pos[ei]), jnp.asarray(g.psr_rov[ei]),
                jnp.asarray(g.psr_sta[ei]), jnp.asarray(g.valid[ei]),
                jnp.asarray(g.system[ei], jnp.int32),
                jnp.asarray(g.master[ei]), jnp.asarray(station),
                jnp.asarray(g.elevation[ei]), jnp.asarray(g.snr[ei]),
                jnp.asarray(anchor),
                huber=cfg.estimator.rtk_fix_huber,
                trim=cfg.estimator.rtk_fix_trim)
            if not bool(ok):
                return None
            enu = np.asarray(C.ecef2enu(fx[None], jnp.asarray(anchor)))[0]
            sy, cy = np.sin(yaw), np.cos(yaw)
            return np.array([[cy, sy, 0], [-sy, cy, 0], [0, 0, 1.0]]) @ enu

        p_fix = dd_fix_at(kf_time[t - 1])
        drift = float(np.linalg.norm(
            np.asarray(w.p[-1]) - p_hist[t - 1]))
        # Disagreement with the independent fix: the fused tail being far
        # from a metre-accurate absolute position means the robust batch
        # locked the true GNSS out as outliers (fused == diverged window,
        # signal (a) silent) — its own, tighter gate.
        fix_dis = (0.0 if p_fix is None
                   else float(np.linalg.norm(p_hist[t - 1] - p_fix)))
        pk = p_hist[t - K:t]
        qk = q_hist[t - K:t]
        hop = (np.linalg.norm(np.diff(pk, axis=0), axis=-1) / kf_dt
               if pk.shape[0] > 1 else np.zeros(1))
        # Only snap to a PLAUSIBLE fused target: finite, physically
        # possible hop speeds, and agreeing with the independent fix
        # when one exists — otherwise a reset would inject garbage
        # states (the finite-difference velocity seed amplifies a
        # position spike into astronomic velocities).
        target_sane = bool(
            np.isfinite(pk).all() and hop.max() < vmax
            and fix_dis <= fix_gate)
        did_reset = False
        if debug:
            print(f"[fusion t={t}] drift={drift:.2f} fix_dis={fix_dis:.2f}"
                  f" hop_max={float(hop.max()):.2f} sane={target_sane}",
                  flush=True)
        # NOTE: target_sane already requires fix_dis <= fix_gate, so only
        # the drift signal can route HERE; fix disagreement always routes
        # to the re-anchor branch below (the fused target itself is
        # compromised when the fix disagrees with it).
        if drift > drift_thr and target_sane:
            did_reset = True
            if debug:
                print(f"[fusion t={t}] RESET → fused tail", flush=True)
            vk = np.clip(np.gradient(pk, kf_dt, axis=0), -vmax, vmax)
            w = w._replace(p=jnp.asarray(pk), q=jnp.asarray(qk),
                           v=jnp.asarray(vk))
            base = base._replace(
                window=w,
                prior_valid=jnp.asarray(False),
                prior_sqrt_jac=jnp.zeros_like(base.prior_sqrt_jac),
                prior_sqrt_res=jnp.zeros_like(base.prior_sqrt_res))
        elif (drift > drift_thr or fix_dis > fix_gate) \
                and p_fix is not None:
            # Even the fused tail is broken: re-anchor from direct RTK DD
            # fixes — absolute positions independent of every accumulated
            # state (failure recovery; the ROS reference's equivalent is
            # an operator restart). One fix per window keyframe gives a
            # kinematically consistent seed (finite-difference
            # velocities); keyframes without a solvable epoch fall back
            # to the newest fix.
            did_reset = True
            if debug:
                print(f"[fusion t={t}] RESET → direct RTK fix", flush=True)
            pk2 = np.repeat(p_fix[None], K, 0)
            got = np.zeros(K, bool)
            for j in range(K):
                f = dd_fix_at(kf_time[max(0, t - K + j)])
                if f is not None:
                    pk2[j], got[j] = f, True
            vk2 = (np.clip(np.gradient(pk2, kf_dt, axis=0), -vmax, vmax)
                   if got.all() else np.zeros((K, 3)))
            # Biases re-start at zero: the diverged solve absorbed part
            # of the (possibly faulted) IMU signal into ba/bg, and a
            # stale bias drives a fresh velocity ramp right after the
            # snap; the SpeedBias prior re-estimates them from scratch.
            w = w._replace(
                p=jnp.asarray(pk2),
                v=jnp.asarray(vk2),
                ba=jnp.zeros_like(w.ba),
                bg=jnp.zeros_like(w.bg))
            base = base._replace(
                window=w,
                prior_valid=jnp.asarray(False),
                prior_sqrt_jac=jnp.zeros_like(base.prior_sqrt_jac),
                prior_sqrt_res=jnp.zeros_like(base.prior_sqrt_res),
                # The local map was built at diverged poses (fused ==
                # diverged here, so the ring was "corrected" with broken
                # positions): associating against it would drag the
                # re-anchored window straight back. Drop it; the ring
                # repopulates over the next M keyframes.
                map_slot_valid=jnp.zeros_like(base.map_slot_valid))
            p_hist[t - K:t] = pk2
        if did_reset and hasattr(carry, "ddt"):
            # Root cause of the round-2 "window-Doppler slows
            # re-convergence after resets" finding: during a divergence
            # the per-slot receiver clock-drift states absorb part of the
            # wrong velocity along the mean LOS; carried across the snap,
            # the stale ring + constantClockDriftFactor ties pull the
            # re-seeded velocities back toward the diverged solution.
            # Zero the warm-start — each slot's Doppler rows re-estimate
            # its ddt absolutely in the next solve.
            carry = carry._replace(ddt=jnp.zeros_like(carry.ddt))
        carry = carry._replace(base=base)

    # Final correction sweep: early segments froze at whatever partial
    # correction they had when they left the trailing span; one ordered
    # pass of overlapping fusion windows (same compiled solve) re-corrects
    # them with the benefit of the whole fused trajectory.
    if ep.gnss is not None and T > fusion_span // 2:
        for s0 in range(0, max(1, T - fusion_span // 2), fusion_span // 2):
            t = min(s0 + fusion_span, T)
            s0 = max(0, t - fusion_span)
            n = t - s0
            if n < 3 * K:
                continue
            pw = np.zeros((fusion_span, 3))
            qw = np.zeros((fusion_span, 4))
            qw[:, 0] = 1.0
            tw = np.zeros(fusion_span)
            pw[:n] = p_hist[s0:t]
            qw[:n] = q_hist[s0:t]
            tw[:n] = kf_time[s0:t]
            if n < fusion_span:
                pw[n:] = pw[n - 1]
                qw[n:] = qw[n - 1]
                tw[n:] = tw[n - 1] + kf_dt * np.arange(1, fusion_span - n + 1)
            gsub = _slice_epochs_fixed(ep.gnss, tw[0], kf_time[t - 1],
                                       fusion_span)
            prob = batch_mod.build_problem(cfg, pw, qw, tw, gsub,
                                           anchor, yaw, station)
            pc, qc, _ = batch_mod.optimize_batch(
                cfg, prob, solver=cfg.estimator.batch_solver,
                robust=batch_mod.RobustOpts(dd_huber=1.0, epoch_gate=2.0,
                                            rel_huber=5.0))
            p_hist[s0:t] = np.asarray(pc)[:n]
            q_hist[s0:t] = np.asarray(qc)[:n]
    return p_hist, q_hist


def jax_tree_slice(tree, s, e):
    import jax as _jax
    return _jax.tree.map(lambda a: a[s:e], tree)


def run_pipeline(ep: Episode, cfg: GlioConfig = GlioConfig(),
                 out_dir: Optional[str] = None,
                 run_batch: Optional[bool] = None,
                 run_lc: Optional[bool] = None,
                 sw_chunk: int = 100,
                 backend_fusion_every: int = 0) -> PipelineResult:
    anchor = (np.asarray(ep.anchor_ecef) if ep.anchor_ecef is not None
              else np.asarray(cfg.initialization.anc_ecef))
    yaw = float(ep.yaw_enu_local if ep.yaw_enu_local is not None
                else cfg.initialization.yaw_enu_local)
    station = np.asarray(cfg.initialization.station_ecef)

    # --- stage 1: tightly-coupled sliding window -------------------------
    # Replayed in bounded chunks through the checkpoint/resume API (bit-
    # identical to one scan): a single multi-minute device execution can
    # trip the remote TPU worker's watchdog on long trajectories.
    inputs = ep.to_inputs()
    T = int(np.asarray(ep.kf_time).shape[0])
    if backend_fusion_every > 0 and ep.gnss is not None:
        p_sw, q_sw = replay_with_backend_fusion(
            cfg, ep, inputs, anchor, yaw, station,
            every=backend_fusion_every)
        return _finish_pipeline(ep, cfg, out_dir, run_batch, run_lc,
                                anchor, yaw, station, p_sw, q_sw)
    replay, _ = make_replay(cfg)
    acc0 = None if ep.acc0 is None else jnp.asarray(ep.acc0)
    gyr0 = None if ep.gyr0 is None else jnp.asarray(ep.gyr0)
    if T <= sw_chunk:
        out = replay(inputs, jnp.asarray(ep.p0), jnp.asarray(ep.q0),
                     jnp.asarray(ep.v0), acc0, gyr0)
        p_sw, q_sw = np.asarray(out.p), np.asarray(out.q)
    else:
        import jax as _jax
        carry = replay.make_initial_carry(
            jnp.asarray(ep.p0), jnp.asarray(ep.q0), jnp.asarray(ep.v0),
            acc0, gyr0, inputs_template=inputs)
        # Equal chunk sizes (last one padded by shrinking the first chunk
        # boundary) would need a second compile at most; just allow two
        # trace shapes: `sw_chunk` and the remainder.
        ps, qs = [], []
        for s in range(0, T, sw_chunk):
            part = _jax.tree.map(lambda a: a[s:s + sw_chunk], inputs)
            carry, out = replay.replay_from(carry, part)
            ps.append(np.asarray(out.p))
            qs.append(np.asarray(out.q))
        p_sw, q_sw = np.concatenate(ps), np.concatenate(qs)
    return _finish_pipeline(ep, cfg, out_dir, run_batch, run_lc,
                            anchor, yaw, station, p_sw, q_sw)


def apply_loop_closure(cfg: GlioConfig, ep: Episode, p_sw, q_sw):
    """Detect, ICP-verify and apply loop closures to the keyframe chain.

    Pipeline wiring of ``models.loop_closure`` (reference:
    ``loopClosureThread``, Estimator.cpp:5090-5273 — a 1 Hz thread; here
    one vectorized pass over the finished sliding-window trajectory).
    Returns (p, q, n_edges).
    """
    from .models import loop_closure as lc_mod

    est = cfg.estimator
    kf_time = np.asarray(ep.kf_time)
    cands = lc_mod.detect_loops(
        p_sw, kf_time, search_radius=est.lc_search_radius,
        time_thresh=est.lc_time_thres)
    if not cands:
        return p_sw, q_sw, 0
    w = max(est.lc_map_width // 2, 1)
    T = p_sw.shape[0]
    edges = []
    for c in cands:
        j0, j1 = max(c.old - w, 0), min(c.old + w + 1, T)
        p_c, q_c, fitness, ok = lc_mod.verify_loop(
            cfg, ep.scan[c.cur], ep.scan_valid[c.cur],
            ep.scan[j0:j1], ep.scan_valid[j0:j1],
            p_sw[j0:j1], q_sw[j0:j1], p_sw[c.cur], q_sw[c.cur])
        if not bool(ok):
            continue
        qo = jnp.asarray(q_sw[c.old])
        dq = quat.mul(quat.conj(qo), q_c)
        dp = quat.rotate(quat.conj(qo), p_c - jnp.asarray(p_sw[c.old]))
        edges.append((c.old, c.cur, np.asarray(dp), np.asarray(dq)))
    if not edges:
        return p_sw, q_sw, 0
    p, q = lc_mod.solve_with_loops(p_sw, q_sw, edges)
    return np.asarray(p), np.asarray(q), len(edges)


def _finish_pipeline(ep, cfg, out_dir, run_batch, run_lc,
                     anchor, yaw, station, p_sw, q_sw) -> PipelineResult:
    """Stages 2-3 + CSV output, shared by all stage-1 drivers."""
    res = PipelineResult(kf_time=np.asarray(ep.kf_time), p_sw=p_sw, q_sw=q_sw)

    # --- loop closure on the keyframe chain (before the global stages,
    # like the reference's loop graph feeding the downstream fusion) -----
    if cfg.estimator.loop_closure_on:
        p_sw, q_sw, n_edges = apply_loop_closure(cfg, ep, p_sw, q_sw)
        res.p_sw, res.q_sw = p_sw, q_sw
        res.n_loop_edges = n_edges

    # --- dense inter-keyframe interpolation (optimizeLocalGraph parity,
    # Estimator.cpp:4274-4558) — when the episode carries the 10 Hz
    # dense-frame odometry channel --------------------------------------
    if ep.dense_rel_dp is not None:
        from .models import local_graph
        max_dense = int(ep.dense_rel_dp.shape[1]) - 1
        p_d, q_d, d_valid = local_graph.interpolate_segments(
            jnp.asarray(p_sw), jnp.asarray(q_sw),
            jnp.asarray(ep.dense_rel_dp), jnp.asarray(ep.dense_rel_dq),
            jnp.asarray(ep.dense_rel_valid), max_dense=max_dense)
        res.p_dense = np.asarray(p_d)
        res.q_dense = np.asarray(q_d)
        res.dense_valid = np.asarray(d_valid)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            dv = res.dense_valid.reshape(-1)
            llh, ypr, enu = _georef(res.p_dense.reshape(-1, 3)[dv],
                                    res.q_dense.reshape(-1, 4)[dv],
                                    anchor, yaw)
            t_d = (np.asarray(ep.dense_time).reshape(-1)[dv]
                   if ep.dense_time is not None
                   else np.zeros(int(dv.sum())))
            traj.write_result_csv(os.path.join(out_dir, "dense_path.csv"),
                                  t_d, llh, ypr, enu)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        llh, ypr, enu = _georef(p_sw, q_sw, anchor, yaw)
        traj.write_result_csv(os.path.join(out_dir, "tc_sw_result.csv"),
                              res.kf_time, llh, ypr, enu)
        if cfg.estimator.save_pcd:
            # Map export parity (save_pcd + mapping_interval,
            # Estimator.cpp:5324-5349).
            from .eval import pointcloud
            world, valid = pointcloud.assemble_map(
                ep.scan, ep.scan_valid, p_sw, q_sw,
                every=max(cfg.estimator.mapping_interval, 1),
                ql2b=cfg.estimator.ql2b, tl2b=cfg.estimator.tl2b)
            pointcloud.write_pcd(os.path.join(out_dir, "map.pcd"),
                                 world, valid)

    have_gnss = ep.gnss is not None
    if run_batch is None:
        run_batch = have_gnss and cfg.estimator.enable_batch_fusion
    if run_lc is None:
        run_lc = have_gnss

    # --- stage 2: batch fusion ------------------------------------------
    if run_batch:
        prob = batch_mod.build_problem(
            cfg, p_sw, q_sw, res.kf_time, ep.gnss, anchor, yaw, station)
        if cfg.estimator.sms_fusion_level == 1:
            # Reference level-1 (Estimator.cpp:2990-3077): binary plane
            # constraints + IMU chains over 15-dof states.
            sms = batch_mod.build_sms1(cfg, ep.scan, ep.scan_valid,
                                       p_sw, q_sw)
            chain = batch_mod.build_imu_chain(
                cfg, ep.imu_acc, ep.imu_gyr, ep.imu_dt, ep.imu_valid)
            p_b, q_b, _, _, _, _ = batch_mod.optimize_batch_sms1_imu(
                cfg, prob, sms, chain)
        else:
            p_b, q_b, _ = batch_mod.optimize_batch(cfg, prob, solver=cfg.estimator.batch_solver)
        res.p_batch = np.asarray(p_b)
        res.q_batch = np.asarray(q_b)
        # Per-keyframe marginal covariance of the batch solution (banded
        # selected inversion) — the uncertainty the reference never
        # publishes alongside its poses.
        res.cov_batch = np.asarray(batch_mod.batch_marginal_covariance(
            cfg, prob, p_b, q_b))
        synth = bool(np.asarray(getattr(
            ep.gnss, "station_synthesized", False) or False))
        cov_cal, cal_rep = batch_mod.calibrate_batch_covariance(
            cfg, prob, p_b, q_b, res.cov_batch,
            # Synthesized base ⇒ the DD evidence shares the rover's
            # unmodeled atmosphere; 5 m ≈ the measured Whampoa
            # golden-batch vertical gap (batch.py docstring step 4).
            atm_floor_z=5.0 if synth else 0.0)
        res.cov_batch_cal = np.asarray(cov_cal)
        if out_dir:
            llh, ypr, enu = _georef(res.p_batch, res.q_batch, anchor, yaw)
            traj.write_result_csv(
                os.path.join(out_dir, "tc_batch_result.csv"),
                res.kf_time, llh, ypr, enu)
            std_cal = np.sqrt(np.maximum(np.diagonal(
                res.cov_batch_cal, axis1=1, axis2=2), 0.0))
            std_frm = np.sqrt(np.maximum(np.diagonal(
                res.cov_batch, axis1=1, axis2=2), 0.0))
            with open(os.path.join(out_dir, "tc_batch_cov.csv"), "w") as f:
                f.write(
                    "# std_p*: CALIBRATED translation stds (m): formal "
                    "information-matrix marginal + the global GNSS-"
                    "evidence offset + the consistency-attenuated "
                    "windowed departure in quadrature (+ a vertical "
                    "atmosphere floor when the base station was "
                    "synthesized). Sim-validated ~1-2 sigma coverage "
                    "(tests/test_batch_cov.py); real-problem per-axis "
                    "p90 |err|/std <= 1.9 (README). formal_p* are the "
                    "raw information-matrix marginals: they model the "
                    "assumed white measurement noise ONLY and are "
                    "10-100x optimistic under NLOS/atmosphere bias — "
                    "do not gate on them.\n"
                    f"# calibration: {'applied' if cal_rep['calibrated'] else 'SKIPPED (too little GNSS)'}"
                    f", n_epochs={cal_rep['n_epochs']}\n")
                f.write("time,std_px,std_py,std_pz,"
                        "std_rx,std_ry,std_rz,"
                        "formal_px,formal_py,formal_pz\n")
                np.savetxt(f, np.column_stack(
                    [res.kf_time, std_cal, std_frm[:, :3]]),
                    delimiter=",")

    # --- stage 3: loosely-coupled fusion --------------------------------
    if run_lc:
        g = ep.gnss
        fixes, covs, oks, _ = rtk.solve_epochs_dd(
            jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov),
            jnp.asarray(g.psr_sta), jnp.asarray(g.valid),
            jnp.asarray(g.system, jnp.int32), jnp.asarray(g.master),
            jnp.asarray(station), jnp.asarray(g.elevation),
            jnp.asarray(g.snr), jnp.asarray(anchor),
            huber=cfg.estimator.rtk_fix_huber,
            trim=cfg.estimator.rtk_fix_trim)
        fixes = np.asarray(fixes)
        sig = np.sqrt(np.maximum(
            np.trace(np.asarray(covs), axis1=1, axis2=2) / 3.0, 1e-6))
        okn = np.asarray(oks) & (sig < cfg.estimator.gnss_cov_threshold)
        # Map epoch fixes onto keyframes by nearest time.
        ia, ib = traj.associate(res.kf_time, g.time, max_dt=0.2)
        gnss_p = np.zeros_like(p_sw)
        gnss_valid = np.zeros(p_sw.shape[0], bool)
        gnss_sigma = np.ones(p_sw.shape[0])
        enu_fix = np.asarray(C.ecef2enu(jnp.asarray(fixes),
                                        jnp.asarray(anchor)))
        sy, cy = np.sin(yaw), np.cos(yaw)
        RzT = np.array([[cy, sy, 0], [-sy, cy, 0], [0, 0, 1.0]])
        for a, b in zip(ia, ib):
            if okn[b]:
                gnss_p[a] = enu_fix[b] @ RzT.T
                gnss_valid[a] = True
                gnss_sigma[a] = sig[b]
        prob = lc_fusion.build_problem(p_sw, q_sw, gnss_p, gnss_valid,
                                       gnss_sigma)
        p_l, q_l, _ = lc_fusion.solve(
            prob, jnp.asarray(p_sw), jnp.asarray(q_sw))
        res.p_lc = np.asarray(p_l)
        res.q_lc = np.asarray(q_l)
        if out_dir:
            llh, ypr, enu = _georef(res.p_lc, res.q_lc, anchor, yaw)
            traj.write_result_csv(os.path.join(out_dir, "lc_result.csv"),
                                  res.kf_time, llh, ypr, enu)

    return res
