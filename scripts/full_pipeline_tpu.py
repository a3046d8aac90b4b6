"""Full-pipeline wall-clock on one chip (VERDICT r4 #10).

The reference runs FOUR ROS processes (Preprocessing, LidarOdometry,
Estimator, gnss_preprocessor) streaming over TCPROS. This script runs
the whole chain — raw 32×1800 range images → preprocessing → scan-to-map
odometry → sliding-window fusion → 4-stage annealed batch → LC pose
graph — in ONE deterministic process at production shapes, and reports
per-stage and total wall-clock against the mission duration.

Mission: 60 keyframes at 3.33 Hz (18 s), scans at 10 Hz (181 frames,
exactly 3 frames/keyframe so keyframes ARE scan frames), HDL-32E
geometry, 2048 surf points, 20-frame odometry map, 50-keyframe window
map (the reference's production config). GNSS epochs at keyframe rate.

Host raycasting of the 181 input frames is cached to /tmp (it is
dataset preparation, not pipeline work). Timings are steady-state
(second call; the XLA compile cache makes first calls cheap across
runs). Run on the axon backend:  python scripts/full_pipeline_tpu.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time

import numpy as np

T_KF = 60
KF_DT = 0.3                   # exactly 3 frames/keyframe at 10 Hz
FPK = 3
RINGS, COLS = 32, 1800
SURF = 2048
CACHE = f"/tmp/fullpipe_scans_{T_KF}_{RINGS}x{COLS}_v4.npz"


def build_mission():
    """Episode + 10 Hz raw range images along its exact trajectory."""
    from glio_tpu.data.simulator import (simulate_episode,
                                         simulate_gnss_epochs, raycast_scan)
    from glio_tpu.config import GlioConfig

    cfg0 = GlioConfig()
    # circle_omega: a flat closed drive — the default smooth-profile
    # trajectory integrates to z=−9 m by 18 s, UNDER the world's ground
    # plane, leaving the raycast frames with single-plane degenerate
    # content (measured: window drifts 12 m on them).
    ep, dense = simulate_episode(
        n_keyframes=T_KF, kf_dt=KF_DT, scan_points=SURF, seed=8,
        scan_noise=0.01, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0),
        circle_omega=0.12, return_dense_gt=True)
    ep.gnss = simulate_gnss_epochs(
        ep.gt_p, ep.kf_time, np.asarray(cfg0.initialization.anc_ecef),
        np.asarray(cfg0.initialization.station_ecef), psr_noise=0.5, seed=0)
    n_frames = (T_KF - 1) * FPK + 1
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return ep, z["imgs"], z["vals"]
    # 10 Hz frame poses = every (imu_rate*KF_DT/FPK) ground-truth samples.
    step = int(round(100.0 * KF_DT / FPK))
    # Raycast against a RICH wall world along the same trajectory: the
    # episode's internal sample_scan world is a tight (~7 m) cocoon of
    # small patches — only ~700 voxels of surf content per frame, too
    # sparse for the frontend (measured: window drifts metres on it).
    from glio_tpu.data.simulator import corridor_world
    world = corridor_world(dense["p"][::step], n_walls=400, seed=8)
    imgs = np.zeros((n_frames, RINGS, COLS, 3), np.float32)
    vals = np.zeros((n_frames, RINGS, COLS), bool)
    rng = np.random.default_rng(12)
    from glio_tpu.data.simulator import _quat_rotmat
    for f in range(n_frames):
        j = f * step
        imgs[f], vals[f] = raycast_scan(
            world, dense["p"][j], _quat_rotmat(dense["q"][j]),
            n_rings=RINGS, n_cols=COLS, elev_lo=-0.535, elev_hi=0.186,
            max_range=80.0, rng=rng)
        if f % 30 == 0:
            print(f"  raycast {f}/{n_frames}", flush=True)
    np.savez_compressed(CACHE, imgs=imgs, vals=vals)
    return ep, imgs, vals


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
    from glio_tpu.models.preprocessing import make_preprocessor
    from glio_tpu.models.lidar_odometry import make_odometry
    from glio_tpu.models.sliding_window import make_replay
    from glio_tpu.models import batch as B, lc_fusion

    ep, imgs, vals = build_mission()
    n_frames = imgs.shape[0]
    mission_s = (T_KF - 1) * KF_DT
    import dataclasses
    cfg0 = GlioConfig()
    cfg = cfg0.replace(
        shapes=ShapeConfig(max_imu_per_interval=40, scan_points=SURF,
                           map_points=16384),
        estimator=EstimatorConfig(local_map_width=50, sw_max_iter=15),
        # Diverse selection + 300 plane factors per keyframe: these
        # frames are ground-dominated (global top-by-weight picks ~100%
        # ground, leaving xy/yaw soft), and the residual per-fit noise
        # averages down as 1/sqrt(F) (measured T=60 window drift:
        # 19.6 m global@100 / 3.75 m diverse@100 / 2.29 m @300 /
        # 0.57 m @1000; the reference's 100 was a single-thread-Ceres
        # budget compromise).
        feature_selection=dataclasses.replace(
            cfg0.feature_selection, feature_res_num=300,
            diverse_select=True))
    timings = {}

    def timed(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]} s", flush=True)
        return out

    # Stage 1: preprocessing, 181 frames of 32x1800 -> 2048-pt surf.
    process = make_preprocessor(cfg, surf_out=SURF)
    imgs_j, vals_j = jnp.asarray(imgs), jnp.asarray(vals)

    @jax.jit
    def preprocess_all(im, va):
        def body(_, inp):
            o = process(inp[0], inp[1])
            return 0, (o.surf, o.surf_valid)
        _, (surf, sv) = jax.lax.scan(body, 0, (im, va))
        return surf, sv

    surf, surf_valid = timed("preprocess", lambda: preprocess_all(imgs_j, vals_j))

    # Stage 2: scan-to-map odometry over all 10 Hz frames.
    odo = make_odometry(cfg)
    odo_out = timed("odometry", lambda: odo(surf, surf_valid,
                                            ep.gt_p[0], ep.gt_q[0]))

    # Stage 3: sliding-window fusion on the keyframe frames (every 3rd
    # preprocessed cloud IS the keyframe scan).
    kf_frames = np.arange(0, n_frames, FPK)
    ep.scan = np.asarray(surf)[kf_frames]
    ep.scan_valid = np.asarray(surf_valid)[kf_frames]
    replay, _ = make_replay(cfg)
    args = (ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
    sw_out = timed("window", lambda: replay(*args))
    p_sw = np.asarray(sw_out.p)
    q_sw = np.asarray(sw_out.q)

    # Stage 4: 4-stage annealed robust batch over the SW trajectory.
    anchor = np.asarray(cfg.initialization.anc_ecef)
    station = np.asarray(cfg.initialization.station_ecef)
    prob = B.build_problem(cfg, p_sw, q_sw, ep.kf_time, ep.gnss,
                           anchor, 0.0, station)
    rob = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)
    pb, qb, _ = timed("batch", lambda: B.optimize_batch(
        cfg, prob, thresholds=(1e9, 10.0, 8.0, 6.0), lm_iters=10,
        robust=rob))

    # Stage 5: LC pose graph (GPSFactor-style). LC consumes per-keyframe
    # GNSS positions — simulated fixes (gt + noise), the same wiring the
    # pipeline's LC path uses on simulations.
    rng = np.random.default_rng(5)
    gp = ep.gt_p + 0.8 * rng.normal(size=ep.gt_p.shape)
    gv = np.ones(T_KF, bool)
    gs = np.full(T_KF, 0.8)
    lcprob = lc_fusion.build_problem(p_sw, q_sw, gp, gv, gs,
                                     min_spacing_m=5.0)
    p_lc = timed("lc", lambda: lc_fusion.solve(
        lcprob, jnp.asarray(p_sw), jnp.asarray(q_sw), gn_iters=8,
        pcg_iters=200)[0])

    total = sum(timings.values())
    err_sw = np.linalg.norm(p_sw - ep.gt_p, axis=-1)
    err_b = np.linalg.norm(np.asarray(pb) - ep.gt_p, axis=-1)
    out = {"stages_s": timings, "total_s": round(total, 3),
           "mission_s": mission_s,
           "realtime_factor": round(total / mission_s, 4),
           "frames": int(n_frames), "keyframes": T_KF,
           "sw_ate_max_m": round(float(err_sw.max()), 3),
           "batch_ate_max_m": round(float(err_b.max()), 3),
           "odo_track_err_max_m": round(float(np.linalg.norm(
               np.asarray(odo_out.p)[kf_frames] - ep.gt_p, axis=-1).max()), 3),
           "backend": jax.default_backend()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
