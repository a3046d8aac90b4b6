"""Level-1 batch (binary-plane + IMU chains) at scale: perf + accuracy.

VERDICT r2 weak #5: level-1 had no number beyond T~40 tests. Real
Whampoa has no scan data (bag not redistributed), so this benchmarks a
real-scale SIMULATED episode: T keyframes with 1024-pt scans, noisy
odometry init, GNSS DD epochs — association (build_sms1) + the 15-dof
level-1 solve, timed on the available accelerator, accuracy vs ground
truth and vs the level-0 solve from the same init.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np


def main(T=256):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from glio_tpu.config import GlioConfig
    from glio_tpu.data.simulator import simulate_episode, simulate_gnss_epochs
    from glio_tpu.models import batch as B
    from glio_tpu.utils import quat

    cfg = GlioConfig()
    ANCHOR = np.asarray(cfg.initialization.anc_ecef)
    STATION = np.asarray(cfg.initialization.station_ecef)
    ep = simulate_episode(n_keyframes=T, scan_points=1024, seed=7)
    ep.gnss = simulate_gnss_epochs(ep.gt_p, ep.kf_time, ANCHOR, STATION,
                                   psr_noise=0.5, epoch_stride=1, seed=7)
    rng = np.random.default_rng(7)
    # Odometry init: smooth drift + noise (what the SW hands the batch).
    drift = np.cumsum(rng.normal(0, 0.05, (T, 3)), axis=0)
    p_odo = ep.gt_p + drift + 0.05 * rng.normal(size=(T, 3))
    q_odo = np.asarray(ep.gt_q)
    prob = B.build_problem(cfg, p_odo, q_odo, ep.kf_time, ep.gnss,
                           ANCHOR, 0.0, STATION)

    t0 = time.time()
    sms = B.build_sms1(cfg, ep.scan, ep.scan_valid, p_odo, q_odo)
    assoc_s = time.time() - t0

    chain = B.build_imu_chain(cfg, ep.imu_acc, ep.imu_gyr, ep.imu_dt,
                              ep.imu_valid)

    def err(p):
        return float(np.sqrt((np.linalg.norm(
            np.asarray(p) - ep.gt_p, axis=-1) ** 2).mean()))

    p0l, _, _ = B.optimize_batch(cfg, prob, lm_iters=6)
    # Warm-up + timed level-1 (full 15-dof states).
    out = B.optimize_batch_sms1_imu(cfg, prob, sms, chain, lm_iters=6)
    jax.block_until_ready(out[0])
    t0 = time.time()
    p1, q1, v1, ba1, bg1, costs = B.optimize_batch_sms1_imu(
        cfg, prob, sms, chain, lm_iters=6)
    jax.block_until_ready(p1)
    solve_s = time.time() - t0
    print(json.dumps({
        "T": T, "assoc_s": round(assoc_s, 1),
        "sms1_imu_solve_s_4stage": round(solve_s, 2),
        "rmse_init_m": round(err(p_odo), 3),
        "rmse_level0_m": round(err(p0l), 3),
        "rmse_level1_imu_m": round(err(p1), 3)}))


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
