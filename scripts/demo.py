"""End-to-end demo: simulated GNSS/LiDAR/IMU episode → all three result
CSVs (the full reference pipeline equivalent in one call)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
from glio_tpu.data.simulator import simulate_episode, simulate_gnss_epochs
from glio_tpu.pipeline import run_pipeline

out_dir = sys.argv[1] if len(sys.argv) > 1 else "results"
cfg = GlioConfig().replace(
    shapes=ShapeConfig(max_imu_per_interval=40, scan_points=512,
                       map_points=8192),
    estimator=EstimatorConfig(local_map_width=10, sw_max_iter=8),
)
ep = simulate_episode(n_keyframes=60, scan_points=512, seed=0)
ep.gnss = simulate_gnss_epochs(
    ep.gt_p, ep.kf_time, np.asarray(cfg.initialization.anc_ecef),
    np.asarray(cfg.initialization.station_ecef), psr_noise=0.5, seed=0)
res = run_pipeline(ep, cfg, out_dir=out_dir)
for name, p in [("sw", res.p_sw), ("batch", res.p_batch), ("lc", res.p_lc)]:
    if p is None:
        continue
    e = np.linalg.norm(p - ep.gt_p, axis=-1)
    print(f"{name:6s} ATE rmse {np.sqrt((e**2).mean()):.3f} m  "
          f"max {e.max():.3f} m")
print(f"CSVs written to {out_dir}/")
