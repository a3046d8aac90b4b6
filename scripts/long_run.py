"""Scale/stability validation: long simulated episode through the full
pipeline on the available accelerator (TPU when present)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
import sys
import time

import numpy as np

from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
from glio_tpu.data.episode import Episode
from glio_tpu.data.simulator import simulate_episode, simulate_gnss_epochs
from glio_tpu.pipeline import run_pipeline

n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 600
# Default: DD-only window GNSS. Measured A/B on the 300-kf stress
# episode: 24.2 m rmse with Doppler vs 14.9 m without. A controlled
# 100-kf run WITHOUT backend fusion shows both configs equally
# divergence-dominated (±5%), so this is regime sensitivity — in
# recovery-transient-dominated missions the extra Doppler rows shift
# the divergence/recovery dynamics rather than systematically helping;
# on short well-tracked windows they measurably improve velocity
# (tests/test_sliding_window_e2e.py). Pass "dopp" to enable.
use_dopp = "dopp" in sys.argv[2:]
cfg = GlioConfig().replace(
    shapes=ShapeConfig(max_imu_per_interval=40, scan_points=1024,
                       map_points=16384),
    # GNSS joins the window: over hundreds of keyframes pure-LIO drift
    # eventually exceeds the association radius, after which the IMU
    # random-walks unbounded — the DD factors keep the window anchored.
    estimator=EstimatorConfig(local_map_width=20, sw_max_iter=15,
                              gnss_in_sliding_window=True,
                              doppler_in_window=use_dopp,
                              batch_solver="chol_pcg"),
)
print(f"doppler_in_window={use_dopp}", flush=True)
cache = f"/tmp/long_run_ep_{n_kf}.npz"
if os.path.exists(cache):
    print(f"loading cached episode {cache}...", flush=True)
    ep = Episode.load(cache)
else:
    print(f"simulating {n_kf} keyframes...", flush=True)
    ep = simulate_episode(n_keyframes=n_kf, scan_points=1024, seed=3)
    ep.gnss = simulate_gnss_epochs(
        ep.gt_p, ep.kf_time, np.asarray(cfg.initialization.anc_ecef),
        np.asarray(cfg.initialization.station_ecef), psr_noise=0.5,
        epoch_stride=1, seed=3)
    ep.save(cache)
    print(f"episode cached to {cache}", flush=True)
t0 = time.time()
# backendFusionThread parity: batch-correct the trailing segment every 10
# keyframes and feed the corrected poses back into the window's local map.
res = run_pipeline(ep, cfg, out_dir="/tmp/long_run", backend_fusion_every=10)
dt = time.time() - t0
L = np.sum(np.linalg.norm(np.diff(ep.gt_p, axis=0), axis=-1))
print(f"pipeline done in {dt:.0f}s for {n_kf} kf over {L:.0f} m", flush=True)
for name, p in [("sw", res.p_sw), ("batch", res.p_batch), ("lc", res.p_lc)]:
    if p is None:
        continue
    e = np.linalg.norm(p - ep.gt_p, axis=-1)
    print(f"{name:6s} ATE rmse {np.sqrt((e**2).mean()):.3f} m  "
          f"max {e.max():.3f} m  ({100*e.max()/L:.2f}% of path)", flush=True)
