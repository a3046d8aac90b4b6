"""Level-1 batch (15-dof IMU-chain + binary-plane) at production scale.

VERDICT r2 weak #5: level-1 worked in tests at T~40 but had no published
perf/parity number at real scale. The real Whampoa leg cannot exercise it
(the rosbag with raw IMU/scan streams is not redistributed — only the
golden CSVs and RINEX are), so this measures a T=2048 SIMULATED episode:
the banded structure, block sizes (15x15, bandwidth search_range+1) and
row counts match the production problem exactly.

Run on the real chip from the repo root: ``python scripts/bench_sms1_tpu.py``
(add ``JAX_PLATFORMS=cpu`` for the CPU twin number).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax

if _os.environ.get("GLIO_CPU"):
    # Pin BEFORE first backend use — the env var alone is too late once
    # the axon plugin registers (CLAUDE.md gotcha).
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from glio_tpu.config import GlioConfig
from glio_tpu.data.simulator import simulate_episode, simulate_gnss_epochs
from glio_tpu.models import batch as B

ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.92, 5386768.987, 2407460.031])

T = int(_os.environ.get("T", 2048))
LM_ITERS = 10

cfg = GlioConfig().replace(
    estimator=GlioConfig().estimator.__class__(sms_fusion_level=1))

t0 = time.time()
ep = simulate_episode(n_keyframes=T, scan_points=512, seed=9,
                      scan_noise=0.01, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0))
gnss = simulate_gnss_epochs(ep.gt_p, ep.kf_time, ANCHOR, STATION,
                            psr_noise=0.5, seed=9)
rng = np.random.default_rng(9)
p_odo = ep.gt_p + np.cumsum(
    0.15 * rng.normal(size=ep.gt_p.shape), axis=0)  # random-walk drift
prob = B.build_problem(cfg, p_odo, ep.gt_q, ep.kf_time, gnss,
                       ANCHOR, 0.0, STATION, despike=False)
sms = B.build_sms1(cfg, ep.scan, ep.scan_valid, ep.gt_p, ep.gt_q, chunk=64)
chain = B.build_imu_chain(cfg, ep.imu_acc, ep.imu_gyr, ep.imu_dt,
                          ep.imu_valid)
print(f"built T={T} problem in {time.time()-t0:.1f}s "
      f"(pair rows valid {int(np.asarray(sms.mask).sum())}, "
      f"chain valid {int(np.asarray(chain.valid).sum())})", flush=True)

# Warm-up compile of one stage, then time one annealed stage strictly.
t0 = time.time()
p1, q1, v1, ba1, bg1, costs = B.optimize_batch_sms1_imu(
    cfg, prob, sms, chain, v0=ep.gt_v, thresholds=(1e9, 10.0),
    lm_iters=LM_ITERS)
jax.block_until_ready(p1)
print(f"2-stage compile+run {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
p1, q1, v1, ba1, bg1, costs = B.optimize_batch_sms1_imu(
    cfg, prob, sms, chain, v0=ep.gt_v, thresholds=(1e9, 10.0),
    lm_iters=LM_ITERS)
jax.block_until_ready(p1)
dt = time.time() - t0
e0 = np.linalg.norm(p_odo - ep.gt_p, axis=-1)
e1 = np.linalg.norm(np.asarray(p1) - ep.gt_p, axis=-1)
print(f"level-1 2 stages ({LM_ITERS} LM iters each, T={T}): {dt:.2f} s "
      f"({dt/(2*LM_ITERS)*1e3:.0f} ms/iter)")
print(f"odometry err mean {e0.mean():.2f} m -> level-1 {e1.mean():.2f} m "
      f"(max {e1.max():.2f})")
assert np.isfinite(np.asarray(p1)).all()
assert costs[-1] <= costs[0]
