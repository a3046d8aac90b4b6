"""In-scan ablation of the window step's fixed cost (isolated process).

Usage: python scripts/ablate_window.py VARIANT
Variants toggle one piece of the step and time the full replay at
sw_max_iter=1; the delta vs 'base' attributes the in-compiled-scan cost
(standalone piece timings are dispatch-dominated on the remote backend
and misattribute — measured round 4).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
from glio_tpu.data.simulator import simulate_episode
from glio_tpu.models.sliding_window import make_replay

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
T = 30

kw = dict(local_map_width=int(os.environ.get("GLIO_ABLATE_WIDTH", "20")),
          sw_max_iter=1)
shapes = dict(max_imu_per_interval=40, scan_points=1024, map_points=16384)
if variant in ("nomarg", "skeleton"):
    kw["enable_marginalization"] = False
elif variant == "map5":
    kw["local_map_width"] = 5
elif variant == "imu8":
    shapes["max_imu_per_interval"] = 8
elif variant == "iter15":
    kw["sw_max_iter"] = 15
elif variant == "scan256":
    shapes["scan_points"] = 256

if variant in ("nosolve", "skeleton"):
    # Bypass the LM solve entirely (return the IMU prediction): isolates
    # everything OUTSIDE dense.lm_solve.
    import jax.numpy as jnp
    from glio_tpu.solver import dense as _dense

    def _fake_lm(residual_fn, retract_fn, x0, n, **kwargs):
        c = jnp.asarray(0.0)
        return _dense.LMResult(x=x0, cost=c, initial_cost=c, lam=c, iters=c)

    _dense.lm_solve = _fake_lm
    import glio_tpu.models.sliding_window as _sw
    _sw.dense.lm_solve = _fake_lm

if variant in ("noassoc", "skeleton"):
    # Bypass association (kNN + plane fits + top-k): zero lidar factors.
    import jax.numpy as jnp
    import glio_tpu.models.sliding_window as _sw

    def _fake_assoc(cfg_, window, window_scans, window_scan_valid,
                    map_points, map_valid):
        K = window.p.shape[0]
        F = min(cfg_.feature_selection.feature_res_num,
                cfg_.shapes.scan_points)
        return (jnp.zeros((K, F, 3)), jnp.zeros((K, F, 3)),
                jnp.zeros((K, F)), jnp.zeros((K, F)),
                jnp.zeros((K, F), bool))

    _sw._associate = _fake_assoc

cfg = GlioConfig().replace(shapes=ShapeConfig(**shapes),
                           estimator=EstimatorConfig(**kw))
sp = shapes["scan_points"]
ep = simulate_episode(n_keyframes=T, scan_points=sp, seed=0)
replay, _ = make_replay(cfg)
args = (ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
out = replay(*args)
out.p.block_until_ready()
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = replay(*args)
    out.p.block_until_ready()
    best = min(best, 1e3 * (time.perf_counter() - t0) / T)
print(f"{variant}: {best:.3f} ms/kf")
