"""Window-only TPU timing (the bench.py headline, without the batch legs).

Measures ms/keyframe at 15 and 1 LM iterations to split per-iteration vs
fixed cost — the VERDICT r3 item-7 breakdown — on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import bench
from glio_tpu.data.simulator import simulate_episode

T = 30
ep = simulate_episode(n_keyframes=T, scan_points=1024, seed=0)
_, replay = bench._build(sw_max_iter=15)
ms15 = bench._time_replay(replay, ep, T)
_, replay1 = bench._build(sw_max_iter=1)
ms1 = bench._time_replay(replay1, ep, T)
lm = max(ms15 - ms1, 0.0) / 14.0
print(f"ms/kf(15 iters)={ms15:.3f}  ms/kf(1 iter)={ms1:.3f}  "
      f"lm_iter_ms={lm:.3f}  fixed_ms={max(ms1 - lm, 0.0):.3f}")
