"""glio_tpu — a TPU-native GNSS/LiDAR/IMU estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
XikunLiu-huskit/GLIO (tightly-coupled GNSS/LiDAR/IMU fusion via
sliding-window and batch factor-graph optimization).  See SURVEY.md at the
repo root for the structural analysis of the reference this framework
reproduces, and BASELINE.md for accuracy/perf targets.

Design notes
------------
* All bulk point-cloud math runs in float32 (TPU-native); the small
  per-window solver math, GNSS geometry, and IMU preintegration run in
  float64 (XLA-emulated on TPU, negligible at these sizes, exact enough for
  pseudorange-scale magnitudes).
* Everything on the device path is jit-compatible: fixed shapes, masked
  validity, `lax.scan`/`lax.while_loop` control flow.
* Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with XLA
  collectives over ICI (time-axis sharding of the batch factor graph).
"""

import jax as _jax

# The estimation stack needs f64 for GNSS geometry (pseudoranges are ~2.6e7 m;
# f32 ulp there is ~2.6 m) and for well-conditioned normal equations.  Bulk
# kernels opt in to f32 explicitly.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
