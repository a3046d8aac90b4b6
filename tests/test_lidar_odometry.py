"""Frontend LiDAR odometry on simulated scans."""

import jax.numpy as jnp
import numpy as np

from glio_tpu.config import GlioConfig, LidarOdometryConfig, ShapeConfig
from glio_tpu.data.simulator import simulate_episode
from glio_tpu.models.lidar_odometry import make_odometry

CFG = GlioConfig().replace(
    shapes=ShapeConfig(scan_points=512),
    lidar_odometry=LidarOdometryConfig(local_map_frames=8, max_num_iter=8),
)


def test_odometry_tracks_simulated_motion():
    # Body-frame scans (identity extrinsic) with known poses.
    ep = simulate_episode(n_keyframes=12, scan_points=512, seed=7,
                          scan_noise=0.01, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0))
    run = make_odometry(CFG)
    out = run(jnp.asarray(ep.scan), jnp.asarray(ep.scan_valid),
              ep.gt_p[0], ep.gt_q[0])
    p = np.asarray(out.p)
    err = np.linalg.norm(p - ep.gt_p, axis=-1)
    # Pure frame-to-map odometry at 3 Hz keyframe spacing (~1.7 m hops with
    # a constant-motion prior): decimetre-level tracking expected.
    assert err.max() < 1.0, err
    assert int(np.asarray(out.n_matches)[-1]) > 100
    assert bool(np.asarray(out.is_keyframe)[0])


def test_odometry_relative_consistency():
    ep = simulate_episode(n_keyframes=8, scan_points=512, seed=8,
                          scan_noise=0.01, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0))
    run = make_odometry(CFG)
    out = run(jnp.asarray(ep.scan), jnp.asarray(ep.scan_valid),
              ep.gt_p[0], ep.gt_q[0])
    # Compose relative outputs; must reproduce the absolute outputs.
    from glio_tpu.utils import quat
    p = np.asarray(out.p)
    q = np.asarray(out.q)
    pc = ep.gt_p[0].copy()
    qc = ep.gt_q[0].copy()
    for k in range(1, p.shape[0]):
        pc = pc + np.asarray(quat.rotate(jnp.asarray(qc),
                                         jnp.asarray(out.rel_p[k])))
        qc = np.asarray(quat.mul(jnp.asarray(qc), jnp.asarray(out.rel_q[k])))
        np.testing.assert_allclose(pc, p[k], atol=1e-8)
