"""End-to-end sliding-window estimator tests on simulated episodes.

The reference validates only by full-bag replay + visual inspection
(SURVEY.md §4); here the replay itself is the test, with exact ground truth
from the integrator-consistent simulator.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glio_tpu.config import GlioConfig, ShapeConfig, EstimatorConfig
from glio_tpu.data.simulator import simulate_episode
from glio_tpu.models.sliding_window import make_replay

pytestmark = [pytest.mark.slow]  # heavy tier (see pyproject)

CFG = GlioConfig().replace(
    shapes=ShapeConfig(max_imu_per_interval=40, scan_points=512,
                       map_points=4096),
    estimator=EstimatorConfig(local_map_width=8, sw_max_iter=8),
)


@pytest.fixture(scope="module")
def replay_fn():
    return make_replay(CFG)[0]


def _run(replay, ep):
    out = replay(ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
    return np.asarray(out.p), out


def test_imu_only_noise_free_is_exact(replay_fn):
    """Integrator consistency: pure IMU propagation reproduces truth."""
    ep = simulate_episode(n_keyframes=8, scan_points=512, seed=3,
                          imu_noise=False, accel_bias=(0, 0, 0),
                          gyro_bias=(0, 0, 0))
    ep.scan_valid[:] = False
    p, _ = _run(replay_fn, ep)
    err = np.linalg.norm(p - ep.gt_p, axis=-1)
    assert err.max() < 1e-9


def test_perfect_data_stays_bounded(replay_fn):
    ep = simulate_episode(n_keyframes=12, scan_points=512, seed=3,
                          imu_noise=False, accel_bias=(0, 0, 0),
                          gyro_bias=(0, 0, 0), scan_noise=0.0)
    p, out = _run(replay_fn, ep)
    err = np.linalg.norm(p - ep.gt_p, axis=-1)
    assert err.max() < 0.1, err
    # Lidar association must actually engage.
    assert int(np.asarray(out.n_lidar_factors)[-1]) > 50


def test_noisy_biased_tracks(replay_fn):
    ep = simulate_episode(n_keyframes=15, scan_points=512, seed=4)
    p, out = _run(replay_fn, ep)
    err = np.linalg.norm(p - ep.gt_p, axis=-1)
    # Odometric drift bound: well under 2% of ~25 m path at this length.
    assert err.max() < 1.0, err


def test_replay_is_deterministic(replay_fn):
    ep = simulate_episode(n_keyframes=8, scan_points=512, seed=5)
    p1, _ = _run(replay_fn, ep)
    p2, _ = _run(replay_fn, ep)
    np.testing.assert_array_equal(p1, p2)


def test_episode_save_load_roundtrip(tmp_path):
    ep = simulate_episode(n_keyframes=6, scan_points=128, seed=6)
    path = str(tmp_path / "ep.npz")
    ep.save(path)
    from glio_tpu.data.episode import Episode
    ep2 = Episode.load(path)
    np.testing.assert_array_equal(ep2.scan, ep.scan)
    np.testing.assert_array_equal(ep2.imu_acc, ep.imu_acc)
    np.testing.assert_array_equal(ep2.gt_p, ep.gt_p)


def test_gnss_in_window_bounds_drift():
    """The optional GNSS-in-window factors (the reference's compiled-out
    `#if 0` path) bound absolute drift in the sliding window."""
    from glio_tpu.data.simulator import simulate_gnss_epochs

    cfg_on = CFG.replace(estimator=CFG.estimator.__class__(
        local_map_width=8, sw_max_iter=8, gnss_in_sliding_window=True))
    ep = simulate_episode(n_keyframes=25, scan_points=512, seed=12)
    anchor = np.asarray(cfg_on.initialization.anc_ecef)
    station = np.asarray(cfg_on.initialization.station_ecef)
    ep.gnss = simulate_gnss_epochs(ep.gt_p, ep.kf_time, anchor, station,
                                   psr_noise=0.3, epoch_stride=1, seed=12)
    replay_on, _ = make_replay(cfg_on)
    out = replay_on(ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
    err_on = np.linalg.norm(np.asarray(out.p) - ep.gt_p, axis=-1)

    replay_off, _ = make_replay(CFG)
    out_off = replay_off(ep.to_inputs(), ep.p0, ep.q0, ep.v0,
                         ep.acc0, ep.gyr0)
    err_off = np.linalg.norm(np.asarray(out_off.p) - ep.gt_p, axis=-1)

    # The DD rows must actually engage (guards against the factors being
    # silently dropped from the residual, which `max(1.5, ...)` alone
    # would not catch).
    assert not np.array_equal(np.asarray(out.p), np.asarray(out_off.p))
    # GNSS keeps the tail bounded near DD accuracy.
    assert err_on[-5:].mean() < max(1.5, 0.8 * err_off[-5:].mean())
    assert err_on.max() < 5.0


def test_checkpoint_resume_bit_identical(tmp_path):
    """Split the replay at keyframe 5, checkpoint the carry to disk, resume
    — outputs must equal the uninterrupted run exactly."""
    import jax
    from glio_tpu.utils import checkpoint

    ep = simulate_episode(n_keyframes=10, scan_points=512, seed=13)
    cfg = CFG
    replay, _ = make_replay(cfg)
    inputs = ep.to_inputs()
    full = replay(inputs, ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)

    carry0 = replay.make_initial_carry(
        jnp.asarray(ep.p0), jnp.asarray(ep.q0), jnp.asarray(ep.v0),
        ep.acc0, ep.gyr0, inputs_template=inputs)
    head = jax.tree.map(lambda a: a[:5], inputs)
    tail = jax.tree.map(lambda a: a[5:], inputs)
    carry1, out_head = replay.replay_from(carry0, head)
    path = str(tmp_path / "carry.npz")
    checkpoint.save_pytree(path, carry1)
    carry1b = checkpoint.load_pytree(path, carry1)
    _, out_tail = replay.replay_from(carry1b, tail)

    np.testing.assert_array_equal(np.asarray(out_head.p),
                                  np.asarray(full.p[:5]))
    np.testing.assert_array_equal(np.asarray(out_tail.p),
                                  np.asarray(full.p[5:]))


def test_doppler_in_window_improves_velocity():
    """tcdopplerFactor + constantClockDriftFactor rows in the window
    (reference's compiled-out block, Estimator.cpp:2290-2345): with
    Doppler on, the velocity estimate must improve and the estimated
    receiver clock drift must land near the simulated truth
    (VERDICT r1 item 6)."""
    from glio_tpu.data.simulator import simulate_gnss_epochs

    est = CFG.estimator.__class__
    cfg_dopp = CFG.replace(estimator=est(
        local_map_width=8, sw_max_iter=8, gnss_in_sliding_window=True,
        doppler_in_window=True))
    cfg_nodopp = CFG.replace(estimator=est(
        local_map_width=8, sw_max_iter=8, gnss_in_sliding_window=True,
        doppler_in_window=False))
    ep = simulate_episode(n_keyframes=20, scan_points=512, seed=21)
    anchor = np.asarray(CFG.initialization.anc_ecef)
    station = np.asarray(CFG.initialization.station_ecef)
    ep.gnss = simulate_gnss_epochs(ep.gt_p, ep.kf_time, anchor, station,
                                   psr_noise=0.3, epoch_stride=1, seed=21)
    out_d = make_replay(cfg_dopp)[0](
        ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
    out_n = make_replay(cfg_nodopp)[0](
        ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)

    verr_d = np.linalg.norm(np.asarray(out_d.v) - ep.gt_v, axis=-1)
    verr_n = np.linalg.norm(np.asarray(out_n.v) - ep.gt_v, axis=-1)
    perr_d = np.linalg.norm(np.asarray(out_d.p) - ep.gt_p, axis=-1)
    # Doppler rows must engage and not harm the solution.
    assert not np.array_equal(np.asarray(out_d.p), np.asarray(out_n.p))
    assert perr_d.max() < 2.0, perr_d.max()
    assert verr_d[-8:].mean() < max(0.35, 1.05 * verr_n[-8:].mean())
    # Estimated receiver clock drift near the simulated constant
    # (1e-3*c*1e-8 ≈ 3e-3 m/s) — same order, bounded error.
    ddt = np.asarray(out_d.ddt)
    assert np.all(np.abs(ddt[-8:] - 1e-3 * 299792458.0 * 1e-8) < 0.05)


def test_checkpoint_resume_with_gnss_window(tmp_path):
    """Checkpoint/resume bit-identity with the GNSS-in-window path: the
    carry now holds the DD epoch ring AND the receiver-clock-drift ring
    (WindowStateDdt solve) — both must round-trip through the
    checkpoint."""
    import jax
    from glio_tpu.data.simulator import simulate_gnss_epochs
    from glio_tpu.utils import checkpoint

    cfg = CFG.replace(estimator=CFG.estimator.__class__(
        local_map_width=8, sw_max_iter=8, gnss_in_sliding_window=True,
        doppler_in_window=True))
    ep = simulate_episode(n_keyframes=8, scan_points=512, seed=27)
    anchor = np.asarray(cfg.initialization.anc_ecef)
    station = np.asarray(cfg.initialization.station_ecef)
    ep.gnss = simulate_gnss_epochs(ep.gt_p, ep.kf_time, anchor, station,
                                   psr_noise=0.3, epoch_stride=1, seed=27)
    replay, _ = make_replay(cfg)
    inputs = ep.to_inputs()
    full = replay(inputs, ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)

    carry0 = replay.make_initial_carry(
        jnp.asarray(ep.p0), jnp.asarray(ep.q0), jnp.asarray(ep.v0),
        ep.acc0, ep.gyr0, inputs_template=inputs)
    head = jax.tree.map(lambda a: a[:4], inputs)
    tail = jax.tree.map(lambda a: a[4:], inputs)
    carry1, out_head = replay.replay_from(carry0, head)
    path = str(tmp_path / "carry_gnss.npz")
    checkpoint.save_pytree(path, carry1)
    carry1b = checkpoint.load_pytree(path, carry1)
    _, out_tail = replay.replay_from(carry1b, tail)

    np.testing.assert_array_equal(np.asarray(out_head.p),
                                  np.asarray(full.p[:4]))
    np.testing.assert_array_equal(np.asarray(out_tail.p),
                                  np.asarray(full.p[4:]))
    np.testing.assert_array_equal(np.asarray(out_tail.ddt),
                                  np.asarray(full.ddt[4:]))


def test_diverse_selection_rescues_ground_dominated_content():
    """Round-5 finding: on ground-dominated range-image content, the
    deterministic global top-F-by-weight feature selection picks almost
    exclusively ground planes (flattest fits), leaving horizontal
    translation and yaw soft — the window drifts quadratically while a
    normal+azimuth-diverse selection tracks (measured at production
    shape: 19.6 m vs 3.75 m over 60 keyframes). This pins the reduced-
    shape version of that A/B.
    """
    import dataclasses
    import os
    from glio_tpu.data.simulator import (corridor_world, raycast_scan,
                                         _quat_rotmat)
    from glio_tpu.models.preprocessing import make_preprocessor

    # Production shape is REQUIRED: at reduced shapes both modes track
    # (measured 0.30/0.47 m at 24x700/T=14) — the degeneracy needs the
    # HDL-32E ground share and ~30+ keyframes to compound.
    T = 36
    ep, dense = simulate_episode(
        n_keyframes=T, kf_dt=0.3, scan_points=2048, seed=8,
        scan_noise=0.01, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0),
        circle_omega=0.12, return_dense_gt=True)
    kf_idx = dense["kf_idx"]
    cfg0 = GlioConfig().replace(
        shapes=ShapeConfig(max_imu_per_interval=40, scan_points=2048,
                           map_points=16384),
        estimator=EstimatorConfig(local_map_width=20, sw_max_iter=10))
    pre = make_preprocessor(cfg0, surf_out=2048)
    cache = f"/tmp/glio_test_divsel_{T}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        scan, sv = z["scan"], z["sv"]
    else:
        world = corridor_world(dense["p"][kf_idx], n_walls=300, seed=8)
        rng = np.random.default_rng(12)
        scan = np.zeros((T, 2048, 3), np.float32)
        sv = np.zeros((T, 2048), bool)
        for i in range(T):
            img, iv = raycast_scan(
                world, dense["p"][kf_idx[i]],
                _quat_rotmat(dense["q"][kf_idx[i]]),
                n_rings=32, n_cols=1800, elev_lo=-0.535, elev_hi=0.186,
                max_range=80.0, rng=rng)
            f = pre(jnp.asarray(img), jnp.asarray(iv))
            scan[i] = np.asarray(f.surf)
            sv[i] = np.asarray(f.surf_valid)
        np.savez_compressed(cache, scan=scan, sv=sv)
    ep.scan, ep.scan_valid = scan, sv

    def run(diverse):
        cfg = cfg0.replace(feature_selection=dataclasses.replace(
            cfg0.feature_selection, diverse_select=diverse))
        replay, _ = make_replay(cfg)
        out = replay(ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
        return np.linalg.norm(np.asarray(out.p) - ep.gt_p, axis=-1).max()

    e_global = run(False)
    e_div = run(True)
    # Diverse must materially beat global on this content AND stay sane
    # (measured r5 at this config: 2.81 m vs 4.32 m — ratio 0.65; the
    # effect widens with window/horizon: 3.75 m vs 19.6 m at T=60/W=50).
    assert e_div < 0.8 * e_global, (e_div, e_global)
    assert e_div < 3.5, (e_div, e_global)
