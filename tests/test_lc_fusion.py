"""Loosely-coupled pose-graph fusion tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from glio_tpu.models import lc_fusion
from glio_tpu.utils import quat

pytestmark = [pytest.mark.slow, pytest.mark.real_data]  # heavy tier (see pyproject)


def _drifting_odometry(T=200, seed=0):
    """Ground-truth circle + odometry with injected drift."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, T)
    p_true = np.stack([30 * np.cos(t), 30 * np.sin(t), 0.1 * t], -1)
    yaw = t + np.pi / 2
    ypr = np.stack([yaw, np.zeros_like(yaw), np.zeros_like(yaw)], -1)
    q_true = np.asarray(quat.from_ypr(jnp.asarray(ypr)))
    # Odometry: integrate true relatives + small bias → drift.
    p_odo = [p_true[0]]
    q_odo = [q_true[0]]
    for k in range(1, T):
        dq = quat.mul(quat.conj(jnp.asarray(q_true[k - 1])), jnp.asarray(q_true[k]))
        dp = quat.rotate(quat.conj(jnp.asarray(q_true[k - 1])),
                         jnp.asarray(p_true[k] - p_true[k - 1]))
        dp = np.asarray(dp) + np.array([0.02, 0.005, 0.0])   # drift bias
        q_odo.append(np.asarray(quat.mul(jnp.asarray(q_odo[-1]), dq)))
        p_odo.append(p_odo[-1] + np.asarray(
            quat.rotate(jnp.asarray(q_odo[-1]), jnp.asarray(dp))))
    return p_true, q_true, np.array(p_odo), np.array(q_odo)


def test_gnss_fixes_remove_drift():
    T = 200
    p_true, q_true, p_odo, q_odo = _drifting_odometry(T)
    drift0 = np.linalg.norm(p_odo - p_true, axis=-1)
    assert drift0.max() > 3.0           # odometry alone drifts

    rng = np.random.default_rng(1)
    gnss_p = p_true + 0.5 * rng.normal(size=(T, 3))
    gnss_valid = np.zeros(T, bool)
    gnss_valid[::5] = True              # 3 Hz kf / ~1 Hz GNSS cadence
    sigma = np.full(T, 0.5)

    prob = lc_fusion.build_problem(p_odo, q_odo, gnss_p, gnss_valid, sigma,
                                   min_spacing_m=1.0)
    p, q, cost = lc_fusion.solve(prob, jnp.asarray(p_odo), jnp.asarray(q_odo))
    err = np.linalg.norm(np.asarray(p) - p_true, axis=-1)
    assert err.max() < 1.5, err.max()
    assert err.mean() < 0.5


def test_spacing_gate():
    p = np.zeros((10, 3))
    p[:, 0] = np.arange(10) * 2.0       # 2 m apart
    valid = np.ones(10, bool)
    prob = lc_fusion.build_problem(
        p, np.tile([1.0, 0, 0, 0], (10, 1)), p, valid, np.ones(10),
        min_spacing_m=5.0)
    used = np.asarray(prob.gnss_valid)
    # 2 m spacing with a 5 m gate → every 3rd fix survives.
    assert used.sum() == 4
    assert used[0] and used[3] and used[6] and used[9]


def test_lc_whampoa_parity_regression():
    """Pins the real-data LC parity figure (VERDICT r2 item 5): despiked
    golden-SW odometry + covariance-gated robust per-epoch code-DD fixes
    through the LC chain solve, vs the reference's lc_result.csv. The
    measured round-3 floor is ~63 m RMSE — bound by an epoch-wide
    systematic in the fixes (deep-urban NLOS + atmosphere through the
    SYNTHESIZED base station biases most satellites of an epoch at once;
    the reference used real-base RTK fixes; hksc1410.21o is not
    redistributed). The bound here catches regressions of the chain
    solve, the robust DD solver, or the gating — not an accuracy
    claim."""
    import os
    import jax.numpy as jnp
    from glio_tpu.data.episode import GnssEpochs
    from glio_tpu.eval.trajectory import read_result_csv, associate, \
        ate_rmse
    from glio_tpu.gnss import rtk
    from glio_tpu.models.batch import despike_trajectory
    from glio_tpu.utils import coords as C
    from glio_tpu.utils import quat

    cache = "/tmp/whampoa_gnss.npz"
    ref = "/root/reference/result/lc_result.csv"
    if not (os.path.exists(cache) and os.path.exists(ref)):
        import pytest
        pytest.skip("Whampoa cache / reference CSVs not available")
    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
    STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
    z = np.load(cache)
    g = GnssEpochs(**{k: z[k] for k in z.files})
    sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
    lc = read_result_csv(ref)
    q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
    p_sw, q_odo, _ = despike_trajectory(sw.enu, q_odo, sw.time)

    fixes, covs, oks, _ = rtk.solve_epochs_dd(
        jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov),
        jnp.asarray(g.psr_sta), jnp.asarray(g.valid),
        jnp.asarray(g.system, jnp.int32), jnp.asarray(g.master),
        jnp.asarray(STATION), jnp.asarray(g.elevation),
        jnp.asarray(g.snr), jnp.asarray(ANCHOR),
        iters=12, huber=3.0, trim=30.0)
    fixes = np.asarray(fixes)
    sig = np.sqrt(np.maximum(
        np.trace(np.asarray(covs), axis1=1, axis2=2) / 3, 1e-6))
    ok = np.asarray(oks) & (sig < 5.0)
    assert ok.sum() > 400  # the robust gate keeps a usable set (meas. 568)

    enu_fix = np.asarray(C.ecef2enu(jnp.asarray(fixes),
                                    jnp.asarray(ANCHOR)))
    T = p_sw.shape[0]
    ia, ib = associate(sw.time, g.time, max_dt=0.25)
    gp = np.zeros((T, 3))
    gv = np.zeros(T, bool)
    gs = np.ones(T)
    for a, b in zip(ia, ib):
        if ok[b]:
            gp[a] = enu_fix[b]
            gv[a] = True
            gs[a] = max(sig[b], 0.5)
    prob = lc_fusion.build_problem(p_sw, q_odo, gp, gv, gs,
                                   min_spacing_m=5.0)
    p, q, cost = lc_fusion.solve(prob, jnp.asarray(p_sw),
                                 jnp.asarray(q_odo), gn_iters=8,
                                 pcg_iters=400, gnss_huber=2.0)
    ia2, ib2 = associate(sw.time, lc.time)
    r1, e1 = ate_rmse(np.asarray(p)[ia2], lc.enu[ib2])
    # Measured round 3 (robust DD fixes): 63.4 m RMSE / 111.3 max.
    assert r1 < 75.0, r1
    assert e1.max() < 140.0, e1.max()


def test_lc_whampoa_float_ar_parity_regression():
    """Pins the round-4 float+AR LC leg (VERDICT r3 item 5): the
    innovation-gated float filter's HONEST covariance lets the LC solve
    downweight the biased fixes — measured 59.7 m RMSE vs lc_result.csv
    (round 3, formal covariance: 64.5 m), with 5 m-gate passes down
    1178 -> ~982. Guards the filter's consistency/floor machinery and
    the LAMBDA chain on real data."""
    import os
    import jax.numpy as jnp
    from glio_tpu.data.episode import GnssEpochs
    from glio_tpu.eval.trajectory import read_result_csv, associate, \
        ate_rmse
    from glio_tpu.gnss import lambda_ar, rtk
    from glio_tpu.models.batch import despike_trajectory
    from glio_tpu.utils import coords as C
    from glio_tpu.utils import quat

    cache = "/tmp/whampoa_gnss.npz"
    ref = "/root/reference/result/lc_result.csv"
    if not (os.path.exists(cache) and os.path.exists(ref)):
        import pytest
        pytest.skip("Whampoa cache / reference CSVs not available")
    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
    STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
    z = np.load(cache)
    g = GnssEpochs(**{k: z[k] for k in z.files})
    sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
    lc = read_result_csv(ref)
    q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
    p_sw, q_odo, _ = despike_trajectory(sw.enu, q_odo, sw.time)

    x0 = np.asarray(C.enu2ecef(jnp.asarray(p_sw[0]), jnp.asarray(ANCHOR)))
    flt = rtk.run_float_filter(g, STATION, x0)
    sig = np.sqrt(np.maximum(
        np.trace(np.asarray(flt.pos_cov), axis1=1, axis2=2) / 3, 1e-6))
    ok = np.asarray(flt.ok) & (sig < 5.0)
    # The honest covariance rejects a third of what the formal one
    # passed (measured 982 vs 1178) while keeping a usable set.
    assert 700 < ok.sum() < 1100, ok.sum()

    pos_ar, fixed, _ = lambda_ar.resolve_trajectory(g, flt)
    fixes = np.asarray(flt.pos).copy()
    fixes[fixed] = pos_ar[fixed]
    sig = np.where(fixed, np.minimum(sig, 0.5), sig)

    enu_fix = np.asarray(C.ecef2enu(jnp.asarray(fixes), jnp.asarray(ANCHOR)))
    T = p_sw.shape[0]
    ia, ib = associate(sw.time, g.time, max_dt=0.25)
    gp = np.zeros((T, 3))
    gv = np.zeros(T, bool)
    gs = np.ones(T)
    for a, b in zip(ia, ib):
        if ok[b]:
            gp[a] = enu_fix[b]
            gv[a] = True
            gs[a] = max(sig[b], 0.5)
    prob = lc_fusion.build_problem(p_sw, q_odo, gp, gv, gs,
                                   min_spacing_m=5.0)
    p, q, cost = lc_fusion.solve(prob, jnp.asarray(p_sw),
                                 jnp.asarray(q_odo), gn_iters=8,
                                 pcg_iters=400, gnss_huber=2.0)
    ia2, ib2 = associate(sw.time, lc.time)
    r1, e1 = ate_rmse(np.asarray(p)[ia2], lc.enu[ib2])
    # Measured round 4: 59.7 m RMSE / 119.8 max.
    assert r1 < 70.0, r1
    assert e1.max() < 140.0, e1.max()
