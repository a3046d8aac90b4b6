"""Experiment: batch fusion on golden-SW odometry + real Whampoa DD.

Compares our batch stage output against the reference's own
tc_batch_result.csv (see tests/test_batch.py for the assertions).

Data floor (measured, round 2): the reference's base-station RINEX
(hksc1410.21o) is not redistributed, so the station is synthesized from
Klobuchar/Saastamoinen models (the nav file carries no broadcast iono
coefficients — RTKCONV stripped them). The residual (true − model)
atmosphere at the station is a smooth, time-varying, elevation-dependent
bias worth ~5-15 m of vertical pull over this 20-min mission (measured
per-epoch against the golden trajectory: robust DD-only fixes have a
+5..+45 m slowly-growing vertical bias and ~60 m median 3D scatter from
deep-urban NLOS). The robust solve below (IRLS Huber on whitened DD rows,
per-epoch chi^2 gating, Huber'd relatives, isolated-spike despiking of
the SW init) tracks the golden batch to ~8.6 m RMSE / 15.5 m max — the
remaining error is the smooth vertical hump that only a physical base
station can cancel.

Estimated-atmosphere-state experiment (round 2, VERDICT suggestion (a)):
regressing the golden-trajectory DD residuals on a zenith-delay mapping
basis (1/sin el differences) explains only ~28% of per-epoch variance and
the fitted per-epoch delay is noise (diff-RMS 38 m, p10/p90 ±30 m) — the
residual is per-satellite NLOS/multipath scatter, not a smooth
estimable delay, so a ZTD state would fit noise rather than physics.
The Huber/epoch-gate robust treatment above is the correct model.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from glio_tpu.config import GlioConfig
from glio_tpu.eval.trajectory import read_result_csv, associate, ate_rmse
from glio_tpu.gnss import converter
from glio_tpu.models import batch as B
from glio_tpu.utils import quat

ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
DATA = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/urbannavWhampoa"

# Round-2 robust configuration (swept: see PROGRESS.jsonl r2).
ROBUST = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)


def _load_epochs():
    cache = "/tmp/whampoa_gnss.npz"
    if _os.path.exists(cache):
        from glio_tpu.data.episode import GnssEpochs
        z = np.load(cache)
        return GnssEpochs(**{k: z[k] for k in z.files})
    g = converter.convert(
        f"{DATA}/20210521.medium-urban.whampoa.ublox.m8t.GC.obs",
        f"{DATA}/hksc141g.nav", station_ecef=STATION)
    try:
        import dataclasses as _dc
        np.savez(cache, **_dc.asdict(g))
    except Exception:
        pass
    return g


def _report(tag, p, sw, bt):
    ia, ib = associate(sw.time, bt.time)
    r1, e1 = ate_rmse(p[ia], bt.enu[ib])
    off = np.median(p[ia] - bt.enu[ib], axis=0)
    r2, e2 = ate_rmse(p[ia] - off, bt.enu[ib])
    h = np.linalg.norm((p[ia] - bt.enu[ib])[:, :2], axis=1)
    v = (p[ia] - bt.enu[ib])[:, 2]
    print(f"{tag} vs golden-batch: rmse {r1:.2f} max {e1.max():.1f} "
          f"median {np.median(e1):.2f}")
    print(f"  horiz rmse {np.sqrt((h**2).mean()):.2f} max {h.max():.1f} | "
          f"vert rmse {np.sqrt((v**2).mean()):.2f}")
    print(f"  offset {off.round(2)}; shape rmse {r2:.2f} max {e2.max():.1f} "
          f"median {np.median(e2):.2f}", flush=True)
    return r1


def main(lm_iters=(40, 12, 8, 8), pcg_iters=250, atm=False):
    sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
    bt = read_result_csv("/root/reference/result/tc_batch_result.csv")
    g = _load_epochs()
    p_odo = sw.enu
    q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
    cfg = GlioConfig()
    prob = B.build_problem(cfg, p_odo, q_odo, sw.time, g, ANCHOR, 0.0, STATION)
    t0 = time.time()
    if atm:
        # Gauss-Markov zenith-bias chain A/B (VERDICT r2 item 4): the
        # smooth vertical hump is the synthesized station's missing
        # atmosphere; a per-keyframe GM bias targets exactly the
        # time-correlated component the round-2 per-epoch regression
        # could not separate from NLOS scatter.
        p, q, z, costs = B.optimize_batch_atm(
            cfg, prob, thresholds=(1e9, 10.0, 8.0, 6.0),
            lm_iters=lm_iters, robust=ROBUST)
        print("z stats: mean", float(np.mean(np.asarray(z))), "std",
              float(np.std(np.asarray(z))), flush=True)
    else:
        p, q, costs = B.optimize_batch(
            cfg, prob, thresholds=(1e9, 10.0, 8.0, 6.0),
            lm_iters=lm_iters, pcg_iters=pcg_iters, robust=ROBUST)
    p = np.asarray(p)
    print("solve", round(time.time() - t0, 1), "s; costs",
          [round(c) for c in costs], flush=True)
    _report("OURS(atm)" if atm else "OURS", p, sw, bt)
    np.save("/tmp/our_batch_p_atm.npy" if atm else "/tmp/our_batch_p.npy", p)

    # Marginal covariance consistency vs the golden batch: the formal
    # stds model measurement noise only — the synthesized station's
    # unmodeled atmosphere/NLOS bias dominates the actual error, so the
    # ratio actual/predicted quantifies exactly how much of the parity
    # floor is UNMODELED bias rather than estimator optimism.
    if not atm:
        cov = np.asarray(B.batch_marginal_covariance(cfg, prob, jnp.asarray(p),
                                                     jnp.asarray(q)))
        std_p = np.sqrt(np.maximum(
            np.diagonal(cov[:, :3, :3], axis1=1, axis2=2), 0.0))
        from glio_tpu.eval.trajectory import associate
        ia, ib = associate(sw.time, bt.time)
        err = np.abs(p[ia] - bt.enu[ib])
        print(f"cov report: median predicted 3D std "
              f"{np.median(np.linalg.norm(std_p, axis=-1)):.2f} m; "
              f"median |err|/std per axis "
              f"{np.median(err / np.maximum(std_p[ia], 1e-6), axis=0).round(1)}",
              flush=True)
        # Round-5 calibrated marginals (VERDICT r4 #3): global +
        # consistency-blended GNSS-evidence bias, plus the synthesized-
        # station vertical atmosphere floor (this dataset has no real
        # base RINEX). Measured here r5: med [0.21,0.28,0.51],
        # p90 [1.89,1.18,1.83], median 3D std 21.4 m (was 42).
        cov_cal, rep = B.calibrate_batch_covariance(
            cfg, prob, jnp.asarray(p), jnp.asarray(q), cov, robust=ROBUST,
            atm_floor_z=5.0)
        std_c = np.sqrt(np.maximum(np.diagonal(
            np.asarray(cov_cal)[:, :3, :3], axis1=1, axis2=2), 0.0))
        rat = err / np.maximum(std_c[ia], 1e-6)
        print(f"cov CALIBRATED: median 3D std "
              f"{np.median(np.linalg.norm(std_c, axis=-1)):.2f} m "
              f"(bias3d {rep['median_bias_3d']:.2f}); "
              f"median |err|/std per axis {np.median(rat, axis=0).round(2)}"
              f"; p90 {np.percentile(rat, 90, axis=0).round(2)}",
              flush=True)


if __name__ == "__main__":
    import sys
    main(atm="atm" in sys.argv[1:])
