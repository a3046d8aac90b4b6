"""Batch marginal-covariance calibration: sim-validated coverage.

VERDICT r3 item 4: the formal marginals are exact linear algebra but
20-80x overconfident even on a drifted SIMULATION (the stiff relative
factors retain odometry drift the information matrix cannot see); on
real Whampoa the measured gap was 37-72x. ``calibrate_batch_covariance``
adds the windowed-median GNSS discrepancy in quadrature; these tests pin
its coverage against known truth — white noise AND a Gauss-Markov
elevation-mapped bias (the synthesized-station atmosphere mode).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from glio_tpu.config import GlioConfig
from glio_tpu.data.simulator import simulate_gnss_epochs
from glio_tpu.models import batch as B

pytestmark = [pytest.mark.slow]  # heavy tier (see pyproject)

ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.92, 5386768.987, 2407460.031])
ROBUST = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)


def _build(bias_sigma=0.0, tau=30.0, seed=4, T=240):
    rng = np.random.default_rng(seed)
    kf_time = np.arange(T) / 3.0
    th = np.linspace(0, 3, T)
    p_true = np.stack([40 * th, 15 * np.sin(th), 0.5 * th], -1)
    q_true = np.tile([1.0, 0, 0, 0], (T, 1))
    # Smooth quadratic odometry drift (~17 m by the end): the reference
    # weights keep much of it (relatives 20/m vs DD ~0.5/m), which is
    # exactly the bias mode the formal covariance cannot see.
    drift = np.stack([0.0003 * np.arange(T) ** 2,
                      -0.0002 * np.arange(T) ** 2,
                      0.0001 * np.arange(T) ** 2], -1)
    g = simulate_gnss_epochs(p_true, kf_time, ANCHOR, STATION,
                             psr_noise=0.5, seed=seed)
    if bias_sigma > 0:
        E = g.time.shape[0]
        phi = np.exp(-1.0 / tau)
        b = np.zeros(E)
        for e in range(1, E):
            b[e] = (phi * b[e - 1]
                    + bias_sigma * np.sqrt(1 - phi ** 2) * rng.normal())
        mf = 1.0 / np.maximum(np.sin(g.elevation), 0.2)
        g = dataclasses.replace(g, psr_rov=g.psr_rov + b[:, None] * mf
                                * g.valid)
    cfg = GlioConfig()
    prob = B.build_problem(cfg, p_true + drift, q_true, kf_time, g,
                           ANCHOR, 0.0, STATION)
    return cfg, prob, p_true


def _solve_and_ratios(bias_sigma):
    cfg, prob, p_true = _build(bias_sigma=bias_sigma)
    p, q, _ = B.optimize_batch(cfg, prob, lm_iters=8, robust=ROBUST)
    cov = B.batch_marginal_covariance(cfg, prob, p, q)
    cov_cal, rep = B.calibrate_batch_covariance(cfg, prob, p, q, cov,
                                                robust=ROBUST)
    assert rep["calibrated"]
    err = np.abs(np.asarray(p) - p_true)
    def ratios(c):
        std = np.sqrt(np.maximum(np.diagonal(
            np.asarray(c)[:, :3, :3], axis1=1, axis2=2), 1e-18))
        return err / std
    return ratios(cov), ratios(cov_cal)


@pytest.mark.parametrize("bias_sigma,med_cap,p90_cap", [
    (0.0, 2.0, 3.5),   # measured r5: med 1.32-1.48, p90 <= 2.79
    (3.0, 2.5, 5.0),   # measured r5: med 1.63-2.33, p90 <= 2.97
])
def test_calibrated_coverage(bias_sigma, med_cap, p90_cap):
    r_formal, r_cal = _solve_and_ratios(bias_sigma)
    # The formal marginals are badly overconfident (this is the measured
    # problem being fixed, not an aspiration): median |err|/std > 5 on
    # every axis.
    assert np.median(r_formal, axis=0).min() > 5.0
    # Calibrated: ~1-2 sigma coverage per axis.
    med = np.median(r_cal, axis=0)
    p90 = np.percentile(r_cal, 90, axis=0)
    assert med.max() < med_cap, med
    assert p90.max() < p90_cap, p90
    # Tightness (VERDICT r4 #3), not just coverage: per-axis median
    # coverage ratio must stay within ~4x of 1 — the round-5
    # consistency-blended attenuation may sharpen but must not inflate
    # (measured r5: per-axis medians 1.3-2.3 on both sims; the REAL
    # Whampoa problem measures med [0.21,0.28,0.51] / p90 <= 1.9 per
    # axis vs the golden batch — README "Calibrated covariance").
    assert np.median(r_cal, axis=0).min() > 0.25
