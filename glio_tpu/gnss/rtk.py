"""Per-epoch DD (RTK-float-style) positioning.

Capability counterpart of the reference's ``rtkpos`` float solution
(``RTKLIB/src/rtkpos.cpp`` publishing ``ECEFSolutionRTK`` + covariance,
SURVEY.md §2.2 #18): estimate the rover position per epoch from
double-differenced pseudoranges against the base station, with the DD
covariance propagated for downstream gating (the LC fusion's
``gnssCovThreshold`` check, Estimator.cpp:1963-1969).

Carrier-phase ambiguity resolution (LAMBDA) is not implemented — the
reference's estimator consumes the float/pseudorange solution path; AR is
an acknowledged gap (tracked in README).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..solver.linalg import spd_solve
from .spp import elesnr_var


@partial(jax.jit, static_argnames=("iters",))
def solve_epoch_dd(sat_pos, psr_rov, psr_sta, valid, system, master,
                   station_ecef, el, snr, x0, iters: int = 8):
    """Gauss-Newton DD position fix for one epoch.

    Returns (pos_ecef, cov (3,3), ok, n_dd). Weighting = inverse goGPS
    variance of the non-master satellite (the dominant term).
    """
    M = sat_pos.shape[0]
    n_sys = master.shape[0]

    # Build DD pairing masks + weights once (state-independent).
    pair_mask = jnp.zeros((M,), bool)
    master_of = jnp.zeros((M,), jnp.int32)
    for s in range(n_sys):
        mp = master[s]
        has = mp >= 0
        m = valid & (system == s) & (jnp.arange(M) != jnp.maximum(mp, 0)) & has
        pair_mask = pair_mask | m
        master_of = jnp.where(m, jnp.maximum(mp, 0), master_of)

    w = jnp.where(pair_mask, 1.0 / elesnr_var(el, snr), 0.0)

    sd_meas = psr_rov - psr_sta
    dd_meas = sd_meas - sd_meas[master_of]

    def gn_step(x, _):
        d = sat_pos - x
        rho_u = jnp.linalg.norm(d, axis=-1)
        rho_r = jnp.linalg.norm(sat_pos - station_ecef, axis=-1)
        sd_est = rho_u - rho_r
        dd_est = sd_est - sd_est[master_of]
        res = jnp.where(pair_mask, dd_meas - dd_est, 0.0)
        los = -d / jnp.maximum(rho_u, 1.0)[:, None]
        A = los - los[master_of]
        Aw = A * w[:, None]
        H = Aw.T @ A + 1e-9 * jnp.eye(3, dtype=x.dtype)
        dx = spd_solve(H, Aw.T @ res)
        return x + dx, jnp.sum(res * res * w)

    x, _ = jax.lax.scan(gn_step, x0, None, length=iters)

    # Final residuals + covariance.
    d = sat_pos - x
    rho_u = jnp.linalg.norm(d, axis=-1)
    rho_r = jnp.linalg.norm(sat_pos - station_ecef, axis=-1)
    sd_est = rho_u - rho_r
    dd_est = sd_est - sd_est[master_of]
    res = jnp.where(pair_mask, dd_meas - dd_est, 0.0)
    los = -d / jnp.maximum(rho_u, 1.0)[:, None]
    A = los - los[master_of]
    Aw = A * w[:, None]
    H = Aw.T @ A + 1e-9 * jnp.eye(3, dtype=x.dtype)
    n_dd = jnp.sum(pair_mask)
    dof = jnp.maximum(n_dd - 3, 1)
    s2 = jnp.sum(res * res * w) / dof
    # Cholesky inverse: jnp.linalg.inv lowers to LU, which XLA:TPU does
    # not implement for f64; H is SPD (Gram + ridge).
    cov = s2 * spd_solve(H, jnp.eye(3, dtype=H.dtype))
    ok = (n_dd >= 4) & jnp.all(jnp.isfinite(x)) & (jnp.sqrt(s2) < 100.0)
    return x, cov, ok, n_dd


solve_epochs_dd = jax.vmap(solve_epoch_dd,
                           in_axes=(0, 0, 0, 0, 0, 0, None, 0, 0, None))
