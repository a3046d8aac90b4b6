"""Single point positioning: weighted least squares, TPU-native.

Re-implementation of the reference's ``GNSS_Tools`` WLS solver
(``GLIO/include/utils/gnss_tools.h:588-870``): per-constellation receiver
clock unknowns, iterative Gauss-Newton, elevation+SNR variance model
(``eleSRNVar``, gnss_tools.h:1228-1248, goGPS weighting).  Unlike the
reference's per-epoch Eigen loop, this solves EVERY epoch of a sequence in
one batched jit (vmap over epochs, fixed satellite padding).

Also provides Doppler velocity estimation (the capability of
``gnss_comm``'s ``dopp_vel``, gnss_spp.hpp:36-94).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..solver.linalg import spd_solve
from ..utils.coords import OMGE

CLIGHT = 299792458.0
N_SYS = 4  # GPS, GLO, GAL, BDS


def elesnr_var(el, snr):
    """goGPS elevation/SNR variance (eleSRNVar): larger = worse."""
    T, A, a, F = 50.0, 30.0, 30.0, 10.0
    q1 = 1.0 / jnp.maximum(jnp.sin(el) ** 2, 1e-4)
    q2 = 10.0 ** (-(snr - T) / a)
    q3 = ((A / (10.0 ** (-(F - T) / a)) - 1.0) / (F - T)) * (snr - T) + 1.0
    return q1 * (q2 * q3)


def _sagnac(sat_pos, rcv_pos):
    return OMGE / CLIGHT * (sat_pos[..., 0] * rcv_pos[..., 1]
                            - sat_pos[..., 1] * rcv_pos[..., 0])


@partial(jax.jit, static_argnames=("iters",))
def solve_epoch(sat_pos, psr_corrected, system, valid, el, snr,
                x0, iters: int = 8):
    """WLS SPP for one epoch.

    Args:
      sat_pos: (M, 3) ECEF satellite positions (transmission frame).
      psr_corrected: (M,) pseudorange + sat_clk − iono − tropo (m).
      system: (M,) int constellation ids (0..3).
      valid: (M,) bool.
      el, snr: (M,) elevation (rad) / C-N0 for weighting.
      x0: (3,) initial receiver position (ECEF).

    Returns (pos (3,), clk (4,), ok, residual_rms). Per-constellation
    clocks like the reference (a system with no sats keeps clock 0 via
    damping).
    """
    n_par = 3 + N_SYS
    sys_onehot = jax.nn.one_hot(system, N_SYS, dtype=sat_pos.dtype)  # (M,4)
    w = jnp.where(valid, 1.0 / elesnr_var(el, snr), 0.0)

    def gn_step(state, _):
        x, clk = state
        d = sat_pos - x
        rho = jnp.linalg.norm(d, axis=-1)
        rho_sag = rho + _sagnac(sat_pos, x)
        pred = rho_sag + sys_onehot @ clk
        res = jnp.where(valid, psr_corrected - pred, 0.0)
        los = -d / jnp.maximum(rho, 1.0)[..., None]
        J = jnp.concatenate([los, sys_onehot], axis=-1)       # (M, 7)
        Jw = J * w[:, None]
        H = Jw.T @ J + 1e-9 * jnp.eye(n_par, dtype=x.dtype)
        g = Jw.T @ res
        dx = spd_solve(H, g)
        return (x + dx[:3], clk + dx[3:]), jnp.sum(res * res * w)

    (x, clk), costs = jax.lax.scan(
        gn_step, (x0, jnp.zeros(N_SYS, x0.dtype)), None, length=iters)
    # Final residual RMS for quality gating.
    d = sat_pos - x
    rho = jnp.linalg.norm(d, axis=-1) + _sagnac(sat_pos, x)
    res = jnp.where(valid, psr_corrected - rho - sys_onehot @ clk, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    rms = jnp.sqrt(jnp.sum(res * res) / n)
    ok = (jnp.sum(valid) >= 5) & jnp.all(jnp.isfinite(x)) & (rms < 100.0)
    return x, clk, ok, rms


solve_epochs = jax.vmap(solve_epoch,
                        in_axes=(0, 0, 0, 0, 0, 0, None))


@jax.jit
def doppler_velocity(sat_pos, sat_vel, dopp_ms, system, valid, el, snr, rcv_pos):
    """WLS receiver velocity + clock drift from range-rate measurements.

    dopp_ms: (M,) measured range rate in m/s (−doppler·λ convention as the
    reference stores it). One shared clock drift (matching the released
    tcdoppler factor, dopp_factor.hpp:38).
    """
    d = sat_pos - rcv_pos
    rho = jnp.linalg.norm(d, axis=-1)
    los = d / jnp.maximum(rho, 1.0)[..., None]
    w = jnp.where(valid, 1.0 / elesnr_var(el, snr), 0.0)
    # pred = (sv_vel − v)·los + ddt  ⇒ linear system in (v, ddt).
    J = jnp.concatenate([-los, jnp.ones_like(rho)[:, None]], axis=-1)
    y = dopp_ms - jnp.sum(sat_vel * los, axis=-1)
    Jw = J * w[:, None]
    H = Jw.T @ J + 1e-9 * jnp.eye(4, dtype=rcv_pos.dtype)
    g = Jw.T @ jnp.where(valid, y, 0.0)
    sol = spd_solve(H, g)
    return sol[:3], sol[3]
