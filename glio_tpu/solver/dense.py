"""Dense manifold Levenberg–Marquardt / Gauss-Newton for small problems.

This is the TPU-native replacement for the Ceres solves in the reference's
sliding window (``Estimator.cpp:2424-2433``: SPARSE_NORMAL_CHOLESKY +
DOGLEG, ≤15 iterations over a 5-keyframe window) and the lidar-odometry
scan matching (``LidarOdometry.cpp:474-581``).

Design (TPU-first, not a Ceres translation):
* The entire window is one flat tangent vector (5 kf × 15 dof ≈ 75 dims);
  at this size a *dense* normal-equations solve is faster on TPU than any
  sparse structure — one fused JᵀJ matmul plus a 75×75 Cholesky.
* Jacobians come from ``jax.jacfwd`` through the retraction, so factor
  residuals stay pure and parameterization-free (the reference hand-derives
  per-factor Jacobians against Ceres' global quaternion parameterization;
  autodiff through a local retraction reaches the same optimum).
* Fixed iteration count with accept/reject via masked selects — no
  data-dependent control flow, so the whole solve jit-compiles to a single
  XLA program replayed per keyframe.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import linalg


class LMResult(NamedTuple):
    x: object           # solution pytree
    cost: jnp.ndarray   # final 0.5*||r||^2
    initial_cost: jnp.ndarray
    lam: jnp.ndarray
    iters: jnp.ndarray  # accepted iterations


def _cost(r):
    return 0.5 * jnp.sum(r * r)


def huber_weight(r, delta: float):
    """IRLS square-root Huber weights: multiply residuals by this to get
    Gauss-Newton steps equivalent to Ceres' HuberLoss(delta) (the
    reference uses HuberLoss(1.0) on its window lidar factors,
    Estimator.cpp:2092). Wrapped in stop_gradient so autodiff treats the
    weight as constant per linearization (classic IRLS)."""
    a = jnp.abs(r)
    w = jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(a, 1e-12)))
    return jax.lax.stop_gradient(w)


def lm_solve(
    residual_fn: Callable,
    retract_fn: Callable,
    x0,
    tangent_dim: int,
    max_iters: int = 15,
    lambda_init: float = 1e-4,
    lambda_up: float = 4.0,
    lambda_down: float = 0.5,
    lambda_min: float = 1e-10,
    lambda_max: float = 1e8,
    dtype=jnp.float64,
    residual32_fn=None,
    mixed_chol: bool = True,
) -> LMResult:
    """Levenberg–Marquardt on a manifold.

    Args:
      residual_fn: pytree state -> flat residual vector (fixed shape; invalid
        residuals must be masked to zero inside).
      retract_fn: (state, delta[tangent_dim]) -> state.
      x0: initial state pytree.
      tangent_dim: dimension of the tangent space.
      max_iters: fixed trace-time iteration count (reference budget: 15).
      residual32_fn: optional float32 twin of residual_fn. When given, the
        Jacobian is forward-differentiated through it instead (TPU f64 is
        emulated; an f32 J costs ~ a third). Residual values, costs and
        accept/reject stay f64, so the converged solution is unchanged to
        ~1e-5 relative step accuracy — LM re-evaluates the true cost.
      mixed_chol: factor the damped normal equations in f32 with f64
        iterative refinement (linalg.spd_solve_refined) — ~6x faster on
        TPU at f64-equivalent step accuracy. Set False for exact-f64
        paths (CPU baselines, debugging).

    Returns LMResult. Fully jit-compatible.
    """
    zeros = jnp.zeros(tangent_dim, dtype=dtype)

    def jacobian(x):
        if residual32_fn is None:
            return jax.jacfwd(lambda d: residual_fn(retract_fn(x, d)))(zeros)
        z32 = jnp.zeros(tangent_dim, jnp.float32)
        return jax.jacfwd(
            lambda d: residual32_fn(
                retract_fn(x, d.astype(dtype))))(z32).astype(dtype)

    def step(carry, _):
        # The f64 residual at the current x is carried from the previous
        # iteration's candidate evaluation (identical value) — emulated
        # f64 residual passes are the LM iteration's main fixed cost, and
        # this halves them to one per iteration.
        x, r, lam, cost, accepted = carry
        J = jacobian(x)
        H = J.T @ J
        g = J.T @ r
        # Marquardt scaling on the diagonal keeps steps well-conditioned
        # across the heterogeneous units (m, rad, m/s, bias). Dimensions the
        # residuals don't touch (zero diagonal) get unit damping so the
        # Cholesky stays PD and their step is exactly zero.
        dH = jnp.diag(H)
        D = jnp.diag(jnp.where(dH > 1e-10, dH, 1.0))
        solve = (linalg.spd_solve_refined if mixed_chol
                 else linalg.spd_solve)
        delta = -solve(H + lam * D, g)
        x_new = retract_fn(x, delta)
        r_new = residual_fn(x_new)
        new_cost = _cost(r_new)
        improved = new_cost < cost
        x = jax.tree.map(
            lambda a, b: jnp.where(improved, b, a), x, x_new)
        r = jnp.where(improved, r_new, r)
        cost = jnp.where(improved, new_cost, cost)
        lam = jnp.clip(
            jnp.where(improved, lam * lambda_down, lam * lambda_up),
            lambda_min, lambda_max)
        accepted = accepted + improved.astype(jnp.int32)
        return (x, r, lam, cost, accepted), cost

    r0 = residual_fn(x0)
    init_cost = _cost(r0)
    (x, _r, lam, cost, accepted), _ = jax.lax.scan(
        step, (x0, r0, jnp.asarray(lambda_init, dtype), init_cost,
               jnp.asarray(0, jnp.int32)),
        None, length=max_iters)
    return LMResult(x, cost, init_cost, lam, accepted)


def gn_solve(residual_fn, retract_fn, x0, tangent_dim, max_iters=8,
             damping=1e-9, dtype=jnp.float64):
    """Plain Gauss-Newton (always-accept); cheaper when far from singular."""
    zeros = jnp.zeros(tangent_dim, dtype=dtype)

    def step(x, _):
        r = residual_fn(x)
        J = jax.jacfwd(lambda d: residual_fn(retract_fn(x, d)))(zeros)
        H = J.T @ J + damping * jnp.eye(tangent_dim, dtype=dtype)
        delta = -linalg.spd_solve(H, J.T @ r)
        return retract_fn(x, delta), _cost(r)

    x, costs = jax.lax.scan(step, x0, None, length=max_iters)
    return LMResult(x, _cost(residual_fn(x)), costs[0], jnp.asarray(0.0),
                    jnp.asarray(max_iters, jnp.int32))


def dogleg_solve(
    residual_fn: Callable,
    retract_fn: Callable,
    x0,
    tangent_dim: int,
    max_iters: int = 15,
    trust_init: float = 1.0,
    trust_max: float = 1e4,
    dtype=jnp.float64,
) -> LMResult:
    """Powell dogleg with trust-region radius adaptation.

    Matches the reference solver choice (``ceres::DOGLEG``,
    ``Estimator.cpp:2428``) in spirit: interpolate between the Cauchy
    (steepest-descent) point and the Gauss-Newton point inside a trust
    region, expanding/shrinking on gain ratio.
    """
    zeros = jnp.zeros(tangent_dim, dtype=dtype)

    def step(carry, _):
        x, radius, cost, accepted = carry
        r = residual_fn(x)
        J = jax.jacfwd(lambda d: residual_fn(retract_fn(x, d)))(zeros)
        g = J.T @ r
        H = J.T @ J
        # Gauss-Newton point (small Tikhonov for safety).
        h_gn = -linalg.spd_solve(H + 1e-12 * jnp.eye(tangent_dim, dtype=dtype), g)
        # Cauchy point.
        gBg = g @ (H @ g)
        alpha = jnp.where(gBg > 0, (g @ g) / jnp.maximum(gBg, 1e-30), 1.0)
        h_sd = -alpha * g
        n_gn = jnp.linalg.norm(h_gn)
        n_sd = jnp.linalg.norm(h_sd)

        # Dogleg path selection (branch-free).
        d = h_gn - h_sd
        dd = d @ d
        sd_d = h_sd @ d
        disc = jnp.maximum(sd_d**2 + dd * (radius**2 - n_sd**2), 0.0)
        beta = jnp.where(dd > 0, (-sd_d + jnp.sqrt(disc)) / jnp.maximum(dd, 1e-30), 0.0)
        h_interp = h_sd + jnp.clip(beta, 0.0, 1.0) * d

        h = jnp.where(
            n_gn <= radius, h_gn,
            jnp.where(n_sd >= radius,
                      h_sd * (radius / jnp.maximum(n_sd, 1e-30)),
                      h_interp))

        x_new = retract_fn(x, h)
        new_cost = _cost(residual_fn(x_new))
        pred_red = -(g @ h) - 0.5 * h @ (H @ h)
        rho = (cost - new_cost) / jnp.maximum(pred_red, 1e-30)

        improved = (new_cost < cost) & (pred_red > 0)
        x = jax.tree.map(lambda a, b: jnp.where(improved, b, a), x, x_new)
        cost = jnp.where(improved, new_cost, cost)
        radius = jnp.where(rho > 0.75, jnp.minimum(radius * 2.0, trust_max),
                           jnp.where(rho < 0.25, radius * 0.25, radius))
        radius = jnp.maximum(radius, 1e-10)
        accepted = accepted + improved.astype(jnp.int32)
        return (x, radius, cost, accepted), cost

    init_cost = _cost(residual_fn(x0))
    (x, radius, cost, accepted), _ = jax.lax.scan(
        step, (x0, jnp.asarray(trust_init, dtype), init_cost,
               jnp.asarray(0, jnp.int32)),
        None, length=max_iters)
    return LMResult(x, cost, init_cost, radius, accepted)
