"""SO(3) utilities: hat/vee, exp/log on matrices, left/right Jacobians.

Counterpart of the skew/Jacobian helpers in
``GLIO/include/utils/math_tools.h`` and ``common.h:134-173``, built
vmappable for batched factor linearization.
"""

import jax.numpy as jnp

from . import safe_trig as trig

from . import quat


def hat(v):
    """Skew-symmetric matrix such that hat(a) @ b == cross(a, b)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([
        zero, -z, y,
        z, zero, -x,
        -y, x, zero,
    ], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def vee(m):
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def exp(theta):
    """Rotation vector → rotation matrix (Rodrigues)."""
    return quat.to_rotmat(quat.exp(theta))


def log(R):
    """Rotation matrix → rotation vector."""
    return quat.log(quat.from_rotmat(R))


def _coeffs(angle):
    """Taylor-safe (A, B, C) with A=sinθ/θ, B=(1−cosθ)/θ², C=(θ−sinθ)/θ³."""
    a2 = angle * angle
    small = angle < 1e-6
    safe = jnp.where(small, 1.0, angle)
    A = jnp.where(small, 1.0 - a2 / 6.0, trig.sin(safe) / safe)
    B = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - trig.cos(safe)) / (safe * safe))
    C = jnp.where(small, 1.0 / 6.0 - a2 / 120.0, (safe - trig.sin(safe)) / (safe ** 3))
    return A, B, C


def left_jacobian(theta):
    """Jl(θ): exp((Jl v)^) ≈ exp(θ^) exp(v^)... the standard SO(3) left Jacobian."""
    angle = jnp.linalg.norm(theta, axis=-1)
    A, B, C = _coeffs(angle)
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I + B[..., None, None] * K + C[..., None, None] * (K @ K)


def right_jacobian(theta):
    """Jr(θ) = Jl(−θ)."""
    return left_jacobian(-theta)


def inv_right_jacobian(theta):
    """Jr(θ)⁻¹ in closed form (used in attitude-residual Jacobians)."""
    angle = jnp.linalg.norm(theta, axis=-1)
    a2 = angle * angle
    small = angle < 1e-6
    safe = jnp.where(small, 1.0, angle)
    k = jnp.where(
        small,
        1.0 / 12.0 + a2 / 720.0,
        (1.0 / (safe * safe)) - (1.0 + trig.cos(safe)) / (2.0 * safe * trig.sin(safe)),
    )
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I + 0.5 * K + k[..., None, None] * (K @ K)
