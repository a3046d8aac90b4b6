"""Quaternion algebra (Hamilton convention, wxyz storage).

Re-implements, TPU-first (pure jnp, vmappable, no host control flow), the
quaternion utilities the reference keeps in
``GLIO/include/utils/math_tools.h:14-173`` and
``GLIO/include/utils/common.h:134-276`` (``Utility`` class): ``deltaQ``,
``Qleft``/``Qright``, hemisphere unification, ypr conversions, ``g2R``.

Conventions
-----------
* Storage: ``[w, x, y, z]`` (Eigen's ``Quaterniond(w,x,y,z)`` ctor order).
* Hamilton product; rotation acts as ``R(q) v = q ⊗ v ⊗ q⁻¹`` (body→world
  when q is a body-to-world attitude).
* All functions operate on the last axis and broadcast over leading axes.
"""

import jax.numpy as jnp

from . import safe_trig as trig


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def mul(q1, q2):
    """Hamilton product q1 ⊗ q2 (broadcasts over leading axes)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) v.

    Uses the expanded 15-mul form rather than q⊗v⊗q* (cheaper, fuses well).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def to_rotmat(q):
    """Quaternion → 3x3 rotation matrix (body→world)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_rotmat(R):
    """3x3 rotation matrix → quaternion, branch-free (Shepperd's method).

    Computes all four candidate quaternions and selects the numerically best
    by the largest diagonal combination — jit/vmap-safe (no data-dependent
    branching), unlike the usual if-cascade.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component².
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return positive_hemisphere(normalize(q))


def delta_q(theta):
    """Small-angle rotation vector → quaternion, first order.

    Matches ``deltaQ`` in ``math_tools.h`` (used throughout preintegration):
    q ≈ [1, θ/2], normalized.
    """
    half = 0.5 * theta
    w = jnp.ones_like(half[..., :1])
    return normalize(jnp.concatenate([w, half], axis=-1))


def exp(theta):
    """Exact SO(3) exponential as a quaternion: θ (rotation vector) → q.

    Differentiation-safe at θ=0: the norm is never computed on a (possibly)
    zero vector (double-where), so jacfwd/jacrev give the exact Jacobian
    instead of NaN.
    """
    sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    small = sq < 1e-16
    safe_sq = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(safe_sq)
    half = 0.5 * angle
    k = jnp.where(small, 0.5 - sq / 48.0, trig.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, trig.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


def log(q):
    """Quaternion → rotation vector (inverse of exp). Hemisphere-safe and
    differentiation-safe at the identity (double-where on the vector norm).
    """
    q = positive_hemisphere(q)
    w = q[..., 0:1]
    v = q[..., 1:4]
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = sq < 1e-16
    n = jnp.sqrt(jnp.where(small, 1.0, sq))
    angle = 2.0 * trig.arctan2(n, w)
    # Near identity: log ≈ 2 v/w · (1 − |v|²/(3w²)).
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12) * (1.0 - sq / 3.0),
                  angle / n)
    return k * v


def positive_hemisphere(q):
    """Flip sign so w ≥ 0 (``unifyQuaternion``, math_tools.h)."""
    return jnp.where(q[..., 0:1] >= 0, q, -q)


def qleft(q):
    """Left-multiplication matrix: mul(q, p) == Qleft(q) @ p.

    Matches ``Qleft`` (math_tools.h) up to our wxyz component order.
    """
    w = q[..., 0]
    x, y, z = q[..., 1], q[..., 2], q[..., 3]
    zero = jnp.zeros_like(w)
    m = jnp.stack([
        w, -x, -y, -z,
        x, w, -z, y,
        y, z, w, -x,
        z, -y, x, w,
    ], axis=-1).reshape(q.shape[:-1] + (4, 4))
    del zero
    return m


def qright(p):
    """Right-multiplication matrix: mul(q, p) == Qright(p) @ q."""
    w = p[..., 0]
    x, y, z = p[..., 1], p[..., 2], p[..., 3]
    m = jnp.stack([
        w, -x, -y, -z,
        x, w, z, -y,
        y, -z, w, x,
        z, y, -x, w,
    ], axis=-1).reshape(p.shape[:-1] + (4, 4))
    return m


def slerp(q0, q1, t):
    """Spherical interpolation (deskew path, ``Preprocessing.cpp:176-200``)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = trig.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = trig.sin(theta)
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, trig.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, trig.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def slerp_np(q0, q1, t):
    """Numpy twin of ``slerp`` for host-side preprocessing (single pair;
    avoids a device dispatch per repaired pose)."""
    import numpy as _np
    q0 = _np.asarray(q0, float)
    q1 = _np.asarray(q1, float)
    d = float(q0 @ q1)
    if d < 0:
        q1, d = -q1, -d
    theta = _np.arccos(min(max(d, -1.0), 1.0))
    if _np.sin(theta) < 1e-6:
        out = (1.0 - t) * q0 + t * q1
    else:
        out = (_np.sin((1.0 - t) * theta) * q0
               + _np.sin(t * theta) * q1) / _np.sin(theta)
    return out / _np.linalg.norm(out)


def mul_np(q1, q2):
    """Numpy twin of ``mul`` for host-side scalar work (single pair;
    avoids a device dispatch per pose in host-chained loops)."""
    import numpy as _np
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return _np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def rotate_np(q, v):
    """Numpy twin of ``rotate`` (same expanded 15-mul form)."""
    import numpy as _np
    u, w = _np.asarray(q[1:4]), q[0]
    uv = _np.cross(u, v)
    return _np.asarray(v) + 2.0 * (w * uv + _np.cross(u, uv))


def from_ypr(ypr):
    """ZYX Euler (yaw, pitch, roll, radians) → quaternion.

    Matches ``Utility::ypr2R`` (common.h:175-200) composition Rz·Ry·Rx.
    """
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = trig.cos(y / 2), trig.sin(y / 2)
    cp, sp = trig.cos(p / 2), trig.sin(p / 2)
    cr, sr = trig.cos(r / 2), trig.sin(r / 2)
    return jnp.stack([
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    ], axis=-1)


def to_ypr(q):
    """Quaternion → ZYX Euler (yaw, pitch, roll), matches ``Utility::R2ypr``."""
    R = to_rotmat(q)
    y = trig.arctan2(R[..., 1, 0], R[..., 0, 0])
    p = trig.arctan2(-R[..., 2, 0], jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2))
    r = trig.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([y, p, r], axis=-1)


def g2q(g):
    """Gravity-aligning rotation with zero yaw (``Utility::g2R``).

    Returns q such that R(q) @ normalize(g) == [0, 0, 1] and yaw(q) == 0.
    """
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # Rotation taking ng1 to ng2.
    axis = jnp.cross(ng1, ng2)
    s = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.sum(ng1 * ng2, axis=-1, keepdims=True)
    angle = trig.arctan2(s, c)
    axis = axis / jnp.where(s < 1e-12, 1.0, s)
    q0 = exp(angle * axis)
    # Remove yaw.
    yaw = to_ypr(q0)[..., 0:1]
    zero = jnp.zeros_like(yaw)
    q_unyaw = from_ypr(jnp.concatenate([-yaw, zero, zero], axis=-1))
    return mul(q_unyaw, q0)
