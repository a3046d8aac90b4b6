"""Window state pytree and tangent-space retraction.

The reference parameterizes each keyframe as trans[3] + quat[4] (Ceres
QuaternionParameterization) + speedBias[9] (+ per-frame rcv_dt[3] when GNSS
factors are enabled) — ``Estimator.cpp:2100-2148``.  We keep the same state
content but as struct-of-arrays over the window, with a local tangent
retraction q ⊞ δ = q ⊗ exp(δ) (equivalent optimum, simpler autodiff).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import quat

POSE_DOF = 15  # δp, δθ, δv, δba, δbg per keyframe.


class WindowState(NamedTuple):
    """Struct-of-arrays state for K keyframes."""
    p: jnp.ndarray    # (K, 3) position in local ENU world
    q: jnp.ndarray    # (K, 4) attitude body→world, wxyz
    v: jnp.ndarray    # (K, 3) velocity
    ba: jnp.ndarray   # (K, 3) accel bias
    bg: jnp.ndarray   # (K, 3) gyro bias

    @property
    def k(self):
        return self.p.shape[0]

    @staticmethod
    def identity(k, dtype=jnp.float64):
        return WindowState(
            p=jnp.zeros((k, 3), dtype),
            q=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (k, 1)),
            v=jnp.zeros((k, 3), dtype),
            ba=jnp.zeros((k, 3), dtype),
            bg=jnp.zeros((k, 3), dtype),
        )

    def tangent_dim(self):
        return self.k * POSE_DOF


def retract(state: WindowState, delta: jnp.ndarray) -> WindowState:
    """Apply a flat tangent vector (K*15,) to the window state."""
    d = delta.reshape(state.p.shape[0], POSE_DOF)
    return WindowState(
        p=state.p + d[:, 0:3],
        q=quat.normalize(quat.mul(state.q, quat.exp(d[:, 3:6]))),
        v=state.v + d[:, 6:9],
        ba=state.ba + d[:, 9:12],
        bg=state.bg + d[:, 12:15],
    )


def local_coordinates(state: WindowState, ref: WindowState) -> jnp.ndarray:
    """Inverse of retract: flat tangent of `state` around `ref` (K*15,).

    Used by the marginalization prior, mirroring the quaternion-aware Δx in
    ``MarginalizationFactor.cpp:233-287``.
    """
    dq = quat.mul(quat.conj(ref.q), state.q)
    d = jnp.concatenate([
        state.p - ref.p,
        quat.log(dq),
        state.v - ref.v,
        state.ba - ref.ba,
        state.bg - ref.bg,
    ], axis=-1)
    return d.reshape(-1)
