"""Dense inter-keyframe trajectory interpolation.

Counterpart of the reference's local pose-graph pass
(``Estimator::optimizeLocalGraph``, Estimator.cpp:3452-3527, driven from
``saveKeyFramesAndFactors`` :4274-4558): the 10 Hz non-key frames between
two keyframes are refined by a small chain — anchored at both bounding
keyframes (``LidarPoseLeft/RightFactorAutoDiff``, weight 0.2) with
relative-pose measurements between consecutive dense frames
(``LidarPoseFactorAutoDiff``, weight 0.2) from the odometry stream.

TPU design: every segment is independent → ONE vmapped solve over all
segments at once (the reference solves each with its own Ceres problem as
keyframes arrive).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..solver import dense
from ..utils import quat

F64 = jnp.float64
W_CHAIN = 0.2   # LidarPoseFactor.h:33-38 / :150-155


@partial(jax.jit, static_argnames=("max_dense",))
def interpolate_segments(kf_p, kf_q, rel_dp, rel_dq, rel_valid,
                         max_dense: int = 4, iters: int = 6):
    """Refine dense frames between consecutive keyframes.

    Args:
      kf_p, kf_q: (T, 3), (T, 4) keyframe poses (post sliding-window).
      rel_dp, rel_dq: (T-1, max_dense+1, 3/4) measured relative poses along
        each segment: hop j→j+1 where frame 0 is the left keyframe and the
        last valid hop ends at the right keyframe.
      rel_valid: (T-1, max_dense+1) hop validity. Hops are packed
        contiguously from slot 0 (data/ingest packing), so the per-segment
        hop count is the valid-slot count; segments with fewer than
        max_dense+1 hops tie the right keyframe at chain position
        n_hops — NOT at the padded end of the chain — so the terminal
        measured hop always lands on the right-keyframe anchor.

    Returns (p_dense, q_dense, valid): (T-1, max_dense, ...) interior
    dense-frame poses per segment (masked where segments are shorter).
    """
    T = kf_p.shape[0]
    n_seg = T - 1
    n_int = max_dense  # interior frames per segment (padded)

    def solve_segment(pl_, ql_, pr, qr, dp, dq, hop_valid):
        # Hops are left-packed, so the valid count locates the right
        # keyframe in the chain: hop n_hops−1 ends at the right anchor.
        n_hops = jnp.sum(hop_valid.astype(jnp.int32))
        # Initial guess: chain the relative measurements from the left.
        def init_step(carry, x):
            p_c, q_c = carry
            dpk, dqk, ok = x
            p_n = p_c + quat.rotate(q_c, dpk)
            q_n = quat.normalize(quat.mul(q_c, dqk))
            p_c = jnp.where(ok, p_n, p_c)
            q_c = jnp.where(ok, q_n, q_c)
            return (p_c, q_c), (p_c, q_c)

        (_, _), (p0s, q0s) = jax.lax.scan(
            init_step, (pl_, ql_), (dp[:n_int], dq[:n_int], hop_valid[:n_int]))

        def residual(x):
            p_i, q_i = x  # (n_int, 3), (n_int, 4)
            # Chain of poses: [left kf, interior..., right kf], with the
            # right keyframe substituted at position n_hops for short
            # segments (identical to the padded end when the segment is
            # full: n_hops = max_dense+1 → position max_dense+1).
            ps = jnp.concatenate([pl_[None], p_i, pr[None]], axis=0)
            qs = jnp.concatenate([ql_[None], q_i, qr[None]], axis=0)
            at_right = (jnp.arange(ps.shape[0]) == n_hops)[:, None]
            ps = jnp.where(at_right, pr[None], ps)
            qs = jnp.where(at_right, qr[None], qs)
            rq = 2.0 * quat.mul(quat.conj(dq),
                                quat.mul(quat.conj(qs[:-1]), qs[1:]))[:, 1:]
            rp = quat.rotate(quat.conj(qs[:-1]), ps[1:] - ps[:-1]) - dp
            m = hop_valid[:, None]
            return (W_CHAIN * jnp.where(
                m, jnp.concatenate([rq, rp], -1), 0.0)).reshape(-1)

        def retract(x, d):
            p_i, q_i = x
            dd = d.reshape(n_int, 6)
            return (p_i + dd[:, :3],
                    quat.normalize(quat.mul(q_i, quat.exp(dd[:, 3:6]))))

        out = dense.lm_solve(residual, retract, (p0s, q0s), n_int * 6,
                             max_iters=iters)
        return out.x

    p_int, q_int = jax.vmap(solve_segment)(
        kf_p[:-1], kf_q[:-1], kf_p[1:], kf_q[1:],
        rel_dp, rel_dq, rel_valid)
    interior_valid = rel_valid[:, 1:]  # hop j exists → interior frame j
    return p_int, q_int, interior_valid
