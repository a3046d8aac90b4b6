"""Multi-chip banded PCG: time-sharded over a device mesh.

The batch factor graph's normal equations are block-banded along time
(SURVEY.md §5): if the trajectory ever exceeds one chip, the band shards
cleanly along time across ICI with halo exchange of ``hw`` poses.  This
module implements exactly that:

* mesh axes: ``dp`` (independent episodes/problems) × ``sp`` (time axis of
  one problem — the sequence-parallel axis),
* the banded matvec exchanges hw-row halos with ring neighbors via
  ``jax.lax.ppermute`` (pure ICI traffic),
* CG dot products reduce with ``psum`` over ``sp`` only — each ``dp`` row
  of the mesh solves an independent system,
* block-Jacobi preconditioning stays device-local.

This replaces nothing in the reference (its batch solve is a single-thread
Ceres Cholesky); it is the TPU-native scaling path the reference lacks.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _halo_matvec(band_l, x_l, hw, axis_name):
    """Local banded matvec with halo exchange along `axis_name`.

    band_l: (nb, Tl, 2*hw+1, D, D) local block rows.
    x_l:    (nb, Tl, D) local vector rows.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # Receive the last hw rows of the LEFT neighbor and first hw of RIGHT.
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    # ppermute zero-fills receivers with no sender (shard 0 gets no left
    # halo, shard n-1 no right halo) — exactly the banded system's zero
    # boundary condition. Asserted by
    # tests/test_parallel.py::TestHaloBoundary.
    left_halo = jax.lax.ppermute(x_l[:, -hw:], axis_name, fwd) if n > 1 \
        else jnp.zeros_like(x_l[:, :hw])
    right_halo = jax.lax.ppermute(x_l[:, :hw], axis_name, bwd) if n > 1 \
        else jnp.zeros_like(x_l[:, :hw])
    x_ext = jnp.concatenate([left_halo, x_l, right_halo], axis=1)

    B = band_l.shape[2]
    y = jnp.zeros_like(x_l)
    Tl = x_l.shape[1]
    for o in range(B):
        xs = jax.lax.dynamic_slice_in_dim(x_ext, o, Tl, axis=1)
        y = y + jnp.einsum("ntij,ntj->nti", band_l[:, :, o], xs)
    return y


def make_sharded_pcg(mesh, hw: int, iters: int = 60,
                     dp_axis: str = "dp", sp_axis: str = "sp"):
    """Build a shard_map'ed PCG solver over `mesh`.

    Returns solve(band, b) for band (NB, T, 2*hw+1, D, D), b (NB, T, D)
    with NB sharded over dp and T sharded over sp.
    """

    def body(band_l, b_l):
        D = b_l.shape[-1]
        diag = band_l[:, :, hw]
        L = jnp.linalg.cholesky(diag + 1e-12 * jnp.eye(D, dtype=band_l.dtype))

        def precond(r):
            y = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)
            z = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, -1, -2), y, lower=False)
            return z[..., 0]

        def dot(a, c):
            # Per-episode dot: reduce local rows + psum over the time axis.
            local = jnp.sum(a * c, axis=(1, 2))
            return jax.lax.psum(local, sp_axis)           # (nb,)

        mv = partial(_halo_matvec, hw=hw, axis_name=sp_axis)

        x = jnp.zeros_like(b_l)
        r = b_l - mv(band_l, x)
        z = precond(r)
        p = z
        rz = dot(r, z)

        def step(carry, _):
            x, r, p, rz = carry
            Ap = mv(band_l, p)
            pAp = dot(p, Ap)
            alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, 1e-300), 0.0)
            x = x + alpha[:, None, None] * p
            r = r - alpha[:, None, None] * Ap
            z = precond(r)
            rz_new = dot(r, z)
            beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-300), 0.0)
            p = z + beta[:, None, None] * p
            return (x, r, p, rz_new), None

        (x, r, _, _), _ = jax.lax.scan(step, (x, r, p, rz), None,
                                       length=iters)
        res = jnp.sqrt(jnp.maximum(dot(r, r), 0.0))
        return x, res

    sharded = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
        out_specs=(P(dp_axis, sp_axis), P(dp_axis)),
    ))

    sp = mesh.shape[sp_axis]
    dp = mesh.shape[dp_axis]

    def solve(band, b):
        nb, T = b.shape[0], b.shape[1]
        if T % sp != 0 or nb % dp != 0:
            # shard_map requires exact divisibility; pad the trajectory to
            # a multiple of the mesh (identity diagonal blocks + zero rhs
            # rows are exact no-ops for the solution of the real rows).
            raise ValueError(
                f"(NB={nb}, T={T}) not divisible by mesh (dp={dp}, "
                f"sp={sp}); pad T to a multiple of sp with identity "
                f"diagonal blocks and zero rhs (and NB to a multiple of "
                f"dp) before calling.")
        return sharded(band, b)

    return solve
