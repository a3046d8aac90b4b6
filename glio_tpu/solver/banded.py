"""Block-banded Gauss-Newton systems: assembly, matvec, PCG.

The reference's batch stage re-solves ALL keyframes every 10 new ones with
Ceres SPARSE_NORMAL_CHOLESKY (``Estimator.cpp:3275-3284``).  Its normal
equations have a banded block structure: every factor couples poses at
most ``search_range``(=6) apart, plus per-epoch GNSS blocks bound to
consecutive poses (SURVEY.md §5 "long-context" analogue).

On TPU a sequential banded Cholesky would serialize ~3500 tiny steps; we
instead solve with **preconditioned conjugate gradients**:

* the banded matvec is a sum over 2·hw+1 block diagonals — each term is a
  batched (T, D, D)×(T, D) matmul, fully parallel on the MXU;
* block-Jacobi preconditioning (batched D×D Cholesky solves);
* everything is a fixed-iteration ``lax.scan`` — one XLA program.

The same matvec shards cleanly along time over a device mesh with halo
exchange of hw poses (see glio_tpu.parallel.banded_pcg).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BandedSystem(NamedTuple):
    """H in block-band storage.

    diag[t, o] holds the (D, D) block H[t, t + o − hw] (zero-padded out of
    range), so o = hw is the main diagonal. b is the gradient side.
    """
    band: jnp.ndarray   # (T, 2*hw+1, D, D)
    b: jnp.ndarray      # (T, D)

    @property
    def hw(self):
        return (self.band.shape[1] - 1) // 2


def band_matvec(band: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y[t] = Σ_o band[t, o] @ x[t + o − hw]  (zero outside range)."""
    T, B, D, _ = band.shape
    hw = (B - 1) // 2
    y = jnp.zeros_like(x)
    for o in range(B):
        shift = o - hw
        xs = jnp.roll(x, -shift, axis=0)
        # Zero the wrapped entries.
        idx = jnp.arange(T)
        ok = (idx + shift >= 0) & (idx + shift < T)
        xs = jnp.where(ok[:, None], xs, 0.0)
        y = y + jnp.einsum("tij,tj->ti", band[:, o], xs)
    return y


def scatter_add_blocks(band, rows, cols, blocks, hw):
    """band += blocks at (row, col) block coordinates (vectorized).

    rows, cols: (N,) int32 block indices with |col − row| ≤ hw.
    blocks: (N, D, D).
    """
    o = cols - rows + hw
    return band.at[rows, o].add(blocks)


@partial(jax.jit, static_argnames=("iters",))
def pcg_solve(band, b, iters: int = 100, tol: float = 1e-10):
    """Block-Jacobi preconditioned CG on the banded SPD system."""
    T, B, D, _ = band.shape
    hw = (B - 1) // 2
    diag = band[:, hw]                                     # (T, D, D)
    L = jnp.linalg.cholesky(
        diag + 1e-12 * jnp.eye(D, dtype=band.dtype))

    def precond(r):
        y = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)
        z = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False)
        return z[..., 0]

    x0 = jnp.zeros_like(b)
    r0 = b - band_matvec(band, x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def step(carry, _):
        x, r, p, rz = carry
        Ap = band_matvec(band, p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, 1e-300), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-300), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), rz_new

    (x, r, _, _), hist = jax.lax.scan(
        step, (x0, r0, p0, rz0), None, length=iters)
    return x, jnp.sqrt(jnp.maximum(jnp.sum(r * r), 0.0))
