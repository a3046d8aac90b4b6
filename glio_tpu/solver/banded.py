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


# --- Exact block-banded Cholesky (direct solver) -----------------------------
#
# PCG with block-Jacobi preconditioning stalls on long stiff chains (the
# batch problem couples poses with w≈20-10000 relative factors vs w≈0.1-1
# GNSS rows; long-wavelength modes need O(T) iterations). The reference
# solves the same system exactly with sparse Cholesky; this is the banded
# equivalent: an O(T·hw²·D³) lax.scan — 3.5k tiny sequential block steps,
# negligible next to assembly. PCG remains the multi-chip path.

def block_cholesky(band: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower block-banded Cholesky factor of a block-banded SPD matrix.

    band: (T, 2*hw+1, D, D) with band[t, hw+o] = H[t][t+o].
    Returns Lb: (T, hw+1, D, D) with Lb[t, m] = L[t][t−m] (m=0 diagonal).
    """
    T, B, D, _ = band.shape
    hw = (B - 1) // 2
    eyeD = jnp.eye(D, dtype=band.dtype)

    def step(window, row):
        # window[r] = Lb row (t−hw+r), r = 0..hw−1 (zeros for t−hw+r < 0).
        band_t, t = row
        new_row = jnp.zeros((hw + 1, D, D), band.dtype)
        # Columns left→right: j = t−m for m = hw..1, then the diagonal.
        for m in range(hw, 0, -1):
            # S = A[t][j] − Σ_k L[t][k] L[j][k]ᵀ, k in max(t−hw, j−hw)..j−1.
            S = band_t[hw - m]
            j_row = window[hw - m]          # Lb row of block-row j = t−m
            for k_off in range(1, hw - m + 1):
                # k = j − k_off; L[t][k] = new_row[m + k_off] (this row,
                # already computed since m+k_off > m), L[j][k] = j_row[k_off].
                if m + k_off <= hw:
                    S = S - new_row[m + k_off] @ j_row[k_off].swapaxes(-1, -2)
            # L[t][j] = S · L[j][j]^{-T}
            Ljj = j_row[0]
            # Solve X Ljjᵀ = S  ⇒  Ljj Xᵀ = Sᵀ (forward-triangular).
            Xt = jax.scipy.linalg.solve_triangular(
                Ljj, S.swapaxes(-1, -2), lower=True)
            val = Xt.swapaxes(-1, -2)
            # Zero when the column is out of range (j < 0) — detected by a
            # zero diagonal block in the window.
            ok = jnp.abs(Ljj).sum() > 0
            new_row = new_row.at[m].set(jnp.where(ok, val, 0.0))
        # Diagonal: S = A[t][t] − Σ_{m=1..hw} L[t][t−m] L[t][t−m]ᵀ.
        S = band_t[hw]
        for m in range(1, hw + 1):
            S = S - new_row[m] @ new_row[m].swapaxes(-1, -2)
        Ltt = jnp.linalg.cholesky(S + jitter * eyeD)
        new_row = new_row.at[0].set(Ltt)
        window = jnp.concatenate([window[1:], new_row[None]], axis=0)
        return window, new_row

    init = jnp.zeros((hw, hw + 1, D, D), band.dtype)
    _, Lb = jax.lax.scan(step, init,
                         (band, jnp.arange(T, dtype=jnp.int32)))
    return Lb


def block_cholesky_solve(Lb: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b given the block-banded factor from block_cholesky."""
    T, HW1, D, _ = Lb.shape
    hw = HW1 - 1

    # Forward: L y = b.
    def fwd(window, row):
        Lrow, bt = row
        s = bt
        for m in range(1, hw + 1):
            s = s - Lrow[m] @ window[hw - m]
        y = jax.scipy.linalg.solve_triangular(Lrow[0], s, lower=True)
        window = jnp.concatenate([window[1:], y[None]], axis=0)
        return window, y

    init = jnp.zeros((hw, D), Lb.dtype)
    _, y = jax.lax.scan(fwd, init, (Lb, b))

    # Backward: Lᵀ x = y. Need U[t, m] = L[t+m][t]ᵀ = Lb[t+m, m]ᵀ.
    U = jnp.zeros((T, hw, D, D), Lb.dtype)
    for m in range(1, hw + 1):
        shifted = jnp.roll(Lb[:, m], -m, axis=0)
        idx = jnp.arange(T)
        ok = idx + m < T
        U = U.at[:, m - 1].set(
            jnp.where(ok[:, None, None], shifted.swapaxes(-1, -2), 0.0))

    def bwd(window, row):
        Ldiag, Ut, yt = row
        s = yt
        for m in range(1, hw + 1):
            s = s - Ut[m - 1] @ window[m - 1]
        x = jax.scipy.linalg.solve_triangular(
            Ldiag.swapaxes(-1, -2), s, lower=False)
        window = jnp.concatenate([x[None], window[:-1]], axis=0)
        return window, x

    initb = jnp.zeros((hw, D), Lb.dtype)
    _, x_rev = jax.lax.scan(bwd, initb,
                            (Lb[::-1, 0], U[::-1], y[::-1]))
    return x_rev[::-1]


@partial(jax.jit, static_argnames=())
def direct_solve(band, b, jitter: float = 1e-12):
    """Exact banded solve: block Cholesky + two substitution sweeps."""
    Lb = block_cholesky(band, jitter=jitter)
    return block_cholesky_solve(Lb, b)


def _equilibrate(band):
    """Symmetric Jacobi scaling: returns (band_scaled, s) with
    band_s[t,o,i,j] = band[t,o,i,j]·s[t,i]·s[t+o−hw,j], s = diag^(−1/2).

    Kills the 1e8-scale spread between attitude (w=10000 factors) and
    translation blocks so an f32 factorization stays well-conditioned."""
    T, B, D, _ = band.shape
    hw = (B - 1) // 2
    diag = jnp.diagonal(band[:, hw], axis1=-2, axis2=-1)       # (T, D)
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-12))
    idx = jnp.arange(T)
    cols = []
    for o in range(B):
        shift = o - hw
        sc = jnp.roll(s, -shift, axis=0)
        ok = (idx + shift >= 0) & (idx + shift < T)
        cols.append(jnp.where(ok[:, None], sc, 0.0))
    S_col = jnp.stack(cols, axis=1)                            # (T, B, D)
    return band * s[:, None, :, None] * S_col[:, :, None, :], s


def _f32_chol_precond(band, jitter: float = 3e-4):
    """Equilibrated f32 block-banded Cholesky preconditioner.

    Returns (apply(r) → M⁻¹r in f64, scale s). Rows whose f32 Schur
    complement breaks down (observed on TPU at the chain's end) fall
    back to the unit diagonal — M stays SPD; the consumer (PCG /
    refinement) works against the exact f64 band."""
    band_s, s = _equilibrate(band)
    Lb = block_cholesky(band_s.astype(jnp.float32), jitter=jitter)
    bad = ~jnp.isfinite(Lb).all(axis=(1, 2, 3))
    eye_row = jnp.zeros_like(Lb[0]).at[0].set(
        jnp.eye(Lb.shape[-1], dtype=Lb.dtype))
    Lb = jnp.where(bad[:, None, None, None], eye_row[None], Lb)

    def apply(r):
        y = block_cholesky_solve(Lb, (r * s).astype(jnp.float32))
        return y.astype(band.dtype) * s

    return apply


@partial(jax.jit, static_argnames=("iters",))
def pcg_chol_solve(band, b, iters: int = 14, jitter: float = 3e-4):
    """CG on the exact f64 band, preconditioned by the f32 banded
    Cholesky factor.

    The f64 sequential factorization dominates the batch stage on TPU
    (emulated f64: 4.3 s at T=2048); a pure-f32 factor + stationary
    refinement DIVERGES on long stiff chains (factor error O(1) after
    thousands of cancelling Schur steps). Krylov iteration tolerates the
    imperfect factor: ~10 iterations recover ~1e-6 step accuracy at
    ~10× the speed of the exact factorization."""
    apply_M = _f32_chol_precond(band, jitter)
    x0 = jnp.zeros_like(b)
    r0 = b - band_matvec(band, x0)
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def step(carry, _):
        x, r, p, rz = carry
        Ap = band_matvec(band, p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, 1e-300), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-300), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, r, _, _), _ = jax.lax.scan(step, (x0, r0, p0, rz0), None,
                                   length=iters)
    return x


@partial(jax.jit, static_argnames=("refine",))
def direct_solve_mixed(band, b, refine: int = 2, jitter: float = 3e-4):
    """Banded solve with an f32 factorization + f64 iterative refinement.

    The exact block-banded Cholesky is a T-step sequential scan of tiny
    6×6 ops; in emulated f64 on TPU it dominates the whole batch stage
    (measured 4.3 s per solve at T=2048). Equilibrate → factor once in
    f32 (native) → refine the f64 residual through the same factor.
    Step accuracy reaches ~1e-6 relative in 2 refinements for LM-damped
    systems; the LM accept/reject re-evaluates the true cost anyway.
    The jitter (on the equilibrated unit diagonal) is deliberately fat:
    the LAST block row's f32 Schur complement can go indefinite on TPU
    (accumulation-order dependent — observed at T=2048); the refinement
    sweeps remove the resulting bias from the returned step."""
    band_s, s = _equilibrate(band)
    Lb = block_cholesky(band_s.astype(jnp.float32), jitter=jitter)
    # Guard: any non-finite factor row (f32 breakdown despite the jitter)
    # falls back to its (unit-scaled) diagonal — keeps the solve finite;
    # refinement against the exact f64 band corrects the step.
    bad = ~jnp.isfinite(Lb).all(axis=(1, 2, 3))
    eye_row = jnp.zeros_like(Lb[0]).at[0].set(
        jnp.eye(Lb.shape[-1], dtype=Lb.dtype))
    Lb = jnp.where(bad[:, None, None, None], eye_row[None], Lb)
    y = block_cholesky_solve(Lb, (b * s).astype(jnp.float32))
    x = y.astype(band.dtype) * s
    for _ in range(refine):
        r = b - band_matvec(band, x)
        dy = block_cholesky_solve(Lb, (r * s).astype(jnp.float32))
        x = x + dy.astype(band.dtype) * s
    return x


def woodbury_solve(band, b, J_extra, r_extra, jitter: float = 1e-12):
    """Solve (H_band + J_extraᵀ J_extra) x = b − J_extraᵀ r_extra.

    Loop-closure edges violate the band structure; with few of them the
    system is banded + low-rank, so Woodbury turns it into banded solves
    plus a small dense solve:
        S := H_band⁻¹ (via block Cholesky)
        x = S b' − S Jᵀ (I + J S Jᵀ)⁻¹ J S b'.

    J_extra: (L, T, D) dense rows of the extra residuals' Jacobian
    (L = number of extra residual rows, flattened over factors).
    """
    T, B, D, _ = band.shape
    Lb = block_cholesky(band, jitter=jitter)
    rhs = b - jnp.einsum("ltd,l->td", J_extra, r_extra)

    Sb = block_cholesky_solve(Lb, rhs)                     # (T, D)
    SJt = jax.vmap(lambda row: block_cholesky_solve(Lb, row))(J_extra)
    JSJt = jnp.einsum("ltd,mtd->lm", J_extra, SJt)
    L = J_extra.shape[0]
    core = jnp.eye(L, dtype=band.dtype) + JSJt
    JSb = jnp.einsum("ltd,td->l", J_extra, Sb)
    from .linalg import spd_solve
    w = spd_solve(core, JSb)
    return Sb - jnp.einsum("ltd,l->td", SJt, w)
