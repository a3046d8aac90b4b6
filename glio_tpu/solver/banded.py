"""Block-banded Gauss-Newton systems: assembly, matvec, PCG.

The reference's batch stage re-solves ALL keyframes every 10 new ones with
Ceres SPARSE_NORMAL_CHOLESKY (``Estimator.cpp:3275-3284``).  Its normal
equations have a banded block structure: every factor couples poses at
most ``search_range``(=6) apart, plus per-epoch GNSS blocks bound to
consecutive poses (SURVEY.md §5 "long-context" analogue).

Solver hierarchy (all exact or iteratively refined, chosen per context):

* ``cyclic_reduction_solve`` — the default DIRECT solver: the SPD
  elimination restructured into log2(T) levels of batched super-block
  ops (a sequential banded Cholesky serializes T tiny steps — 18× slower
  on TPU in emulated f64, measured at T=2048);
* ``block_cholesky``/``direct_solve`` — the sequential factorization:
  kept for validation, for Woodbury (reusable factor), and as the f32
  preconditioner of ``pcg_chol_solve``;
* ``pcg_solve`` — block-Jacobi preconditioned CG: the MULTI-CHIP path
  (its banded matvec shards along time over a device mesh with ppermute
  halo exchange — glio_tpu.parallel.banded_pcg); needs O(T) iterations
  on stiff chains, so single-chip paths prefer the direct solvers.
"""

from functools import partial, wraps
from typing import NamedTuple

import jax
import jax.numpy as jnp


def f32_matmul_precision(fn):
    """Trace `fn` under full-f32 matmul precision.

    TPU f32 matmuls default to bf16 MXU passes (~3 significant digits) —
    enough to DERAIL the mixed-precision solvers: measured on the full
    Whampoa problem, the batch LM stalled at 20 m RMSE on TPU while the
    identical code reached 8.6 m on CPU (true-f32 matmuls). "highest"
    uses the 6-pass bf16 scheme (f32-equivalent), still ~6× cheaper than
    emulated f64."""
    @wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapper


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


# --- Parallel direct solve: block cyclic reduction ---------------------------
#
# The sequential block-banded Cholesky is a T-step scan — fine on CPU,
# latency-bound on TPU (every step is a handful of tiny matmuls). Cyclic
# reduction restructures the SAME exact elimination into log2(N) levels of
# BATCHED super-block operations: group hw consecutive block-rows into one
# super-row (bandwidth hw ⇒ super-rows couple only to neighbors ⇒ block-
# TRIDIAGONAL), then repeatedly eliminate the odd super-rows — each level
# is one batched Cholesky + a few batched matmuls over all odd rows at
# once. SPD is preserved level to level (each reduction is a symmetric
# Schur complement), so no pivoting is needed.


def _spd_solve_batched(B, X):
    """Solve B @ Y = X for a batch of SPD blocks (..., S, S)."""
    L = jnp.linalg.cholesky(B)
    Y = jax.scipy.linalg.solve_triangular(L, X, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), Y, lower=False)


def band_to_tridiag(band):
    """Block-band (T, 2hw+1, D, D) → block-tridiagonal super-rows.

    Returns (A, B, C, n_sup, S): B (N, S, S) diagonal super-blocks,
    A (N, S, S) sub-diagonal (A[0] = 0), C (N, S, S) super-diagonal
    (C[N-1] = 0), with S = hw·D and T padded to N·hw by identity rows
    (decoupled — they solve to b=0 exactly).
    """
    T, Bw, D, _ = band.shape
    hw = (Bw - 1) // 2
    S = hw * D
    N = -(-T // hw)
    Tp = N * hw
    pad = Tp - T
    if pad:
        band = jnp.concatenate(
            [band, jnp.zeros((pad, Bw, D, D), band.dtype)
             .at[:, hw].set(jnp.eye(D, dtype=band.dtype))], axis=0)
    # Row t = I·hw + r couples to column t + (o − hw); within super-row I
    # that is column slot c = r + o − hw; within super-row I+1 it is
    # c' = r + o − hw − hw.
    Bsup = jnp.zeros((N, S, S), band.dtype)
    Csup = jnp.zeros((N, S, S), band.dtype)
    rows = band.reshape(N, hw, Bw, D, D)
    for r in range(hw):
        for o in range(Bw):
            c = r + o - hw
            blk = rows[:, r, o]
            if 0 <= c < hw:
                Bsup = Bsup.at[:, r*D:(r+1)*D, c*D:(c+1)*D].set(blk)
            elif hw <= c < 2 * hw:
                cc = c - hw
                Csup = Csup.at[:, r*D:(r+1)*D, cc*D:(cc+1)*D].set(blk)
            # c < 0 lands in the PREVIOUS super-row's C (symmetric): the
            # sub-diagonal A is reconstructed from C below.
    Asup = jnp.concatenate(
        [jnp.zeros((1, S, S), band.dtype),
         jnp.swapaxes(Csup[:-1], -1, -2)], axis=0)
    return Asup, Bsup, Csup, N, S


@f32_matmul_precision
def tridiag_cr_solve(A, Bm, C, r):
    """Block-tridiagonal solve via cyclic reduction, multi-RHS.

    A, Bm, C: (N, S, S) sub/main/super-diagonal blocks (A[0] = C[N-1] = 0);
    the system must be SPD (every level's diagonal blocks stay SPD under
    the symmetric Schur reductions, so no pivoting). r: (N, S, K) RHS
    columns — the multi-RHS form is what the SPIKE-partitioned multi-chip
    solver needs (interior elimination against 2S+1 columns at once).
    Returns x: (N, S, K).
    """
    S = Bm.shape[-1]
    dtype = Bm.dtype
    K = r.shape[-1]

    # Pad to odd count so every level has a well-defined even set
    # (identity rows decouple).
    levels = []
    while A.shape[0] > 2:
        n = A.shape[0]
        n_before_pad = n
        if n % 2 == 0:
            eyeS = jnp.eye(S, dtype=dtype)
            A = jnp.concatenate([A, jnp.zeros((1, S, S), dtype)])
            Bm = jnp.concatenate([Bm, eyeS[None]])
            C = jnp.concatenate([C, jnp.zeros((1, S, S), dtype)])
            r = jnp.concatenate([r, jnp.zeros((1, S, K), dtype)])
            n += 1
        odd_A, odd_B, odd_C = A[1::2], Bm[1::2], C[1::2]
        odd_r = r[1::2]
        # Factor all odd diagonal blocks at once.
        BiA = _spd_solve_batched(odd_B, odd_A)          # B_j⁻¹ A_j
        BiC = _spd_solve_batched(odd_B, odd_C)          # B_j⁻¹ C_j
        Bir = _spd_solve_batched(odd_B, odd_r)          # (n_odd, S, K)
        levels.append((n_before_pad, BiA, BiC, Bir))
        ev_A, ev_B, ev_C, ev_r = A[0::2], Bm[0::2], C[0::2], r[0::2]
        n_ev = ev_A.shape[0]
        # Even row i (global 2k) couples to odd neighbors 2k−1 (left,
        # index k−1 in odd arrays) and 2k+1 (right, index k).
        # Left contributions (absent for k=0):
        zl = jnp.zeros((1, S, S), dtype)
        zv = jnp.zeros((1, S, K), dtype)
        L_BiC = jnp.concatenate([zl, BiC[:n_ev - 1]])
        L_BiA = jnp.concatenate([zl, BiA[:n_ev - 1]])
        L_Bir = jnp.concatenate([zv, Bir[:n_ev - 1]])
        # Right contributions (absent for the last even row if no odd
        # follows it):
        def rpad(x, z):
            return (x if x.shape[0] == n_ev
                    else jnp.concatenate([x, z[:n_ev - x.shape[0]]]))
        R_BiA = rpad(BiA, zl)
        R_BiC = rpad(BiC, zl)
        R_Bir = rpad(Bir, zv)
        Bm = (ev_B
              - jnp.matmul(ev_A, L_BiC)
              - jnp.matmul(ev_C, R_BiA))
        r = (ev_r
             - jnp.matmul(ev_A, L_Bir)
             - jnp.matmul(ev_C, R_Bir))
        A = -jnp.matmul(ev_A, L_BiA)
        C = -jnp.matmul(ev_C, R_BiC)
        A = A.at[0].set(0.0)
        C = C.at[-1].set(0.0)

    # Base case: 1 or 2 super-rows — one dense SPD solve.
    n0 = A.shape[0]
    if n0 == 1:
        x = _spd_solve_batched(Bm[0], r[0])[None]
    else:
        H2 = jnp.zeros((2 * S, 2 * S), dtype)
        H2 = H2.at[:S, :S].set(Bm[0]).at[S:, S:].set(Bm[1])
        H2 = H2.at[:S, S:].set(C[0]).at[S:, :S].set(A[1])
        x = _spd_solve_batched(H2, r.reshape(2 * S, K))
        x = x.reshape(2, S, K)

    # Back-substitution through the levels in reverse.
    for n_before_pad, BiA, BiC, Bir in reversed(levels):
        n_odd = BiA.shape[0]
        # Odd row j=2k+1 uses even neighbors x_even[k] (left) and
        # x_even[k+1] (right — always present: the level was padded to an
        # odd count, so evens outnumber odds by one).
        xl = x[:n_odd]
        xr = x[1:n_odd + 1]
        x_odd = (Bir
                 - jnp.matmul(BiA, xl)
                 - jnp.matmul(BiC, xr))
        # Interleave to this level's (padded) ordering, then trim the
        # padding row so the parent sees its original even count.
        n_prev = x.shape[0] + n_odd
        out = jnp.zeros((n_prev, S, K), dtype)
        out = out.at[0::2].set(x[: (n_prev + 1) // 2])
        out = out.at[1::2].set(x_odd)
        x = out[:n_before_pad]

    return x


@partial(jax.jit, static_argnames=())
def cyclic_reduction_solve(band, b):
    """Exact banded solve via block cyclic reduction (log-depth).

    Same answer as ``direct_solve`` to round-off; every level is batched
    work, so on TPU it replaces ~T sequential steps with ~log2(T) batched
    Cholesky/matmul rounds (measured ~20× at T=2048 in f64)."""
    T, Bw, D, _ = band.shape
    hw = (Bw - 1) // 2
    A, Bm, C, N, S = band_to_tridiag(band)
    bsup = jnp.zeros((N * hw, D), band.dtype).at[:T].set(b)
    r = bsup.reshape(N, S)
    x = tridiag_cr_solve(A, Bm, C, r[..., None])[..., 0]
    return x.reshape(-1, D)[:T]


@partial(jax.jit, static_argnames=("refine",))
@f32_matmul_precision
def cyclic_reduction_solve_mixed(band, b, refine: int = 2):
    """Equilibrated f32 cyclic reduction + f64 iterative refinement.

    Round-3 profile (T=2048 real Whampoa problem, real chip): the f64
    cyclic reduction is 218 ms — 83% of every batch LM iteration — and
    TPU f64 is emulated at ~10× f32 cost. Jacobi equilibration compresses
    the w=10000-attitude/w≈0.1-GNSS spread so an f32 elimination holds
    ~1e-3..1e-5 relative error at the Marquardt-damped conditioning, and
    each refinement pass (exact f64 banded residual + another f32 solve)
    multiplies the error by that factor — `refine=2` reaches ~1e-8 step
    accuracy, far below what the LM accept/reject distinguishes.
    """
    T, Bw, D, _ = band.shape
    hw = (Bw - 1) // 2
    band_s, s = _equilibrate(band)
    A, Bm, C, N, S = band_to_tridiag(band_s.astype(jnp.float32))

    def solve32(rhs64):
        rs = (rhs64 * s).astype(jnp.float32)
        rsup = jnp.zeros((N * hw, D), jnp.float32).at[:T].set(rs)
        y = tridiag_cr_solve(A, Bm, C, rsup.reshape(N, S)[..., None])
        return y[..., 0].reshape(-1, D)[:T].astype(band.dtype) * s

    x = solve32(b)
    for _ in range(refine):
        r = b - band_matvec(band, x)
        x = x + solve32(r)
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


def selected_inverse_diag(band):
    """Per-block diagonal of the inverse of a banded SPD matrix.

    Returns (T, D, D): the D×D diagonal blocks of H⁻¹ — the marginal
    covariances of a Gauss-Newton system assembled at its solution. The
    reference publishes poses only; an estimation framework should also
    expose their uncertainty (the LC stage's covariance gating of fixes,
    Estimator.cpp:1963-1969, is the closest the reference gets).

    Method: block-tridiagonal selected inversion over the hw·D super-rows
    (``band_to_tridiag``), classic two-sided recursion:

        U_1 = B_1,   U_i = B_i − A_i U_{i−1}⁻¹ A_iᵀ     (forward scan)
        V_N = B_N,   V_i = B_i − C_i V_{i+1}⁻¹ C_iᵀ     (backward scan)
        Σ_ii = (U_i + V_i − B_i)⁻¹

    — U_i carries all information left of i, V_i all information right,
    each an exact Schur complement, so Σ_ii is the exact (i, i) block of
    the full inverse. O(T/hw) sequential S×S Cholesky steps; the identity
    padding rows decouple and are dropped.
    """
    T, Bw, D, _ = band.shape
    A, Bm, C, N, S = band_to_tridiag(band)

    def fwd(U_prev, inp):
        Ai, Bi = inp
        U = Bi - Ai @ _spd_solve_batched(U_prev, jnp.swapaxes(Ai, -1, -2))
        return U, U

    _, U = jax.lax.scan(fwd, Bm[0], (A[1:], Bm[1:]))
    U = jnp.concatenate([Bm[:1], U], axis=0)

    def bwd(V_next, inp):
        Ci, Bi = inp
        V = Bi - Ci @ _spd_solve_batched(V_next, jnp.swapaxes(Ci, -1, -2))
        return V, V

    _, V = jax.lax.scan(bwd, Bm[-1], (C[:-1], Bm[:-1]), reverse=True)
    V = jnp.concatenate([V, Bm[-1:]], axis=0)

    M = U + V - Bm                               # (N, S, S) information
    Sig = _spd_solve_batched(M, jnp.broadcast_to(
        jnp.eye(S, dtype=band.dtype), M.shape))  # (N, S, S) covariance
    # Extract the D×D diagonal blocks of each super-row and unpad to T.
    hw = (Bw - 1) // 2
    Sig = Sig.reshape(N, hw, D, hw, D)
    diag = jnp.stack([Sig[:, r, :, r, :] for r in range(hw)], axis=1)
    return diag.reshape(N * hw, D, D)[:T]
