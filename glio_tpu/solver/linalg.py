"""Small dense linear algebra helpers that lower cleanly on TPU.

XLA:TPU implements LU decomposition only for f32 (``jnp.linalg.solve`` on
f64 fails to compile), while Cholesky / triangular-solve / eigh / QR are
dtype-generic.  Every Gauss-Newton system in this framework is SPD (+
damping), so all solves go through Cholesky.
"""

import jax
import jax.numpy as jnp


def spd_solve(H, b, jitter: float = 0.0):
    """Solve H x = b for symmetric positive-definite H (batched OK).

    Uses Cholesky + two triangular solves — the TPU-supported path for f64.
    """
    if jitter:
        H = H + jitter * jnp.eye(H.shape[-1], dtype=H.dtype)
    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)


def spd_solve_refined(H, b, refine: int = 2):
    """f64-accurate SPD solve with an f32 Cholesky factorization.

    TPU f64 is emulated and XLA's blocked Cholesky/triangular-solve loops
    pay ~6x for it (measured: 75x75 f64 solve 5.0 ms vs f32 0.8 ms on
    v5e); classical iterative refinement recovers f64 accuracy from the
    f32 factor: x += solve32(r) with the residual r = b − Hx accumulated
    in f64 (one cheap matmul per sweep). Two sweeps reach ~cond(H)·1e-13
    relative error — indistinguishable from the direct f64 solve for the
    well-damped Gauss-Newton systems here.

    H must be f64 (the residual accumulation dtype); returns f64.
    """
    H32 = H.astype(jnp.float32)
    L32 = jnp.linalg.cholesky(H32)

    def solve32(r):
        r32 = r.astype(jnp.float32)
        y = jax.scipy.linalg.solve_triangular(L32, r32, lower=True)
        z = jax.scipy.linalg.solve_triangular(L32, y, lower=True, trans=1)
        return z.astype(H.dtype)

    x = solve32(b)
    for _ in range(refine):
        r = b - H @ x
        x = x + solve32(r)
    return x


def chol_sqrt_refined(A, g=None):
    """f64-accurate upper-triangular S (SᵀS = A) from an f32 Cholesky.

    One Newton correction on the factor: with S₁ = chol32(A)ᵀ and
    E = A − S₁ᵀS₁ (computed in f64 — E is tiny, so f32 arithmetic *on E*
    keeps its relative precision), the unique upper-triangular correction
    solving S₁ᵀΔ + ΔᵀS₁ = E is Δ = (triu(M, 1) + ½·diag(M)) · S₁ with
    M = S₁⁻ᵀ E S₁⁻¹ (two cheap f32 triangular solves). Final error
    ~‖E‖²/‖A‖ ≈ f64 roundoff for well-damped GN systems.

    If ``g`` is given, also returns r0 with Sᵀ r0 = g (one refinement
    sweep, same f32 factor). Assumes A is SPD and f64.
    """
    F32 = jnp.float32
    L32 = jnp.linalg.cholesky(A.astype(F32))
    S1 = L32.T.astype(A.dtype)
    E = A - S1.T @ S1
    X = jax.scipy.linalg.solve_triangular(L32, E.astype(F32), lower=True)
    M = jax.scipy.linalg.solve_triangular(
        L32, X.T, lower=True).T.astype(A.dtype)   # S₁⁻ᵀ E S₁⁻¹
    Y = jnp.triu(M, 1) + 0.5 * jnp.diag(jnp.diag(M))
    S = S1 + Y @ S1
    if g is None:
        return S

    def tsolve32(r):
        return jax.scipy.linalg.solve_triangular(
            L32, r.astype(F32), lower=True).astype(A.dtype)

    r0 = tsolve32(g)
    r0 = r0 + tsolve32(g - S.T @ r0)
    return S, r0


def solve_3x3(A, b, eps: float = 0.0):
    """Closed-form 3×3 solve by adjugate/determinant (batched).

    Cheaper and more fusion-friendly than factorization for the huge
    batches of tiny plane-fit systems; works for any invertible A.
    """
    if eps:
        A = A + eps * jnp.eye(3, dtype=A.dtype)
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    # inv(A) = adj(A)ᵀ/det; here c is the cofactor matrix laid out so that
    # x_i = Σ_j cof_ji b_j / det.
    x0 = (c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)
