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
