"""Multi-chip EXACT banded direct solve: SPIKE-partitioned cyclic reduction.

The round-2 multi-chip path was block-Jacobi PCG only — an iterative
solver that needs O(T) iterations on the production system's stiff chains
(``solver/banded.py`` module docs; the batch problem mixes w=10000
relative-attitude rows with w≈0.1 GNSS rows). This module replaces it
with a DIRECT solver that shards along time and returns the exact
solution, so the multi-chip path solves everything the single-chip
``cyclic_reduction_solve`` does:

1. band → block-tridiagonal super-rows (bandwidth hw ⇒ super-rows of
   S = hw·D couple only to neighbors), globally, then shard the rows over
   the ``sp`` mesh axis;
2. each shard Schur-eliminates its INTERIOR super-rows against its two
   boundary rows with a shard-local multi-RHS cyclic reduction
   (``solver.banded.tridiag_cr_solve`` — batched MXU work, no
   cross-device traffic);
3. the reduced block-tridiagonal system over the 2·n_dev interface rows
   is ``all_gather``-ed (a few S×S blocks per device — one small ICI
   collective) and solved redundantly on every device;
4. shards back-substitute their interiors locally.

This is the classic partition/SPIKE method for banded systems, expressed
with ``shard_map`` + ``all_gather`` over ICI. Exactness: every step is an
exact symmetric Schur complement, so the result matches the single-chip
direct solve to round-off — asserted by tests/test_parallel.py on stiff
chains with the real weight spread.

Nothing in the reference corresponds to this (its batch solve is
single-thread Ceres sparse Cholesky, ``Estimator.cpp:3275-3284``); the
requirement is SURVEY.md §5's ICI mapping of the banded batch solve.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..solver.banded import band_to_tridiag, tridiag_cr_solve


def _partition_body(A_l, B_l, C_l, r_l, sp_axis: str):
    """Per-shard SPIKE elimination + reduced solve + back-substitution.

    A_l, B_l, C_l: (n_loc, S, S) local tridiagonal rows (A_l[0] couples to
    the previous shard's last row; zero on shard 0). r_l: (n_loc, S).
    """
    n_loc, S, _ = B_l.shape
    dtype = B_l.dtype
    n_dev = jax.lax.axis_size(sp_axis)
    idx = jax.lax.axis_index(sp_axis)

    Bt, Bb = B_l[0], B_l[-1]
    At, Cb = A_l[0], C_l[-1]          # inter-shard couplings (stay)
    Ct, Ab = C_l[0], A_l[-1]          # couplings into the local interior

    if n_loc > 2:
        # Interior tridiagonal system (rows 1..n_loc-2) and its couplings
        # to the shard's top/bottom boundary rows.
        A_I = A_l[1:-1].at[0].set(0.0)
        C_I = C_l[1:-1].at[-1].set(0.0)
        B_I = B_l[1:-1]
        Ft = A_l[1]                    # interior row 0 ← x_top
        Fb = C_l[-2]                   # interior row last ← x_bottom
        n_int = n_loc - 2
        # Multi-RHS interior solve: T_I⁻¹ [Ft-cols | Fb-cols | r_I].
        rhs = jnp.zeros((n_int, S, 2 * S + 1), dtype)
        rhs = rhs.at[0, :, :S].set(Ft)
        rhs = rhs.at[-1, :, S:2 * S].set(Fb)
        rhs = rhs.at[:, :, 2 * S].set(r_l[1:-1])
        sol = tridiag_cr_solve(A_I, B_I, C_I, rhs)
        Yt = sol[..., :S]              # (n_int, S, S)
        Yb = sol[..., S:2 * S]
        g = sol[..., 2 * S]            # (n_int, S)
        # Schur complement onto (top, bottom).
        S_tt = Bt - Ct @ Yt[0]
        S_tb = -Ct @ Yb[0]
        S_bt = -Ab @ Yt[-1]
        S_bb = Bb - Ab @ Yb[-1]
        rt = r_l[0] - Ct @ g[0]
        rb = r_l[-1] - Ab @ g[-1]
    else:
        # No interior: the boundary rows couple directly.
        S_tt, S_tb, S_bt, S_bb = Bt, Ct, Ab, Bb
        rt, rb = r_l[0], r_l[-1]

    # Reduced tridiagonal system over interface rows, global order
    # (t_0, b_0, t_1, b_1, ...): row t_j couples left to b_{j-1} via At_j,
    # row b_j couples right to t_{j+1} via Cb_j — all adjacent.
    redA = jnp.stack([At, S_bt])                   # (2, S, S)
    redB = jnp.stack([S_tt, S_bb])
    redC = jnp.stack([S_tb, Cb])
    redr = jnp.stack([rt, rb])                     # (2, S)

    gA = jax.lax.all_gather(redA, sp_axis).reshape(2 * n_dev, S, S)
    gB = jax.lax.all_gather(redB, sp_axis).reshape(2 * n_dev, S, S)
    gC = jax.lax.all_gather(redC, sp_axis).reshape(2 * n_dev, S, S)
    gr = jax.lax.all_gather(redr, sp_axis).reshape(2 * n_dev, S)
    # Boundary conditions of the reduced system.
    gA = gA.at[0].set(0.0)
    gC = gC.at[-1].set(0.0)
    # Solve redundantly on every device (2·n_dev rows — tiny).
    xr = tridiag_cr_solve(gA, gB, gC, gr[..., None])[..., 0]
    x_t = xr[2 * idx]
    x_b = xr[2 * idx + 1]

    if n_loc > 2:
        x_int = (g - jnp.einsum("nij,j->ni", Yt, x_t)
                 - jnp.einsum("nij,j->ni", Yb, x_b))
        x_l = jnp.concatenate([x_t[None], x_int, x_b[None]], axis=0)
    else:
        x_l = jnp.stack([x_t, x_b])
    return x_l


def make_sharded_cr_solve(mesh, hw: int, sp_axis: str = "sp"):
    """Build an exact sharded banded direct solver over ``mesh``.

    Returns solve(band, b): band (T, 2*hw+1, D, D), b (T, D) — global
    arrays; the solver converts to super-rows, pads so every shard holds
    ≥ 2 equal-size super-rows (identity padding rows decouple exactly),
    runs the SPIKE-partitioned elimination under ``shard_map``, and
    returns the exact (T, D) solution.
    """
    n_dev = mesh.shape[sp_axis]

    body = partial(_partition_body, sp_axis=sp_axis)
    sharded = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(sp_axis), P(sp_axis), P(sp_axis), P(sp_axis)),
        out_specs=P(sp_axis),
    ))

    @partial(jax.jit, static_argnames=())
    def solve(band, b):
        T, Bw, D, _ = band.shape
        A, Bm, C, N, S = band_to_tridiag(band)
        r = jnp.zeros((N * hw, D), band.dtype).at[:T].set(b).reshape(N, S)
        # Pad the super-row count so every shard gets the same n_loc ≥ 2.
        n_loc = max(2, -(-N // n_dev))
        Np = n_loc * n_dev
        if Np > N:
            pad = Np - N
            eyeS = jnp.eye(S, dtype=band.dtype)
            A = jnp.concatenate([A, jnp.zeros((pad, S, S), band.dtype)])
            Bm = jnp.concatenate(
                [Bm, jnp.broadcast_to(eyeS, (pad, S, S))])
            C = jnp.concatenate([C, jnp.zeros((pad, S, S), band.dtype)])
            r = jnp.concatenate([r, jnp.zeros((pad, S), band.dtype)])
            # The last real row must not couple into the padding.
            # PLATFORM BUG (pinned by tests/test_parallel.py::TestSpikeCR
            # ::test_row_zero_before_shard_map_platform_workaround): a
            # scalar-broadcast row update `X.at[i].set(0.0)` feeding a
            # shard_map input inside the SAME jit miscompiles on this
            # platform's CPU SPMD lowering (odd shard-local rows get
            # zeroed; reproduced under both the Shardy and legacy GSPMD
            # partitioners). Mask-multiply is mathematically identical
            # and lowers safely.
            idx = jnp.arange(Np)
            C = C * (idx != N - 1)[:, None, None]
            A = A * (idx != N)[:, None, None]
        x = sharded(A, Bm, C, r)
        return x.reshape(-1, D)[:T]

    return solve
