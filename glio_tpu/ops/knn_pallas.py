"""Fused k-nearest-neighbor Pallas kernel.

The tiled-matmul kNN in ``glio_tpu.lidar.neighbors`` expresses the
distance computation well, but its running top-k merge lowers to repeated
``lax.top_k`` sorts over (Q, k + TILE) — the dominant cost.  This kernel
fuses the whole search for one query tile into VMEM:

* distances to a map tile via one MXU contraction
  (‖q−p‖² = ‖q‖² + ‖p‖² − 2 qᵀp),
* k iterations of masked row-min extraction per map tile (k=5 ≪ log-sort
  cost), merged against the running best via compare-insert,
* double-buffered accumulation entirely in VMEM — the map tile is
  re-streamed per query tile from HBM, the best-k state never leaves
  VMEM.

Interface matches ``neighbors.knn``; CPU fallback uses interpret mode.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38  # sentinel; inside kernels use _big() to stay strictly f32


def _knn_kernel(q_ref, qv_ref, p_ref, pv_ref, dist_ref, idx_ref,
                *, k: int, map_tile: int):
    """One grid step handles one query tile against the whole map."""
    # Strict f32 sentinel: a weak python float would promote to f64 under
    # x64 and hit unlegalizable f64->f32 truncation in Mosaic.
    big = jnp.asarray(BIG, jnp.float32)
    q = q_ref[:]                       # (QT, 8) padded coords
    qv = qv_ref[:]                     # (QT, 1) validity (0/1)
    QT = q.shape[0]
    n_map = p_ref.shape[0]
    n_tiles = n_map // map_tile

    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)          # (QT, 1)

    # Best-k state as k separate (QT,) vectors — column scatters are not
    # lowerable in Mosaic; an unrolled register file of vectors is.
    best_d = tuple(jnp.full((QT,), big, jnp.float32) for _ in range(k))
    best_i = tuple(jnp.full((QT,), -1, jnp.int32) for _ in range(k))

    def tile_body(t, carry):
        best_d, best_i = carry
        start = t * map_tile
        p = p_ref[pl.ds(start, map_tile), :]               # (MT, 8)
        pv = pv_ref[pl.ds(start, map_tile), :]             # (MT, 1)
        p_sq = jnp.sum(p * p, axis=-1)[None, :]            # (1, MT)
        cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32)
        d2 = q_sq + p_sq - 2.0 * cross                     # (QT, MT)
        d2 = jnp.where(pv[:, 0][None, :] > 0, d2, big)
        col = jax.lax.add(
            jax.lax.broadcasted_iota(jnp.int32, (QT, map_tile), 1),
            jax.lax.broadcast(start, (QT, map_tile)))

        # k rounds of min-extraction + sorted insertion (gather/scatter-free).
        def extract(j, state):
            d2, best_d, best_i = state
            m = jnp.min(d2, axis=1, keepdims=True)          # (QT, 1)
            hit = d2 <= m                                   # ties all masked
            mi = jnp.min(jnp.where(hit, col, jnp.int32(2147483647)), axis=1)
            d2 = jnp.where(hit, big, d2)
            carry_d = m[:, 0]
            carry_i = mi
            new_d = []
            new_i = []
            for slot in range(k):
                cur_d = best_d[slot]
                cur_i = best_i[slot]
                take = carry_d < cur_d
                new_d.append(jnp.where(take, carry_d, cur_d))
                new_i.append(jnp.where(take, carry_i, cur_i))
                carry_d = jnp.where(take, cur_d, carry_d)
                carry_i = jnp.where(take, cur_i, carry_i)
            return d2, tuple(new_d), tuple(new_i)

        d2, best_d, best_i = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(k), extract, (d2, best_d, best_i))
        return best_d, best_i

    best_d, best_i = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles),
                                       tile_body, (best_d, best_i))
    best_d = jnp.stack(best_d, axis=1)                     # (QT, k)
    best_i = jnp.stack(best_i, axis=1)
    valid_q = qv[:, 0] > 0
    dist_ref[:] = jnp.where(valid_q[:, None], best_d,
                            jnp.full_like(best_d, big))
    found = best_d < big
    idx_ref[:] = jnp.where(valid_q[:, None] & found, best_i,
                           jnp.full_like(best_i, -1))


@partial(jax.jit, static_argnames=("k", "query_tile", "map_tile",
                                   "interpret"))
def knn_pallas(query, query_valid, points, points_valid, k: int = 5,
               query_tile: int = 128, map_tile: int = 1024,
               interpret: bool = False):
    """Drop-in replacement for ``neighbors.knn`` backed by a Pallas kernel.

    Shapes are padded internally to tile multiples; coordinates pad from 3
    to 8 lanes (sublane-friendly, zero cost in the distance identity).
    """
    Q = query.shape[0]
    N = points.shape[0]
    qpad = (-Q) % query_tile
    npad = (-N) % map_tile

    def pad8(x, rows):
        out = jnp.zeros((x.shape[0] + rows, 8), jnp.float32)
        return out.at[:x.shape[0], :3].set(x.astype(jnp.float32))

    q8 = pad8(query, qpad)
    p8 = pad8(points, npad)
    qv = jnp.zeros((Q + qpad, 1), jnp.float32).at[:Q, 0].set(
        query_valid.astype(jnp.float32))
    pv = jnp.zeros((N + npad, 1), jnp.float32).at[:N, 0].set(
        points_valid.astype(jnp.float32))

    grid = ((Q + qpad) // query_tile,)
    # Trace the kernel in strict 32-bit mode: Mosaic is 32-bit and the
    # library enables global x64, which otherwise leaks i64/f64 scalars
    # into the kernel through weak-typed literals.
    with jax.enable_x64(False):
        dist, idx = _call(q8, qv, p8, pv, grid=grid, k=k,
                          query_tile=query_tile, map_tile=map_tile,
                          Q=Q, qpad=qpad, N=N, npad=npad,
                          interpret=interpret)
    return dist[:Q], idx[:Q]


def _call(q8, qv, p8, pv, *, grid, k, query_tile, map_tile, Q, qpad, N,
          npad, interpret):
    dist, idx = pl.pallas_call(
        partial(_knn_kernel, k=k, map_tile=map_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N + npad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N + npad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q + qpad, k), jnp.float32),
            jax.ShapeDtypeStruct((Q + qpad, k), jnp.int32),
        ],
        interpret=interpret,
    )(q8, qv, p8, pv)
    return dist, idx
