"""Fused k-nearest-neighbor Pallas kernel.

The tiled-matmul kNN in ``glio_tpu.lidar.neighbors`` expresses the
distance computation well, but its running top-k merge lowers to repeated
``lax.top_k`` sorts over (Q, k + TILE) — the dominant cost.  This kernel
fuses the search: a 2-D grid over (query tiles × map tiles); each step
computes one distance tile and folds its k smallest entries into the
best-k state held in the revisited output block (TPU grids iterate
sequentially, so output blocks indexed only by the query tile accumulate
across the map-tile dimension).

Mosaic constraints honoured (this build): strictly 32-bit inside the
kernel, no gather/scatter (min-extraction by comparison masks, sorted
insertion as an unrolled compare network), no skinny MXU matmuls.

Correctness is covered in interpret mode on CPU (tests/test_ops.py);
``neighbors.knn`` remains the default path in the models.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38


def _knn_kernel(q_ref, qv_ref, p_ref, pv_ref, dist_ref, idx_ref, *, k: int):
    big = jnp.asarray(BIG, jnp.float32)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dist_ref[:] = jnp.full_like(dist_ref[:], big)
        idx_ref[:] = jnp.full_like(idx_ref[:], -1)

    q = q_ref[:]                                   # (QT, 8)
    p = p_ref[:]                                   # (MT, 8)
    QT = q.shape[0]
    MT = p.shape[0]
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    p_sq = jnp.sum(p * p, axis=-1)[None, :]
    cross = jnp.zeros((QT, MT), jnp.float32)
    for c in range(3):
        cross = cross + q[:, c:c + 1] * p[:, c][None, :]
    d2 = q_sq + p_sq - 2.0 * cross
    d2 = jnp.where(pv_ref[:][:, 0][None, :] > 0, d2, big)
    start = j * MT
    col = jax.lax.add(
        jax.lax.broadcasted_iota(jnp.int32, (QT, MT), 1),
        jax.lax.broadcast(start, (QT, MT)))

    best_d = [dist_ref[:, s] for s in range(k)]
    best_i = [idx_ref[:, s] for s in range(k)]

    # k rounds of ascending-threshold min extraction; d2 is never mutated.
    m_prev = jnp.full((QT,), -1.0, jnp.float32)
    for _round in range(k):
        dj = jnp.where(d2 > m_prev[:, None], d2, big)
        m_j = jnp.min(dj, axis=1)
        hit = (d2 <= m_j[:, None]) & (d2 > m_prev[:, None])
        i_j = jnp.min(jnp.where(hit, col, jnp.int32(2147483647)), axis=1)
        carry_d, carry_i = m_j, i_j
        for s in range(k):
            take = carry_d < best_d[s]
            nd = jnp.where(take, carry_d, best_d[s])
            ni = jnp.where(take, carry_i, best_i[s])
            carry_d = jnp.where(take, best_d[s], carry_d)
            carry_i = jnp.where(take, best_i[s], carry_i)
            best_d[s] = nd
            best_i[s] = ni
        m_prev = m_j

    dist_ref[:] = jnp.stack(best_d, axis=1)
    idx_ref[:] = jnp.stack(best_i, axis=1)


@partial(jax.jit, static_argnames=("k", "query_tile", "map_tile",
                                   "interpret"))
def knn_pallas(query, query_valid, points, points_valid, k: int = 5,
               query_tile: int = 256, map_tile: int = 1024,
               interpret: bool = False):
    """Drop-in replacement for ``neighbors.knn`` backed by a Pallas kernel.

    Coordinates pad from 3 to 8 lanes; invalid queries are masked on the
    host side after the kernel (cheap, keeps the kernel branch-free).
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
    pv = jnp.zeros((N + npad, 1), jnp.float32).at[:N, 0].set(
        points_valid.astype(jnp.float32))
    qv = jnp.zeros((Q + qpad, 1), jnp.float32).at[:Q, 0].set(
        query_valid.astype(jnp.float32))

    grid = ((Q + qpad) // query_tile, (N + npad) // map_tile)
    # Trace in strict 32-bit mode: the library enables global x64, which
    # otherwise leaks weak-typed 64-bit scalars into the Mosaic kernel.
    with jax.enable_x64(False):
        dist, idx = pl.pallas_call(
            partial(_knn_kernel, k=k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((query_tile, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((query_tile, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((map_tile, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((map_tile, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((query_tile, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((query_tile, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q + qpad, k), jnp.float32),
                jax.ShapeDtypeStruct((Q + qpad, k), jnp.int32),
            ],
            interpret=interpret,
        )(q8, qv, p8, pv)
    ok = query_valid[:, None]
    dist = jnp.where(ok, dist[:Q], BIG)
    idx = jnp.where(ok & (dist < BIG), idx[:Q], -1)
    return dist, idx
