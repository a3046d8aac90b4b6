"""Pallas kernel tests (interpret mode — hardware-independent)."""

import jax.numpy as jnp
import numpy as np

from glio_tpu.ops.knn_pallas import knn_pallas

RNG = np.random.default_rng(0)


def _ref_knn(q, p, k):
    full = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(full, axis=1)[:, :k]
    return np.take_along_axis(full, idx, 1), idx


def test_knn_pallas_matches_bruteforce():
    q = RNG.normal(size=(300, 3)).astype(np.float32) * 10
    p = RNG.normal(size=(3000, 3)).astype(np.float32) * 10
    d, i = knn_pallas(jnp.asarray(q), jnp.ones(300, bool),
                      jnp.asarray(p), jnp.ones(3000, bool),
                      k=5, query_tile=128, map_tile=512, interpret=True)
    ref_d, ref_i = _ref_knn(q, p, 5)
    assert all(set(a) == set(b) for a, b in zip(np.asarray(i), ref_i))
    np.testing.assert_allclose(np.sort(np.asarray(d), 1),
                               np.sort(ref_d, 1), rtol=1e-3, atol=1e-2)


def test_knn_pallas_masks():
    p = np.zeros((8, 3), np.float32)
    p[0] = [0, 0, 0.1]
    p[1] = [0, 0, 1.0]
    p[2:] = 50.0
    pv = np.ones(8, bool)
    pv[0] = False                      # nearest but invalid
    q = np.zeros((2, 3), np.float32)
    qv = np.array([True, False])
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(qv),
                      jnp.asarray(p), jnp.asarray(pv),
                      k=2, query_tile=8, map_tile=8, interpret=True)
    assert int(i[0, 0]) == 1
    assert np.all(np.asarray(i[1]) == -1)


def test_knn_pallas_padding():
    # Non-multiple sizes exercise the padding path.
    q = RNG.normal(size=(77, 3)).astype(np.float32)
    p = RNG.normal(size=(333, 3)).astype(np.float32)
    d, i = knn_pallas(jnp.asarray(q), jnp.ones(77, bool),
                      jnp.asarray(p), jnp.ones(333, bool),
                      k=3, query_tile=64, map_tile=128, interpret=True)
    ref_d, ref_i = _ref_knn(q, p, 3)
    assert all(set(a) == set(b) for a, b in zip(np.asarray(i), ref_i))
