"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from glio_tpu.parallel import banded_pcg
from glio_tpu.solver import banded


def _random_banded(T, D, hw, nb=1, seed=0):
    rng = np.random.default_rng(seed)
    B = 2 * hw + 1
    band = np.zeros((nb, T, B, D, D))
    for n in range(nb):
        for t in range(T):
            for o in range(hw, B):
                s = t + o - hw
                if s >= T:
                    continue
                blk = rng.normal(size=(D, D)) * 0.1
                if s == t:
                    blk = blk @ blk.T + 3 * np.eye(D)
                band[n, t, o] = blk
                band[n, s, hw - (o - hw)] = blk.T
    b = rng.normal(size=(nb, T, D))
    return jnp.asarray(band), jnp.asarray(b)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pcg_matches_single_device():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    T, D, hw = 32, 6, 2
    band, b = _random_banded(T, D, hw, nb=2, seed=1)
    solve = banded_pcg.make_sharded_pcg(mesh, hw=hw, iters=120)
    x, res = solve(band, b)
    for n in range(2):
        x_ref, _ = banded.pcg_solve(band[n], b[n], iters=120)
        np.testing.assert_allclose(np.asarray(x[n]), np.asarray(x_ref),
                                   atol=1e-8)
    assert np.all(np.asarray(res) < 1e-8)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pcg_single_sp_shard():
    # Degenerate mesh (sp=1) must still work.
    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("dp", "sp"))
    T, D, hw = 16, 4, 2
    band, b = _random_banded(T, D, hw, nb=8, seed=2)
    solve = banded_pcg.make_sharded_pcg(mesh, hw=hw, iters=80)
    x, _ = solve(band, b)
    x_ref, _ = banded.pcg_solve(band[0], b[0], iters=80)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x_ref), atol=1e-8)
