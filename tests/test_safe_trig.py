"""Regression tests for the platform scalar-trig precision quirk.

On this environment's XLA build, f64 ``cos`` on arrays with < 2 elements
goes through a float32-accurate scalar path (error ≈ 2⁻²⁷).  The
``safe_trig`` wrappers must restore full f64 accuracy for every shape.
"""

import jax.numpy as jnp
import numpy as np

from glio_tpu.utils import safe_trig as trig


def test_scalar_trig_precision():
    v = np.deg2rad(22.3)
    for jf, nf in [(trig.sin, np.sin), (trig.cos, np.cos),
                   (trig.arctan, np.arctan)]:
        for x in (jnp.asarray(v), jnp.asarray([v]), jnp.asarray([v, 2 * v])):
            err = np.abs(np.asarray(jf(x)) - nf(np.asarray(x)))
            assert err.max() < 1e-14, (jf, x.shape, err)


def test_scalar_arctan2_precision():
    y, x = 2.13, -0.74
    expect = np.arctan2(y, x)
    for args in [(jnp.asarray(y), jnp.asarray(x)),
                 (jnp.asarray([y]), jnp.asarray([x])),
                 (jnp.asarray([y, y]), jnp.asarray([x, x]))]:
        out = np.asarray(trig.arctan2(*args))
        assert np.abs(out - expect).max() < 1e-14


def test_shapes_preserved():
    assert trig.cos(jnp.asarray(1.0)).shape == ()
    assert trig.cos(jnp.ones((1,))).shape == (1,)
    assert trig.cos(jnp.ones((3, 4))).shape == (3, 4)
    assert trig.arctan2(jnp.ones(()), jnp.ones(())).shape == ()
