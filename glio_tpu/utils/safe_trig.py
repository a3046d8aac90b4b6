"""Full-precision trig wrappers for this platform.

The XLA CPU/axon build in this environment lowers float64 ``cos`` (and
some other transcendentals) on arrays with fewer than 2 elements through a
scalar path that is only float32-accurate (~2⁻²⁷ ≈ 7.5e-9 absolute error —
measured; see tests/test_math_utils.py::test_scalar_trig_precision).
At Earth radius that is a 5 cm error, unacceptable for GNSS geometry.

Vectorized (≥2-element) lowering is correctly rounded (≤1e-14), so these
wrappers simply pad rank-0/1-element inputs to 2 elements before the op.
Zero overhead for already-batched inputs.
"""

import jax.numpy as jnp

_PAD_OPS = {}


def _padded(op):
    def f(x):
        x = jnp.asarray(x)
        if x.size >= 2:
            return op(x)
        flat = x.reshape(-1)
        padded = jnp.concatenate([flat, jnp.zeros(2 - flat.size, x.dtype)])
        return op(padded)[: flat.size].reshape(x.shape)

    return f


sin = _padded(jnp.sin)
cos = _padded(jnp.cos)
tan = _padded(jnp.tan)
arcsin = _padded(jnp.arcsin)
arccos = _padded(jnp.arccos)
arctan = _padded(jnp.arctan)


def arctan2(y, x):
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    shape = jnp.broadcast_shapes(y.shape, x.shape)
    n = 1
    for s in shape:
        n *= s
    if n >= 2:
        return jnp.arctan2(y, x)
    yf = jnp.broadcast_to(y, shape).reshape(-1)
    xf = jnp.broadcast_to(x, shape).reshape(-1)
    pad_y = jnp.zeros(2 - yf.size, yf.dtype)
    pad_x = jnp.ones(2 - xf.size, xf.dtype)
    out = jnp.arctan2(jnp.concatenate([yf, pad_y]),
                      jnp.concatenate([xf, pad_x]))
    return out[: yf.size].reshape(shape)


def sincos(x):
    return sin(x), cos(x)
