from . import banded, dense, linalg, manifold, marginalization  # noqa: F401
