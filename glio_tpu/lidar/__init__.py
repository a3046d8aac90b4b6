from . import plane_fit, neighbors, features  # noqa: F401
