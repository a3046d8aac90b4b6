from . import quat, so3, coords  # noqa: F401
