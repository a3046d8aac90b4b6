from . import pointcloud, trajectory  # noqa: F401
