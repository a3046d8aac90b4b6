from . import imu, lidar, pose  # noqa: F401
