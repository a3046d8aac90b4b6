from . import gnss, imu, lidar, pose  # noqa: F401
