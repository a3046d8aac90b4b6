from . import batch, lc_fusion, lidar_odometry, preprocessing, sliding_window  # noqa: F401
