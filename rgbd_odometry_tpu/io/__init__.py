from rgbd_odometry_tpu.io import synthetic  # noqa: F401
