from rgbd_odometry_tpu.parallel import mesh  # noqa: F401
