from rgbd_odometry_tpu.eval import ate  # noqa: F401
