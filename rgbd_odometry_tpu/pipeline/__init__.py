from rgbd_odometry_tpu.pipeline import gop, odometry  # noqa: F401
