from rgbd_odometry_tpu.utils import checkpoint, tracing  # noqa: F401
