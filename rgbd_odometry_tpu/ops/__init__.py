from rgbd_odometry_tpu.ops import canny, distance_transform, gradient, interp  # noqa: F401
