from rgbd_odometry_tpu.pallas import edt  # noqa: F401
