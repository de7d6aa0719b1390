from rgbd_odometry_tpu.core import geometry, camera, pyramid  # noqa: F401
