from rgbd_odometry_tpu.viz import colormap, overlay  # noqa: F401
