from rgbd_odometry_tpu.solvers import edge_dvo  # noqa: F401
