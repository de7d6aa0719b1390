"""rgbd_odometry_tpu — a TPU-native (JAX/XLA/Pallas) RGB-D visual-odometry framework.

A from-scratch rebuild of the capabilities of mpkuse/rgbd_odometry (ICRA-2016
"Robust Camera Motion Estimation using Direct Edge Alignment and Sub-gradient
Method"): the flagship edge-alignment DVO solver, a legacy photometric DVO, a
sparse PnP path, IMU dead-reckoning, keyframe pose-graph trajectory management,
TUM-dataset ingestion, and ATE/drift evaluation — designed TPU-first:

* all compute-path kernels are pure-functional jnp/Pallas, jitted with static
  shapes (fixed-size edge-point sets with validity masks instead of the
  reference's ragged point lists),
* the per-level optimizer runs as a `lax.fori_loop` on device,
* frame-pairs batch via `vmap` and shard across chip meshes via `shard_map`,
* host↔device traffic is double-buffered, with the ROS pub/sub graph of the
  reference replaced by an in-process typed frame pipeline.

Reference parity notes are cited throughout as /root/reference/<file>:<line>.
"""

from rgbd_odometry_tpu.config import (
    CameraConfig,
    SolverConfig,
    PyramidConfig,
    KeyframeConfig,
    PipelineConfig,
    RelocalizeConfig,
)

__version__ = "0.1.0"

# main user-facing API, loaded lazily (PEP 562) so `import rgbd_odometry_tpu`
# stays light — jax/XLA initialization only happens when first touched
_LAZY = {
    "align_pair": ("rgbd_odometry_tpu.solvers.edge_dvo", "align_pair"),
    "EdgeDvoOdometry": ("rgbd_odometry_tpu.pipeline.odometry", "EdgeDvoOdometry"),
    "FusedOdometry": ("rgbd_odometry_tpu.pipeline.fused", "FusedOdometry"),
    "FeatureVo": ("rgbd_odometry_tpu.pipeline.feature_vo", "FeatureVo"),
    "LoopCloser": ("rgbd_odometry_tpu.pipeline.loop_closure", "LoopCloser"),
    "Relocalizer": ("rgbd_odometry_tpu.pipeline.relocalize", "Relocalizer"),
    "refine_pose_graph": ("rgbd_odometry_tpu.solvers.pose_graph", "refine_pose_graph"),
    "information_sqrt": ("rgbd_odometry_tpu.solvers.pose_graph", "information_sqrt"),
    "marginal_covariance": ("rgbd_odometry_tpu.solvers.pose_graph", "marginal_covariance"),
    "Intrinsics": ("rgbd_odometry_tpu.core.camera", "Intrinsics"),
    "FrameFeeder": ("rgbd_odometry_tpu.pipeline.feeder", "FrameFeeder"),
    "TumSource": ("rgbd_odometry_tpu.io.stream", "TumSource"),
    "SyntheticCamera": ("rgbd_odometry_tpu.io.stream", "SyntheticCamera"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'rgbd_odometry_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))


__all__ = [
    "CameraConfig",
    "SolverConfig",
    "PyramidConfig",
    "KeyframeConfig",
    "PipelineConfig",
    "RelocalizeConfig",
    "__version__",
    *sorted(_LAZY),
]
