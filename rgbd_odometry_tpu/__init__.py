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
)

__version__ = "0.1.0"

__all__ = [
    "CameraConfig",
    "SolverConfig",
    "PyramidConfig",
    "KeyframeConfig",
    "PipelineConfig",
    "__version__",
]
