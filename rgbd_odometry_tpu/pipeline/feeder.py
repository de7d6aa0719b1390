"""Asynchronous double-buffered host->device frame feeder.

Replaces the ROS pub/sub decoupling between the ingest nodes and the solver
(queue depths 1-10 give implicit backpressure, /root/reference/src/SolveDVO.cpp:41;
SURVEY.md section 2.6): a background thread prefetches, preprocesses, and
`jax.device_put`s the NEXT frame's pyramid while the solver crunches the
current one, so host decode/transfer time hides behind device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.core.pyramid import FramePyramid, build_pyramid


class FrameFeeder:
    """Prefetching iterator: frames() tuples in, device-resident pyramids out.

    `depth` mirrors the ROS subscription queue depth (backpressure: the
    producer blocks once `depth` pyramids are staged, and frames are never
    dropped — unlike the reference's queue-1 subscription which silently
    drops under load)."""

    _SENTINEL = object()

    def __init__(
        self,
        source_iter: Iterator[Tuple[np.ndarray, np.ndarray, float]],
        num_levels: int = 4,
        depth: int = 2,
        device=None,
    ):
        self._source = source_iter
        self._levels = num_levels
        self._device = device or jax.devices()[0]
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._err: Optional[BaseException] = None
        self._thread.start()

    def _worker(self):
        try:
            for gray, depth_mm, ts in self._source:
                pyr = build_pyramid(
                    jnp.asarray(gray, jnp.float32),
                    jnp.asarray(depth_mm, jnp.float32),
                    self._levels,
                )
                pyr = jax.device_put(pyr, self._device)
                self._q.put((pyr, ts))
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[FramePyramid, float]:
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
