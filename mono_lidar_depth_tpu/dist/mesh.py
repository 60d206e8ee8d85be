"""Device meshes and canonical shardings.

The framework's parallel axes (replacing the reference's process-level
ROS graph, SURVEY.md §2.7):

  "frame"    — data parallelism over frames / sequences (depth
               association is embarrassingly parallel per frame)
  "landmark" — model parallelism over landmark blocks in bundle
               adjustment (the distributed Schur reduction psums the
               reduced camera system over this axis)

A 1-D mesh uses a single axis for both roles; a 2-D mesh splits them.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAME_AXIS = "frame"
LANDMARK_AXIS = "landmark"


def make_mesh(n_devices: int | None = None, landmark_parallel: int = 1
              ) -> Mesh:
    """Build a (frame, landmark) mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices % landmark_parallel != 0:
        raise ValueError("n_devices must be divisible by landmark_parallel")
    arr = np.asarray(devs[:n_devices]).reshape(
        n_devices // landmark_parallel, landmark_parallel)
    return Mesh(arr, axis_names=(FRAME_AXIS, LANDMARK_AXIS))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over frames, rest replicated."""
    return NamedSharding(mesh, P(FRAME_AXIS))


def landmark_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(LANDMARK_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
