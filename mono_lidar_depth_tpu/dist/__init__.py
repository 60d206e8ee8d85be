"""Distribution: device meshes, sharded frame batches, distributed
Schur-complement bundle adjustment (SURVEY.md §2.7 mappings)."""

from .mesh import make_mesh, frame_sharding, replicated_sharding
from .sharded import (distributed_ba, distributed_pose_graph,
                      sharded_depth_association)

__all__ = ["make_mesh", "frame_sharding", "replicated_sharding",
           "distributed_ba", "distributed_pose_graph",
           "sharded_depth_association"]
