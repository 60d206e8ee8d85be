"""I/O: KITTI odometry dataset, native prefetching reader, track export."""

from .kitti import KittiCalib, KittiSequence, read_velodyne, pad_cloud
from .messages import FeatureTracks, tracks_from_table

__all__ = ["KittiCalib", "KittiSequence", "read_velodyne", "pad_cloud",
           "FeatureTracks", "tracks_from_table"]
