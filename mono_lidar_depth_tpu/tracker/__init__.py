"""Feature detection + tracking (self-contained replacement for the
reference's external viso feature tracker dependency,
tracklets_depth_ros_tool/launch/tracklets.launch:14-20)."""

from .harris import detect_features, shi_tomasi_response
from .klt import build_pyramid, track_features
from .frontend import TrackerState, track_frame

__all__ = ["detect_features", "shi_tomasi_response", "build_pyramid",
           "track_features", "TrackerState", "track_frame"]
