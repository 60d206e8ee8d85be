"""Tracklet bookkeeping: fixed-capacity track table + per-frame
depth-association pipeline (L2 of the reference stack)."""

from .table import TrackTable, match_tracks, update_tracks
from .pipeline import TrackletDepthState, process_frame

__all__ = ["TrackTable", "match_tracks", "update_tracks",
           "TrackletDepthState", "process_frame"]
