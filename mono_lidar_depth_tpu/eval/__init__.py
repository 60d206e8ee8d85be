"""Evaluation harnesses for the BASELINE.json staged configs."""

from .kitti_eval import (eval_depth_sequence, eval_vo_sequence,
                         propose_loop_closures, run_pose_graph_backend)

__all__ = ["eval_depth_sequence", "eval_vo_sequence",
           "propose_loop_closures", "run_pose_graph_backend"]
