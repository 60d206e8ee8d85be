"""Evaluation harnesses for the BASELINE.json staged configs."""

from .kitti_eval import (eval_depth_sequence, eval_vo_sequence,
                         propose_loop_closures,
                         propose_loop_closures_appearance,
                         run_pose_graph_backend, union_closure_candidates)

__all__ = ["eval_depth_sequence", "eval_vo_sequence",
           "propose_loop_closures", "propose_loop_closures_appearance",
           "run_pose_graph_backend", "union_closure_candidates"]
