"""Visual odometry with lidar depth priors: pose estimation, sliding
window bundle adjustment, pose-graph backend (the BASELINE.json
north-star extension beyond the reference's depth-fusion scope)."""

from .lie import se3_exp, se3_log, so3_exp, so3_log
from .pose import estimate_pose_gn
from .ba import BAProblem, run_ba
from .metrics import ate_rmse, rpe_stats, umeyama_align

__all__ = ["se3_exp", "se3_log", "so3_exp", "so3_log", "estimate_pose_gn",
           "BAProblem", "run_ba", "ate_rmse", "rpe_stats", "umeyama_align"]
