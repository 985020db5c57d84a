from spef_tpu.pose.rotations import *  # noqa: F401,F403
from spef_tpu.pose.score import get_score, pose_errors, score_batch  # noqa: F401
