from .qp import QpSolution, solve_qp, solve_qp_batch
from .tasks import Task, WbcKinematics, WbcTaskConfig, compute_wbc_kinematics, num_decision_vars
from .weighted_wbc import WbcResult, wbc_update
