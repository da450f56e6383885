from .controller import BipedalController, ControllerConfig, JointCommand, wbc_config_from_task
from .mpc_runner import MpcRunner
from .mrt import PolicyEval, evaluate_policy
from .safety import check_orientation
