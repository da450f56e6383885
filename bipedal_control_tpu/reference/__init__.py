from .manager import FrozenReferences, ReferenceManager, build_time_grid
from .target import (
    CommandConfig,
    TargetTable,
    TargetTrajectories,
    cmd_vel_to_target_trajectories,
    goal_to_target_trajectories,
    stationary_target,
)
