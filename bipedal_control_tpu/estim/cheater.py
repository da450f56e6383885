"""Cheater (ground-truth) state estimate.

Equivalent of FromTopicStateEstimate (bipedal_estimation/src/FromTopicEstimate.cpp):
assembles the rbdState vector from simulator ground truth
[euler_zyx, pos, q_j, omega_world, v_world, dq_j] — the layout consumed by the
WBC and the centroidal conversions (StateEstimateBase.cpp:35-64).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.rotations import zyx_from_quat_wxyz


def rbd_state_from_ground_truth(
    base_pos,  # (3,) world
    base_quat_wxyz,  # (4,)
    base_lin_vel_world,  # (3,)
    base_ang_vel_world,  # (3,)
    joint_pos,  # (nj,)
    joint_vel,  # (nj,)
    last_yaw=None,
):
    """Build rbdState; optionally unwraps yaw continuity against last_yaw."""
    euler = zyx_from_quat_wxyz(jnp.asarray(base_quat_wxyz))
    if last_yaw is not None:
        from ..utils.rotations import unwrap_near

        euler = euler.at[0].set(unwrap_near(euler[0], last_yaw))
    return jnp.concatenate(
        [
            euler,
            jnp.asarray(base_pos),
            jnp.asarray(joint_pos),
            jnp.asarray(base_ang_vel_world),
            jnp.asarray(base_lin_vel_world),
            jnp.asarray(joint_vel),
        ]
    )
