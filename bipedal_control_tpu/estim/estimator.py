"""Host-side state estimators producing the rbdState the controller consumes.

The reference's estimation layer (bipedal_estimation/) has a base class that
assembles rbdState [euler_zyx, pos, q_j, omega_world, v_world, dq_j]
(StateEstimateBase.cpp:35-64) with two concrete estimators: the cheater
(FromTopicEstimate.cpp — ground-truth odom) and a contact Kalman filter that
is declared but shipped EMPTY (LinearKalmanFilter.h:27-67, 0-byte .cpp).

:class:`KalmanStateEstimator` is the working version of the latter, wrapping
the jittable contact LKF (estim/kalman.py) with the sensor plumbing the
reference's MuJoCo HW exposes (BipedalMujocoHW.cpp:116-204: IMU
quat/gyro/accelerometer + per-joint pos/vel):

- orientation is taken directly from the IMU quaternion (the H1 IMU site
  rides the torso, which the upper-body controller holds at zero, so it
  coincides with the floating base — the same assumption the reference's
  "base_imu" handle makes);
- base position/velocity come from the LKF fusing IMU acceleration with
  stance-leg kinematics at the planned contact flags (the reference hardcodes
  STANCE flags at BipedalController.cpp:372-377; here the gait's planned
  flags are used, falling back to all-stance before the first policy).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..model.kinematics import forward_kinematics, frame_position
from ..utils.precision import default_matmul_precision
from ..utils.rotations import unwrap_near, zyx_from_quat_wxyz
from .kalman import KalmanConfig, KalmanState, kalman_init, kalman_update


def _rot_from_quat_wxyz(q):
    w, x, y, z = q
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class KalmanStateEstimator:
    """Contact-LKF estimator: sensors in, rbdState out (host orchestration
    around one jitted filter step)."""

    def __init__(
        self,
        model,
        info,
        cfg: KalmanConfig | None = None,
        dt: float = 1.0 / 500.0,
        debounce_ticks: int = 0,
    ):
        self.model, self.info = model, info
        self.cfg = dataclasses.replace(cfg or KalmanConfig(), dt=dt)
        self.state: KalmanState | None = None
        self.last_yaw = 0.0
        # Contact-flag debounce: hardware contact sensors chatter around
        # touch-down/lift-off (the reference's Gazebo HW reads raw booleans,
        # BipedalHWSim.cpp:239-263); a flag change must persist this many
        # consecutive ticks before the filter sees it.  0 = passthrough
        # (clean simulator flags).
        self.debounce_ticks = int(debounce_ticks)
        self._flag_state: np.ndarray | None = None
        self._flag_count = np.zeros(4, dtype=int)
        cfg_c = self.cfg

        @jax.jit
        def _step(state, quat, gyro, accel, joint_pos, joint_vel, flags):
            with default_matmul_precision():
                R_wb = _rot_from_quat_wxyz(quat)
                euler = zyx_from_quat_wxyz(quat)
                omega_world = R_wb @ gyro
                new = kalman_update(
                    model, info, cfg_c, state, R_wb, accel, euler, omega_world,
                    joint_pos, joint_vel, flags,
                )
                return new, euler, omega_world

        @jax.jit
        def _feet_rel(euler, joint_pos):
            q = jnp.concatenate([jnp.zeros(3), euler, joint_pos])
            kin = forward_kinematics(model, q)
            return jnp.stack(
                [frame_position(model, kin, f) for f in info.contact_frame_ids]
            )

        self._step = _step
        self._feet_rel = _feet_rel

    def reset(self, imu_quat_wxyz, joint_pos, base_pos_guess, base_vel_guess=None) -> None:
        """Initialize at a known/assumed base pose (bring-up happens from the
        initial-pose controller's known configuration, so the guess is the
        task-file initial state).  Feet start at FK of that pose."""
        quat = jnp.asarray(imu_quat_wxyz)
        euler = zyx_from_quat_wxyz(quat)
        self.last_yaw = float(euler[0])
        p0 = jnp.asarray(base_pos_guess, dtype=jnp.result_type(float))
        v0 = jnp.zeros(3) if base_vel_guess is None else jnp.asarray(base_vel_guess)
        feet = p0[None, :] + self._feet_rel(euler, jnp.asarray(joint_pos))
        self.state = kalman_init(p0, v0, feet)

    def _debounce(self, flags) -> np.ndarray:
        """Hysteresis on measured contact flags (see __init__)."""
        f = np.asarray(flags, dtype=float) > 0.5
        if self.debounce_ticks <= 0:
            return f.astype(float)
        if self._flag_state is None:
            self._flag_state = f.copy()
            return f.astype(float)
        changed = f != self._flag_state
        self._flag_count = np.where(changed, self._flag_count + 1, 0)
        accept = self._flag_count >= self.debounce_ticks
        self._flag_state = np.where(accept, f, self._flag_state)
        self._flag_count = np.where(accept, 0, self._flag_count)
        return self._flag_state.astype(float)

    def update(
        self, imu_quat_wxyz, gyro_local, accel_local, joint_pos, joint_vel, contact_flags
    ) -> np.ndarray:
        """One filter step; returns rbdState (numpy, with yaw continuity)."""
        if self.state is None:
            raise RuntimeError("KalmanStateEstimator.reset must run before update")
        contact_flags = self._debounce(contact_flags)
        self.state, euler, omega_world = self._step(
            self.state,
            jnp.asarray(imu_quat_wxyz),
            jnp.asarray(gyro_local),
            jnp.asarray(accel_local),
            jnp.asarray(joint_pos),
            jnp.asarray(joint_vel),
            jnp.asarray(contact_flags, dtype=jnp.result_type(float)),
        )
        yaw = float(unwrap_near(euler[0], self.last_yaw))
        self.last_yaw = yaw
        euler = np.array(euler)  # writable host copy
        euler[0] = yaw
        z = np.asarray(self.state.z)
        return np.concatenate(
            [
                euler,
                z[0:3],
                np.asarray(joint_pos),
                np.asarray(omega_world),
                z[3:6],
                np.asarray(joint_vel),
            ]
        )

    @property
    def base_position(self) -> np.ndarray:
        return np.asarray(self.state.z[0:3])
