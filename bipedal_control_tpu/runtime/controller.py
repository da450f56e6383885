"""The full control cascade — BipedalController equivalent.

Per control tick (reference: BipedalController::update, cpp:186-276):
estimate -> observation -> (async) MPC replan -> policy interpolation ->
WBC torque QP -> hybrid joint command (posDes, velDes, kp, kd, tau_ff).

Host-side object orchestrating jitted device stages; on TPU the MPC and the
WBC are separate compiled programs and the 50 Hz / 400 Hz split of the
reference's two threads becomes asynchronous device dispatch (the solve is
enqueued non-blocking; the control path consumes the last completed policy).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..interface import RobotInterface
from ..model.centroidal import centroidal_state_from_rbd
from ..utils.rotations import unwrap_near
from ..utils.timing import RepeatedTimer
from ..wbc.tasks import WbcTaskConfig
from ..wbc.weighted_wbc import wbc_update
from .mpc_runner import MpcRunner
from .mrt import evaluate_policy
from .safety import check_orientation


class JointCommand(NamedTuple):
    """HybridJointHandle::setCommand payload (HybridJointInterface.h:66-72)."""

    pos_des: np.ndarray
    vel_des: np.ndarray
    kp: np.ndarray
    kd: np.ndarray
    tau_ff: np.ndarray


@dataclasses.dataclass
class ControllerConfig:
    mpc_frequency: float = 50.0
    use_feedback_policy: bool = True
    joint_kp: float = 80.0  # BipedalControllerParams.cfg leg_motor_*_kp default
    joint_kd: float = 5.0
    # Runtime WBC weight override (the reference exposes these through
    # dynamic_reconfigure, BipedalController.cpp:407-478).  task.info ships
    # baseAccel weight 1.0, under which the contact-force tracking rows
    # (hundreds of N) numerically dominate the base recovery PD and the robot
    # tips over in physics; 10.0 balances H1 stably in MuJoCo.
    weight_base_accel: float | None = 10.0


def wbc_config_from_task(task) -> WbcTaskConfig:
    return WbcTaskConfig(
        torque_limit_per_leg=tuple(task.wbc.torque_limits),
        friction_coefficient=task.wbc.friction_coefficient,
        swing_kp=task.wbc.swing_kp,
        swing_kd=task.wbc.swing_kd,
        base_kp=tuple(task.wbc.base_kp),
        base_kd=tuple(task.wbc.base_kd),
        no_contact_motion_tolerance=task.wbc.no_contact_motion_tolerance,
        weight_swing_leg=task.wbc.weight_swing_leg,
        weight_base_accel=task.wbc.weight_base_accel,
        weight_contact_force=task.wbc.weight_contact_force,
    )


class BipedalController:
    def __init__(self, iface: RobotInterface, cfg: ControllerConfig | None = None):
        self.iface = iface
        self.cfg = cfg or ControllerConfig()
        self.mpc = MpcRunner(iface)
        self.wbc_cfg = wbc_config_from_task(iface.task)
        if self.cfg.weight_base_accel is not None:
            self.wbc_cfg = dataclasses.replace(
                self.wbc_cfg, weight_base_accel=self.cfg.weight_base_accel
            )
        self.last_yaw = 0.0
        self.last_mpc_time = -np.inf
        self.last_wbc_decision = None
        self.safe = True
        self.wbc_timer = RepeatedTimer("wbc")
        self.last_frozen = None

        model, info = iface.model, iface.info
        wbc_cfg = self.wbc_cfg

        @jax.jit
        def _observe(rbd):
            return centroidal_state_from_rbd(model, info, rbd)

        @jax.jit
        def _wbc(x_des, u_des, rbd, flags):
            return wbc_update(model, info, wbc_cfg, x_des, u_des, rbd, flags)

        self._observe = _observe
        self._wbc = _wbc

    # ------------------------------------------------------------------
    def starting(self, t: float, rbd_measured) -> None:
        """Reset + blocking initial solve (BipedalController::starting)."""
        self.mpc.reset()
        self.last_yaw = float(rbd_measured[0])
        x_obs = self._observation(rbd_measured)
        self.mpc.advance(t, x_obs)
        self.last_mpc_time = t
        self.safe = True

    def _observation(self, rbd_measured):
        x = self._observe(jnp.asarray(rbd_measured))
        # yaw continuity (BipedalController.cpp:400-403)
        yaw = float(unwrap_near(x[9], self.last_yaw))
        self.last_yaw = yaw
        return x.at[9].set(yaw)

    def update(self, t: float, rbd_measured, contact_flags_meas=None) -> JointCommand:
        """One 400-500 Hz control tick."""
        rbd = jnp.asarray(rbd_measured)
        x_obs = self._observation(rbd)

        if not check_orientation(rbd):
            self.safe = False
        if not self.safe:
            nj = self.iface.info.nj
            zero = np.zeros(nj)
            return JointCommand(zero, zero, zero, np.full(nj, self.cfg.joint_kd), zero)

        # replan at mpcDesiredFrequency
        if t - self.last_mpc_time >= 1.0 / self.cfg.mpc_frequency - 1e-9:
            self.mpc.advance(t, x_obs)
            self.last_mpc_time = t

        sol = self.mpc.last_solution
        pol = evaluate_policy(sol, t, x_obs, use_feedback=self.cfg.use_feedback_policy)

        # planned contact flags at t from the frozen gait table of this solve
        frozen = self.mpc.last_frozen
        flags = frozen.gait.contact_flags_at(jnp.asarray(t))

        with self.wbc_timer:
            res = self._wbc(pol.x_star, pol.u_fb, rbd, flags)
            jax.block_until_ready(res.decision)
        # qpOASES-failure fallback: reuse last solution (WeightedWbc.cpp:77-81).
        # Only genuine failures (non-finite) reject; finite-iteration ADMM
        # residuals are normal and must not freeze the torque on a stale value.
        if bool(jnp.all(jnp.isfinite(res.decision))) or self.last_wbc_decision is None:
            decision = res.decision
            self.last_wbc_decision = decision
        else:
            decision = self.last_wbc_decision

        nj = self.iface.info.nj
        tau = np.asarray(decision[-nj:])
        pos_des = np.asarray(pol.x_star[12 : 12 + nj])
        vel_des = np.asarray(pol.u_fb[12:])
        return JointCommand(
            pos_des=pos_des,
            vel_des=vel_des,
            kp=np.full(nj, self.cfg.joint_kp),
            kd=np.full(nj, self.cfg.joint_kd),
            tau_ff=tau,
        )
