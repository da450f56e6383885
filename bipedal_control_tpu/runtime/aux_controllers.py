"""Auxiliary joint controllers + policy serialization.

- :class:`InitialJointPositionController`: drive the legs to the default
  joint state with joint-limit clamping and per-joint PD gains — the
  bring-up/reset controller (reference: InitialJointController.cpp:28-200,
  used by the restart scripts before switching to the main controller).
- :class:`UpperJointController`: hold the upper body at its defaults with
  fixed kp=100/kd=3 (UpperJointController.cpp:31-118).
- save/load of SqpSolution policies (.npz) — the checkpoint/resume facility
  the reference lacks entirely (SURVEY.md §5.4).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..solver.sqp import SqpSolution
from .controller import JointCommand


@dataclasses.dataclass
class InitialJointPositionController:
    """PD to a target posture, ramped over `duration` with limit clamping."""

    target: np.ndarray  # (nj,)
    lower: np.ndarray
    upper: np.ndarray
    kp: float = 100.0
    kd: float = 3.0
    duration: float = 2.0

    _q_start: np.ndarray | None = None
    _t_start: float = 0.0

    def starting(self, t: float, joint_pos: np.ndarray) -> None:
        self._q_start = np.asarray(joint_pos).copy()
        self._t_start = t

    def update(self, t: float, joint_pos, joint_vel) -> JointCommand:
        if self._q_start is None:
            self.starting(t, joint_pos)
        alpha = np.clip((t - self._t_start) / self.duration, 0.0, 1.0)
        target = np.clip(self.target, self.lower, self.upper)
        pos_des = (1 - alpha) * self._q_start + alpha * target
        nj = len(target)
        return JointCommand(
            pos_des=pos_des,
            vel_des=np.zeros(nj),
            kp=np.full(nj, self.kp),
            kd=np.full(nj, self.kd),
            tau_ff=np.zeros(nj),
        )


@dataclasses.dataclass
class UpperJointController:
    """Hold upper-body joints at defaults (fixed gains, no ramp)."""

    target: np.ndarray
    kp: float = 100.0
    kd: float = 3.0

    def update(self, t: float, joint_pos, joint_vel) -> JointCommand:
        nj = len(self.target)
        return JointCommand(
            pos_des=np.asarray(self.target),
            vel_des=np.zeros(nj),
            kp=np.full(nj, self.kp),
            kd=np.full(nj, self.kd),
            tau_ff=np.zeros(nj),
        )


# ---------------------------------------------------------------- checkpoint
def save_policy(path: str, sol: SqpSolution) -> None:
    """Serialize a solved policy (warm start / resume / offline analysis)."""
    np.savez(
        path,
        t_nodes=np.asarray(sol.t_nodes),
        x_traj=np.asarray(sol.x_traj),
        u_traj=np.asarray(sol.u_traj),
        K=np.asarray(sol.K),
        cost=np.asarray(sol.cost),
        defect_norm=np.asarray(sol.defect_norm),
        eq_norm=np.asarray(sol.eq_norm),
        step_size=np.asarray(sol.step_size),
    )


def load_policy(path: str) -> SqpSolution:
    import jax.numpy as jnp

    z = np.load(path)
    return SqpSolution(
        t_nodes=jnp.asarray(z["t_nodes"]),
        x_traj=jnp.asarray(z["x_traj"]),
        u_traj=jnp.asarray(z["u_traj"]),
        K=jnp.asarray(z["K"]),
        cost=jnp.asarray(z["cost"]),
        defect_norm=jnp.asarray(z["defect_norm"]),
        eq_norm=jnp.asarray(z["eq_norm"]),
        step_size=jnp.asarray(z["step_size"]),
    )
