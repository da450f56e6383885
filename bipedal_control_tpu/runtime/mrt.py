"""Policy evaluation (MRT): interpolation + optional feedback policy.

Replaces OCS2's MPC_MRT_Interface policy buffer/evaluator
(BipedalController.cpp:191-200): linear interpolation of the optimized state
and input trajectories at the query time, plus the Riccati feedback term
u = u*(t) + K(t) (x - x*(t)) when useFeedbackPolicy is on (task.info sqp:80).

Pure function of an SqpSolution — the host-side controller owns the buffer
(double-buffer swap replaces the reference's mutex'd policy handoff).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..solver.sqp import SqpSolution


class PolicyEval(NamedTuple):
    x_star: jnp.ndarray
    u_star: jnp.ndarray  # feedforward (interpolated)
    u_fb: jnp.ndarray  # with feedback term applied


def evaluate_policy(sol: SqpSolution, t, x_measured, use_feedback: bool = True) -> PolicyEval:
    times = sol.t_nodes
    idx = jnp.clip(jnp.searchsorted(times, t, side="right"), 1, times.shape[0] - 1)
    t0, t1 = times[idx - 1], times[idx]
    alpha = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    x_star = sol.x_traj[idx - 1] * (1 - alpha) + sol.x_traj[idx] * alpha
    iu = jnp.clip(idx - 1, 0, sol.u_traj.shape[0] - 1)
    iu1 = jnp.clip(idx, 0, sol.u_traj.shape[0] - 1)
    u_star = sol.u_traj[iu] * (1 - alpha) + sol.u_traj[iu1] * alpha
    if use_feedback:
        K = sol.K[iu]
        u_fb = u_star - K @ (x_measured - x_star)
    else:
        u_fb = u_star
    return PolicyEval(x_star=x_star, u_star=u_star, u_fb=u_fb)
