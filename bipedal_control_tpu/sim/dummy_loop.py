"""Kinematic dummy loop — MRT_ROS_Dummy_Loop equivalent.

Closes the loop on the MPC's *own* model with no physics, WBC, or estimation
(reference: BipedalRobotDummyNode.cpp:44-90, the standard planner-only
verification harness, SURVEY.md §3.4): integrate the centroidal flow map
under the interpolated (optionally feedback) policy at mrtFrequency while the
MPC replans at mpcFrequency.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..interface import RobotInterface
from ..model.centroidal import centroidal_flow_map
from ..runtime.mpc_runner import MpcRunner
from ..runtime.mrt import evaluate_policy
from ..utils.precision import default_matmul_precision


@dataclasses.dataclass
class DummyLoopResult:
    times: np.ndarray  # (T,)
    states: np.ndarray  # (T, nx)
    inputs: np.ndarray  # (T, nu)
    mpc_stats: dict


def run_dummy_loop(
    iface: RobotInterface,
    mpc: MpcRunner,
    x0,
    t0: float = 0.0,
    duration: float = 1.0,
    mrt_frequency: float = 400.0,
    mpc_frequency: float = 50.0,
    use_feedback: bool = True,
    on_step=None,
) -> DummyLoopResult:
    """``on_step(t, x)`` (optional) runs once per MRT tick — the hook the
    live command channel (runtime/commands.py) uses to re-target a running
    loop, like the reference's command nodes publish into a running MPC."""
    model, info = iface.model, iface.info
    dt = 1.0 / mrt_frequency

    @jax.jit
    def step(x, u):
        with default_matmul_precision():
            f = lambda xx: centroidal_flow_map(model, info, xx, u)
            k1 = f(x)
            k2 = f(x + 0.5 * dt * k1)
            k3 = f(x + 0.5 * dt * k2)
            k4 = f(x + dt * k3)
            return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    x = jnp.asarray(x0)
    t = t0
    mpc.reset()
    mpc.advance(t, x)
    last_plan = t

    times, states, inputs = [], [], []
    n_steps = int(round(duration * mrt_frequency))
    for _ in range(n_steps):
        if on_step is not None:
            on_step(t, x)
        if t - last_plan >= 1.0 / mpc_frequency - 1e-9:
            mpc.advance(t, x)
            last_plan = t
        pol = evaluate_policy(mpc.last_solution, t, x, use_feedback=use_feedback)
        times.append(t)
        states.append(np.asarray(x))
        inputs.append(np.asarray(pol.u_fb))
        x = step(x, pol.u_fb)
        t += dt
    return DummyLoopResult(
        times=np.asarray(times),
        states=np.stack(states),
        inputs=np.stack(inputs),
        mpc_stats=mpc.timer.stats(),
    )
