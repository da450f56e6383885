"""MPC runner: warm-started replanning loop around the jitted SQP.

Host-side orchestration replacing the reference's MPC thread + MPC_MRT
handoff (BipedalController.cpp:319-352): it owns the reference manager, the
previous solution (warm start), and a single compiled solve.  The compiled
function is shape-stable across replans — gait changes arrive as new device
tables, not new programs.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..interface import RobotInterface
from ..reference.manager import ReferenceManager
from ..solver.sqp import (
    SqpSolution,
    build_refs,
    initial_trajectory,
    sqp_solve,
    warm_start_from_solution,
)
from ..utils.timing import RepeatedTimer


class MpcRunner:
    def __init__(self, iface: RobotInterface, reference_manager: ReferenceManager | None = None):
        self.iface = iface
        self.rm = reference_manager or iface.make_reference_manager()
        self.last_solution: SqpSolution | None = None
        self.last_frozen = None
        self.timer = RepeatedTimer("mpc")
        model, info, settings = iface.model, iface.info, iface.settings
        Q, R = iface.Q, iface.R

        @jax.jit
        def _solve(refs, t_nodes, x_init, xs, us):
            return sqp_solve(model, info, settings, Q, R, refs, t_nodes, x_init, xs, us)

        self._solve = _solve

    def reset(self):
        self.last_solution = None
        self.last_frozen = None

    def advance(self, t: float, x_measured) -> SqpSolution:
        """One replan (MPC_MRT_Interface::advanceMpc equivalent)."""
        frozen = self.rm.freeze(t)
        self.last_frozen = frozen
        t_nodes = jnp.asarray(frozen.t_nodes)
        refs = build_refs(self.iface.info, frozen.gait, frozen.swing, frozen.target, t_nodes)
        if self.last_solution is None:
            xs, us = initial_trajectory(
                self.iface.info, refs, x_measured, self.iface.settings.num_intervals + 1
            )
        else:
            xs, us = warm_start_from_solution(self.last_solution, t_nodes)
        with self.timer:
            sol = self._solve(refs, t_nodes, x_measured, xs, us)
            jax.block_until_ready(sol.x_traj)
        self.last_solution = sol
        return sol
