"""Switched-model reference manager.

Equivalent of the reference's SwitchedModelReferenceManager + GaitReceiver
solver-sync hooks (SwitchedModelReferenceManager.cpp:39-71,
GaitReceiver.cpp:40-68): before every solve it re-tiles the gait over
[t0 - T, tf + T], replans the swing splines, and freezes everything —
gait, swing splines, target trajectory, and the (event-snapped) node time
grid — into device tables consumed by the jitted SQP.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from ..gait.mode_schedule import (
    GaitSchedule,
    GaitTable,
    ModeSequenceTemplate,
    freeze_mode_schedule,
)
from ..gait.swing import SwingConfig, SwingTable, plan_swing_table
from .target import TargetTable, TargetTrajectories


class FrozenReferences(NamedTuple):
    gait: GaitTable
    swing: SwingTable
    target: TargetTable
    t_nodes: np.ndarray  # (N+1,) host-side node grid


def build_time_grid(t0: float, horizon: float, num_intervals: int, event_times) -> np.ndarray:
    """Uniform grid with nodes snapped to mode-switch times.

    OCS2 inserts event times into the shooting grid so constraint activation
    changes exactly at phase boundaries; with static shapes we instead *move*
    the nearest interior node onto each event (keeping N fixed)."""
    grid = np.linspace(t0, t0 + horizon, num_intervals + 1)
    dt = horizon / num_intervals
    eps = 1e-9
    for ev in event_times:
        if ev <= t0 + eps or ev >= t0 + horizon - eps or not np.isfinite(ev):
            continue
        idx = int(np.clip(round((ev - t0) / dt), 1, num_intervals - 1))
        grid[idx] = ev
    # enforce strict monotonicity in pathological clusters
    for i in range(1, len(grid)):
        if grid[i] <= grid[i - 1]:
            grid[i] = grid[i - 1] + 1e-6
    return grid


@dataclasses.dataclass
class ReferenceManager:
    """Host-side mutable references; freeze() per solve."""

    gait_schedule: GaitSchedule
    swing_config: SwingConfig
    target: TargetTrajectories
    horizon: float
    num_intervals: int
    max_phases: int = 24
    max_targets: int = 8
    terrain_height: float = 0.0

    def set_target(self, target: TargetTrajectories) -> None:
        self.target = target

    def set_gait(self, template: ModeSequenceTemplate, start_time: float) -> None:
        """Gait command semantics (GaitReceiver::preSolverRun): splice the new
        template at the end of the current horizon."""
        self.gait_schedule.insert_mode_sequence_template(
            template, start_time, start_time + self.horizon
        )

    def freeze(self, t0: float) -> FrozenReferences:
        tf = t0 + self.horizon
        schedule = self.gait_schedule.get_mode_schedule(t0 - self.horizon, tf + self.horizon)
        gait_table = freeze_mode_schedule(schedule, self.max_phases)
        swing_table = plan_swing_table(
            self.swing_config, schedule, self.max_phases, self.terrain_height
        )
        target_table = self.target.freeze(self.max_targets)
        t_nodes = build_time_grid(t0, self.horizon, self.num_intervals, schedule.event_times)
        return FrozenReferences(gait_table, swing_table, target_table, t_nodes)
