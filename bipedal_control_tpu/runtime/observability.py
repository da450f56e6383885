"""Observability: solver constraint observers + tracking-error debug metrics.

Replaces the reference's observability stack (SURVEY.md §5.5):
- per-constraint SolverObserver terms the MPC nodes publish for multiplot
  (BipedalRobotSqpMpcNode.cpp:75-87: friction-cone and zero-velocity
  violations along the optimized trajectory);
- the DebugPublisher desired-vs-measured comparisons and TrackingError
  message (bipedal_controllers/src/debug/DebugPublisher.cpp:38-180,
  msg/TrackingError.msg).

Everything returns plain dict/array records; stream them to whatever sink
(stdout, npz, tensorboard) the deployment uses.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model.centroidal import (
    CentroidalModelInfo,
    generalized_from_rbd,
    get_generalized_coordinates,
)
from ..model.kinematics import forward_kinematics, frame_position
from ..ocp.problem import NodeRefs, OcpSettings, equality_residual, friction_cone_values
from ..solver.sqp import SqpSolution, eq_mask_from_flags


class ConstraintObservation(NamedTuple):
    """Per-node constraint terms along an optimized trajectory."""

    t: np.ndarray  # (N,)
    friction_cone: np.ndarray  # (N, nc) cone margin h_i (>=0 feasible); nan when swing
    zero_velocity: np.ndarray  # (N, nc) stance-foot speed residual norm
    normal_velocity: np.ndarray  # (N, nc) swing z-velocity residual; nan when stance


def observe_constraints(
    model, info: CentroidalModelInfo, settings: OcpSettings, sol: SqpSolution, refs: NodeRefs
) -> ConstraintObservation:
    """SolverObserver analogue: evaluate the constraint families node-wise."""

    def per_node(x, u, ref):
        cones = friction_cone_values(settings, u, info)
        e = equality_residual(model, info, settings, x, u, ref)
        zv = jnp.linalg.norm(e[:12].reshape(4, 3), axis=1)
        nv = e[12:]
        return cones, zv, nv

    cones, zv, nv = jax.vmap(per_node)(sol.x_traj[:-1], sol.u_traj, refs)
    flags = np.asarray(refs.contact_flags)
    cones = np.where(flags > 0.5, np.asarray(cones), np.nan)
    zv = np.where(flags > 0.5, np.asarray(zv), np.nan)
    nv = np.where(flags < 0.5, np.asarray(nv), np.nan)
    return ConstraintObservation(
        t=np.asarray(refs.t), friction_cone=cones, zero_velocity=zv, normal_velocity=nv
    )


class TrackingError(NamedTuple):
    """Desired-vs-measured snapshot (TrackingError.msg analogue)."""

    base_position_error: np.ndarray  # (3,)
    base_orientation_error: np.ndarray  # (3,) euler-zyx difference
    base_velocity_error: np.ndarray  # (3,)
    foot_position_error: np.ndarray  # (nc, 3)
    joint_position_error: np.ndarray  # (nj,)


def tracking_error(
    model, info: CentroidalModelInfo, x_desired, rbd_measured
) -> TrackingError:
    """DebugPublisher analogue: dual FK evaluation desired vs measured."""
    q_d = get_generalized_coordinates(jnp.asarray(x_desired))
    q_m, v_m = generalized_from_rbd(info, jnp.asarray(rbd_measured))
    kin_d = forward_kinematics(model, q_d)
    kin_m = forward_kinematics(model, q_m)
    feet_d = jnp.stack([frame_position(model, kin_d, f) for f in info.contact_frame_ids])
    feet_m = jnp.stack([frame_position(model, kin_m, f) for f in info.contact_frame_ids])
    h_norm_d = jnp.asarray(x_desired)[0:3]
    return TrackingError(
        base_position_error=np.asarray(q_d[0:3] - q_m[0:3]),
        base_orientation_error=np.asarray(q_d[3:6] - q_m[3:6]),
        base_velocity_error=np.asarray(h_norm_d - v_m[0:3]),
        foot_position_error=np.asarray(feet_d - feet_m),
        joint_position_error=np.asarray(q_d[6:] - q_m[6:]),
    )


def solve_report(sol: SqpSolution) -> dict:
    """One-line machine-readable solve summary (printSolverStatistics analog)."""
    return {
        "cost": float(sol.cost),
        "defect_l1": float(sol.defect_norm),
        "eq_l1": float(sol.eq_norm),
        "step_size": float(sol.step_size),
        "horizon_nodes": int(sol.x_traj.shape[0]),
    }
