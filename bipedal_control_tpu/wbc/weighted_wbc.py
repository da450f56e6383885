"""Weighted whole-body QP (WeightedWbc equivalent).

Stacks hard constraints (EoM + torque limits + friction/zero-force +
no-contact-motion) and the weighted task rows (swing-leg * w_swing +
base-PD * w_base + contact-force * w_force), forms H = A^T A, g = -A^T b like
WeightedWbc.cpp:48-51, and hands the QP to the batched ADMM solver.

One jittable function; batch scenarios with vmap.  The reference's
"reuse last solution on failure" lives in the runtime controller, which owns
state (runtime/controller.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..model.centroidal import CentroidalModelInfo
from .qp import QpSolution, solve_qp
from .tasks import (
    WbcKinematics,
    WbcTaskConfig,
    base_accel_pd_task,
    compute_wbc_kinematics,
    concat_tasks,
    contact_force_task,
    floating_base_eom_task,
    friction_cone_task,
    no_contact_motion_task,
    num_decision_vars,
    scale_task,
    swing_leg_task,
    torque_limits_task,
)

_BIG = 1e20


class WbcResult(NamedTuple):
    decision: jnp.ndarray  # [vdot; F; tau]
    torque: jnp.ndarray  # (nj,)
    qp: QpSolution


def wbc_update(
    model,
    info: CentroidalModelInfo,
    cfg: WbcTaskConfig,
    x_desired,
    u_desired,
    rbd_measured,
    contact_flags,
    qp_iters: int = 120,
) -> WbcResult:
    kin = compute_wbc_kinematics(model, info, x_desired, u_desired, rbd_measured)
    constraints = concat_tasks(
        [
            floating_base_eom_task(info, kin),
            torque_limits_task(info, cfg),
            friction_cone_task(info, cfg, contact_flags),
            no_contact_motion_task(info, cfg, kin, contact_flags),
        ]
    )
    weighted = concat_tasks(
        [
            scale_task(swing_leg_task(info, cfg, kin, contact_flags), cfg.weight_swing_leg),
            scale_task(base_accel_pd_task(info, cfg, kin), cfg.weight_base_accel),
            scale_task(contact_force_task(info, kin), cfg.weight_contact_force),
        ]
    )
    H = weighted.a.T @ weighted.a
    nv = info.generalized_dim
    nfc = 3 * 4
    reg = jnp.concatenate(
        [
            jnp.full(nv, cfg.accel_reg),
            jnp.full(nfc, cfg.force_reg),
            jnp.full(info.nj, cfg.torque_reg),
        ]
    )
    H = H + jnp.diag(reg)
    g = -weighted.a.T @ weighted.b
    # rows: equalities (l = u = b) then inequalities (-inf, f]
    A = jnp.concatenate([constraints.a, constraints.d], axis=0)
    l = jnp.concatenate([constraints.b, -_BIG * jnp.ones(constraints.f.shape[0])])  # noqa: E741
    u = jnp.concatenate([constraints.b, constraints.f])
    sol = solve_qp(H, g, A, l, u, iters=qp_iters)
    nj = info.nj
    return WbcResult(decision=sol.x, torque=sol.x[-nj:], qp=sol)


__all__ = ["WbcResult", "WbcTaskConfig", "wbc_update", "num_decision_vars", "WbcKinematics"]


def wbc_update_batch(model, info, cfg, x_des_b, u_des_b, rbd_b, flags_b, qp_iters: int = 120):
    """Scenario-batched WBC (vmap over the leading axis) — the 400 Hz stage of
    large domain-randomized sweeps (BASELINE config 5)."""
    import jax

    return jax.vmap(
        lambda x, u, r, f: wbc_update(model, info, cfg, x, u, r, f, qp_iters=qp_iters)
    )(x_des_b, u_des_b, rbd_b, flags_b)
