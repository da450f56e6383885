"""On-device batched physics — the MJX-role backend (SURVEY §7.1 layer 8).

MuJoCo-on-JAX is not available in this environment, so this is a self-built
rigid-body simulator on the framework's own validated model stack
(model/dynamics.py CRBA/NLE, validated against MuJoCo): full floating-base
dynamics in generalized coordinates q = [p_base, euler-zyx, q_j] with
coordinate-rate velocities, compliant ground contact at the four contact
frames, and the reference's hybrid-joint PD actuation law closed at the
physics rate (ctrl = ff + kp (posDes - q) + kd (velDes - dq),
BipedalMujocoHW.cpp:206-218).

Everything is jittable and vmappable: thousands of domain-randomized
scenarios step in one XLA program (BASELINE config 5), and the whole
MPC -> policy -> WBC -> physics cascade closes on-device with no host round
trips (sim/batch_loop.py).

Contact model (standard compliant formulation, stable by construction):
- normal: Kelvin-Voigt spring-damper, spring explicit, damper IMPLICIT
  (folded into the mass-matrix solve — the damper acts on the ~0.5 kg foot
  link, whose explicit stability limit is below the step size);
- tangential: anchored spring (stiction) + implicit viscous damping, with
  the spring force capped by the Coulomb cone mu * f_n; on cap violation the
  anchor is projected back onto the friction cone (slip).  A purely viscous
  tangential model has no static friction — a standing robot creeps and
  topples; the anchor spring is what makes stance feet actually stick.
- joint damping (actuator kd) is also implicit, so any PD gains are stable.

This will not bit-match MuJoCo's LCP-style solver; fidelity is validated
behaviorally (static force balance, drop-settle, closed-loop balance parity
with the host-MuJoCo loop in tests/test_jax_physics.py).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model.dynamics import mass_matrix, nonlinear_effects
from ..model.kinematics import forward_kinematics, frame_transform, stacked_point_jacobians


@dataclasses.dataclass(frozen=True)
class JaxSimConfig:
    dt: float = 1.0 / 1000.0  # physics substep
    contact_kp: float = 30000.0  # normal spring [N/m]
    contact_kd: float = 1000.0  # normal damper [N s/m] (implicit)
    tangent_kp: float = 5000.0  # tangential anchor spring [N/m]
    tangent_kd: float = 300.0  # tangential damper [N s/m] (implicit)
    friction_mu: float = 0.7  # ground Coulomb coefficient
    torque_limit: float = 300.0  # actuator clamp [N m]
    ground_height: float = 0.0


class JaxSimState(NamedTuple):
    q: jnp.ndarray  # (6+nj,) [p_base, euler-zyx, q_j]
    v: jnp.ndarray  # (6+nj,) coordinate rates
    anchor: jnp.ndarray  # (nc, 2) tangential stick anchors (world xy)


def _contact_points(model, info, kin):
    return jnp.stack([frame_transform(model, kin, f)[1] for f in info.contact_frame_ids])


def _contact_jacobians(model, info, kin, pts):
    import numpy as np

    anc = np.asarray(model.ancestor_mask())[
        [int(model.frame_body[f]) for f in info.contact_frame_ids]
    ]
    return stacked_point_jacobians(model, kin, pts, anc)[:, :3, :]  # (nc, 3, nv)


def sim_step(model, info, cfg: JaxSimConfig, state: JaxSimState, tau_joint, joint_damping=0.0):
    """One physics substep under joint torques (nj,).

    ``joint_damping`` (scalar or (nj,)) integrates implicitly; pass the PD kd
    here and put only ff + kp (posDes - q) + kd velDes in ``tau_joint``
    (:func:`hybrid_pd_torque_explicit` does the split)."""
    q, v, anchor = state
    kin = forward_kinematics(model, q)
    pts = _contact_points(model, info, kin)
    J = _contact_jacobians(model, info, kin, pts)

    depth = cfg.ground_height - pts[:, 2]
    in_c = (depth > 0.0).astype(q.dtype)
    f_n = cfg.contact_kp * depth * in_c  # explicit spring part

    # tangential anchor spring with Coulomb-cone projection
    f_t_raw = -cfg.tangent_kp * (pts[:, :2] - anchor)  # (nc, 2)
    f_t_norm = jnp.sqrt(jnp.sum(f_t_raw * f_t_raw, axis=-1) + 1e-12)
    scale = in_c * jnp.minimum(1.0, cfg.friction_mu * f_n / f_t_norm)
    f_t = scale[:, None] * f_t_raw
    # slip: project the anchor back so the spring sits on the cone;
    # swing feet re-anchor at their current position
    anchor_new = jnp.where(
        (in_c * scale)[:, None] > 0.0,
        pts[:, :2] + (anchor - pts[:, :2]) * scale[:, None],
        pts[:, :2],
    )
    f_ext = jnp.concatenate([f_t, f_n[:, None]], axis=-1)  # (nc, 3) explicit

    nv = q.shape[0]
    tau_gen = jnp.zeros(nv).at[6:].set(
        jnp.clip(tau_joint, -cfg.torque_limit, cfg.torque_limit)
    )
    tau_gen = tau_gen + jnp.sum(J.transpose(0, 2, 1) @ f_ext[:, :, None], axis=0)[:, 0]

    M = mass_matrix(model, q)
    h = nonlinear_effects(model, q, v)
    d = jnp.zeros(nv).at[6:].set(jnp.broadcast_to(jnp.asarray(joint_damping), (nv - 6,)))
    # implicit damping: (M + dt (D + sum_i J_i^T C_i J_i)) vdot =
    #   tau + J^T f_ext - h - D v - sum_i J_i^T C_i (J_i v)
    C = jnp.stack(
        [in_c * cfg.tangent_kd, in_c * cfg.tangent_kd, in_c * cfg.contact_kd], axis=-1
    )  # (nc, 3) per-axis damping coefficients
    JC = J * C[:, :, None]
    Dc = jnp.sum(J.transpose(0, 2, 1) @ JC, axis=0)  # (nv, nv)
    lhs = M + cfg.dt * (jnp.diag(d) + Dc)
    rhs = tau_gen - h - d * v - Dc @ v
    vdot = jnp.linalg.solve(lhs, rhs)
    v_new = v + cfg.dt * vdot
    q_new = q + cfg.dt * v_new  # coordinate rates integrate directly
    forces = f_ext - C * (J @ v_new)  # reported incl. implicit damper part
    return JaxSimState(q=q_new, v=v_new, anchor=anchor_new), forces


def hybrid_pd_torque_explicit(cmd_pos, cmd_vel, kp, kd, tau_ff, q_j):
    """Explicit part of the hybrid-joint law (BipedalMujocoHW::write
    semantics); the -kd dq term goes through sim_step's implicit damping."""
    return tau_ff + kp * (cmd_pos - q_j) + kd * cmd_vel


def rbd_state_from_sim(model, state: JaxSimState) -> jnp.ndarray:
    """Ground-truth rbdState [euler, pos, q_j, omega_w, v_w, dq_j] from the
    sim state (cheater-estimator source for the on-device loop)."""
    from ..utils.rotations import global_angular_velocity_from_zyx_rates

    q, v = state.q, state.v
    omega_w = global_angular_velocity_from_zyx_rates(q[3:6], v[3:6])
    return jnp.concatenate([q[3:6], q[0:3], q[6:], omega_w, v[0:3], v[6:]])


def initial_sim_state(model, info, x0) -> JaxSimState:
    """At rest at the centroidal initial state's pose, anchors under the feet."""
    q = jnp.asarray(x0)[6:]
    kin = forward_kinematics(model, q)
    pts = _contact_points(model, info, kin)
    return JaxSimState(q=q, v=jnp.zeros_like(q), anchor=pts[:, :2])
