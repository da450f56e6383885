"""Whole-body-control task formulation (WbcBase equivalent, pure JAX).

Decision vector  x = [vdot (6+nj); F_contact (12); tau (nj)]
(bipedal_wbc/src/WbcBase.cpp:37, bipedal_wbc/README.md).

Every task is (a, b, d, f): equality a x = b, inequality d x <= f.  Tasks keep
**static shapes**: contact-mode-dependent rows are masked (zeroed) instead of
resized, so the downstream QP (wbc/qp.py) compiles once and batches.

Conventions match WbcBase.cpp: measured quantities from rbdState (Euler-rate
generalized velocities), desired quantities from the MPC (x*, u*) through the
centroidal mapping, LOCAL_WORLD_ALIGNED Jacobians.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model.centroidal import (
    CentroidalModelInfo,
    base_kinematics_from_centroidal,
    generalized_from_rbd,
    generalized_velocity_from_state_input,
    get_contact_forces,
    get_generalized_coordinates,
)
from ..model.dynamics import mass_matrix, nonlinear_effects
from ..model.kinematics import (
    forward_kinematics,
    frame_jacobian,
    frame_jacobian_dot,
    frame_position,
)
from ..utils.rotations import (
    global_angular_velocity_from_zyx_rates,
    rotation_error_in_world,
    rotmat_from_zyx,
)

NUM_CONTACTS = 4


@dataclasses.dataclass(frozen=True)
class WbcTaskConfig:
    """task.info WBC blocks (torqueLimitsTask .. weight, task.info:289-342)."""

    torque_limit_per_leg: tuple  # (nj/2,)
    friction_coefficient: float = 0.3
    swing_kp: float = 350.0
    swing_kd: float = 37.0
    base_kp: tuple = (40.0, 40.0, 20.0, 20.0, 20.0, 20.0)
    base_kd: tuple = (4.0, 4.0, 3.0, 3.0, 3.0, 3.0)
    no_contact_motion_tolerance: float = 5.0
    weight_swing_leg: float = 100.0
    weight_base_accel: float = 1.0
    weight_contact_force: float = 0.01
    # Null-space regularization: in full stance no weighted task touches the
    # joint accelerations (the +-tolerance no-contact band leaves them free),
    # so the QP optimum is degenerate.  qpOASES's zero-initialized active-set
    # implicitly returns a small solution; the ADMM needs the preference made
    # explicit or the null space fills with tens of rad/s^2 that leak into
    # the torques through the EoM.
    accel_reg: float = 1e-2
    force_reg: float = 1e-6
    torque_reg: float = 1e-6


class Task(NamedTuple):
    a: jnp.ndarray  # (ra, ndec)
    b: jnp.ndarray  # (ra,)
    d: jnp.ndarray  # (rd, ndec)
    f: jnp.ndarray  # (rd,)


def concat_tasks(tasks):
    return Task(
        a=jnp.concatenate([t.a for t in tasks], axis=0),
        b=jnp.concatenate([t.b for t in tasks], axis=0),
        d=jnp.concatenate([t.d for t in tasks], axis=0),
        f=jnp.concatenate([t.f for t in tasks], axis=0),
    )


class WbcKinematics(NamedTuple):
    """Measured- and desired-side quantities shared across tasks."""

    q_m: jnp.ndarray
    v_m: jnp.ndarray
    M: jnp.ndarray  # (nv,nv)
    nle: jnp.ndarray  # (nv,)
    Jc: jnp.ndarray  # (nc,3,nv) contact Jacobians (linear rows)
    dJc: jnp.ndarray  # (nc,3,nv)
    base_J: jnp.ndarray  # (6,nv)
    base_dJ: jnp.ndarray  # (6,nv)
    p_contact_m: jnp.ndarray  # (nc,3)
    v_contact_m: jnp.ndarray  # (nc,3)
    # desired side
    q_d: jnp.ndarray
    v_d: jnp.ndarray
    p_contact_d: jnp.ndarray
    v_contact_d: jnp.ndarray
    base_pose_d: jnp.ndarray  # (6,)
    base_vel_d: jnp.ndarray  # (6,) world [v; omega]
    base_acc_d: jnp.ndarray  # (6,)
    forces_d: jnp.ndarray  # (nc,3)


def num_decision_vars(info: CentroidalModelInfo) -> int:
    return info.generalized_dim + 3 * NUM_CONTACTS + info.nj


def compute_wbc_kinematics(model, info: CentroidalModelInfo, x_des, u_des, rbd_measured) -> WbcKinematics:
    """updateMeasured + updateDesired (WbcBase.cpp:59-158)."""
    q_m, v_m = generalized_from_rbd(info, rbd_measured)
    kin_m = forward_kinematics(model, q_m)
    M = mass_matrix(model, q_m)
    nle = nonlinear_effects(model, q_m, v_m)
    Jc, dJc, p_m, v_c_m = [], [], [], []
    for fid in info.contact_frame_ids:
        J = frame_jacobian(model, q_m, fid)
        dJ = frame_jacobian_dot(model, q_m, v_m, fid)
        Jc.append(J[:3])
        dJc.append(dJ[:3])
        p_m.append(frame_position(model, kin_m, fid))
        v_c_m.append(J[:3] @ v_m)
    base_fid = model.frame_index(model.frame_names[0])  # root link frame
    base_J = frame_jacobian(model, q_m, base_fid)
    base_dJ = frame_jacobian_dot(model, q_m, v_m, base_fid)

    q_d = get_generalized_coordinates(x_des)
    v_d = generalized_velocity_from_state_input(model, info, x_des, u_des)
    kin_d = forward_kinematics(model, q_d)
    p_d, v_c_d = [], []
    for fid in info.contact_frame_ids:
        J = frame_jacobian(model, q_d, fid)
        p_d.append(frame_position(model, kin_d, fid))
        v_c_d.append(J[:3] @ v_d)
    pose_d, vel_d, acc_d = base_kinematics_from_centroidal(
        model, info, x_des, u_des, jnp.zeros(info.nj)
    )
    return WbcKinematics(
        q_m=q_m, v_m=v_m, M=M, nle=nle,
        Jc=jnp.stack(Jc), dJc=jnp.stack(dJc),
        base_J=base_J, base_dJ=base_dJ,
        p_contact_m=jnp.stack(p_m), v_contact_m=jnp.stack(v_c_m),
        q_d=q_d, v_d=v_d,
        p_contact_d=jnp.stack(p_d), v_contact_d=jnp.stack(v_c_d),
        base_pose_d=pose_d, base_vel_d=vel_d, base_acc_d=acc_d,
        forces_d=get_contact_forces(u_des, info),
    )


# -------------------------------------------------------------- constraints
def floating_base_eom_task(info, kin: WbcKinematics) -> Task:
    """M vdot + nle = Jc^T F + S^T tau (WbcBase::formulateFloatingBaseEomTask)."""
    nv = info.generalized_dim
    nj = info.nj
    ndec = num_decision_vars(info)
    Jc_flat = kin.Jc.reshape(3 * NUM_CONTACTS, nv)
    S_T = jnp.concatenate([jnp.zeros((6, nj)), jnp.eye(nj)], axis=0)
    a = jnp.concatenate([kin.M, -Jc_flat.T, -S_T], axis=1)
    b = -kin.nle
    return Task(a=a, b=b, d=jnp.zeros((0, ndec)), f=jnp.zeros(0))


def torque_limits_task(info, cfg: WbcTaskConfig) -> Task:
    """|tau| <= limits, per-leg pattern (WbcBase::formulateTorqueLimitsTask)."""
    nj = info.nj
    ndec = num_decision_vars(info)
    off = info.generalized_dim + 3 * NUM_CONTACTS
    eye = jnp.zeros((nj, ndec)).at[:, off : off + nj].set(jnp.eye(nj))
    d = jnp.concatenate([eye, -eye], axis=0)
    limits = jnp.tile(jnp.asarray(cfg.torque_limit_per_leg), 2)
    f = jnp.concatenate([limits, limits])
    return Task(a=jnp.zeros((0, ndec)), b=jnp.zeros(0), d=d, f=f)


def friction_cone_task(info, cfg: WbcTaskConfig, contact_flags) -> Task:
    """Swing contacts: F = 0 (equality); stance contacts: 5-row friction
    pyramid (WbcBase::formulateFrictionConeTask), masked by flags."""
    ndec = num_decision_vars(info)
    off = info.generalized_dim
    mu = cfg.friction_coefficient
    pyramid = jnp.asarray(
        [
            [0.0, 0.0, -1.0],
            [1.0, 0.0, -mu],
            [-1.0, 0.0, -mu],
            [0.0, 1.0, -mu],
            [0.0, -1.0, -mu],
        ]
    )
    a_rows, d_rows = [], []
    for i in range(NUM_CONTACTS):
        swing = 1.0 - contact_flags[i]
        block = jnp.zeros((3, ndec)).at[:, off + 3 * i : off + 3 * i + 3].set(jnp.eye(3))
        a_rows.append(swing * block)
        dblock = jnp.zeros((5, ndec)).at[:, off + 3 * i : off + 3 * i + 3].set(pyramid)
        d_rows.append(contact_flags[i] * dblock)
    a = jnp.concatenate(a_rows, axis=0)
    d = jnp.concatenate(d_rows, axis=0)
    return Task(a=a, b=jnp.zeros(a.shape[0]), d=d, f=jnp.zeros(d.shape[0]))


def no_contact_motion_task(info, cfg: WbcTaskConfig, kin: WbcKinematics, contact_flags) -> Task:
    """Stance-foot no-motion: Jc vdot = -dJc v per stance contact (equality).

    Note: the reference's active implementation builds a +-tolerance band
    whose second block carries a sign error (WbcBase.cpp:176-208: the rows
    combine to pin foot acceleration to +tolerance on every axis); the
    commented-out equality version — the original legged_control formulation
    — is the correct one and is what we implement.  The equality also removes
    the joint-acceleration null space that otherwise destabilizes the
    torque output."""
    nv = info.generalized_dim
    ndec = num_decision_vars(info)
    a_rows, b_rows = [], []
    for i in range(NUM_CONTACTS):
        m = contact_flags[i]
        blk = jnp.zeros((3, ndec)).at[:, :nv].set(kin.Jc[i])
        a_rows.append(m * blk)
        b_rows.append(m * (-(kin.dJc[i] @ kin.v_m)))
    return Task(
        a=jnp.concatenate(a_rows, axis=0),
        b=jnp.concatenate(b_rows),
        d=jnp.zeros((0, ndec)),
        f=jnp.zeros(0),
    )


# -------------------------------------------------------------- weighted tasks
def swing_leg_task(info, cfg: WbcTaskConfig, kin: WbcKinematics, contact_flags) -> Task:
    """PD acceleration tracking for swing feet (WbcBase::formulateSwingLegTask),
    masked by swing flags."""
    nv = info.generalized_dim
    ndec = num_decision_vars(info)
    a_rows, b_rows = [], []
    for i in range(NUM_CONTACTS):
        swing = 1.0 - contact_flags[i]
        accel = cfg.swing_kp * (kin.p_contact_d[i] - kin.p_contact_m[i]) + cfg.swing_kd * (
            kin.v_contact_d[i] - kin.v_contact_m[i]
        )
        blk = jnp.zeros((3, ndec)).at[:, :nv].set(kin.Jc[i])
        a_rows.append(swing * blk)
        b_rows.append(swing * (accel - kin.dJc[i] @ kin.v_m))
    return Task(
        a=jnp.concatenate(a_rows, axis=0),
        b=jnp.concatenate(b_rows),
        d=jnp.zeros((0, ndec)),
        f=jnp.zeros(0),
    )


def base_accel_pd_task(info, cfg: WbcTaskConfig, kin: WbcKinematics) -> Task:
    """World-frame PD on the base (WbcBase::formulateBaseAccelPDTask).

    Note: the reference computes the angular-velocity error from the *linear*
    rows (WbcBase.cpp:280, a latent copy-paste bug flagged in SURVEY.md §2
    item 19); we use the actual angular velocity error.
    """
    nv = info.generalized_dim
    ndec = num_decision_vars(info)
    a = jnp.zeros((6, ndec))
    a = a.at[:3, :3].set(jnp.eye(3))
    a = a.at[3:6, :nv].set(kin.base_J[3:6])

    theta_m = kin.q_m[3:6]
    omega_m = global_angular_velocity_from_zyx_rates(theta_m, kin.v_m[3:6])
    kp = jnp.asarray(cfg.base_kp)
    kd = jnp.asarray(cfg.base_kd)

    pos_err = kin.base_pose_d[:3] - kin.q_m[:3]
    vel_err = kin.base_vel_d[:3] - kin.v_m[:3]
    rot_err = rotation_error_in_world(
        rotmat_from_zyx(kin.base_pose_d[3:6]), rotmat_from_zyx(theta_m)
    )
    omega_err = kin.base_vel_d[3:] - omega_m

    b_lin = kin.base_acc_d[:3] + kp[:3] * pos_err + kd[:3] * vel_err
    b_ang = (
        kin.base_acc_d[3:]
        + kp[3:] * rot_err
        + kd[3:] * omega_err
        - kin.base_dJ[3:6] @ kin.v_m
    )
    return Task(
        a=a, b=jnp.concatenate([b_lin, b_ang]), d=jnp.zeros((0, ndec)), f=jnp.zeros(0)
    )


def contact_force_task(info, kin: WbcKinematics) -> Task:
    """F == F_desired for every contact (WbcBase::formulateContactForceTask)."""
    ndec = num_decision_vars(info)
    off = info.generalized_dim
    nfc = 3 * NUM_CONTACTS
    a = jnp.zeros((nfc, ndec)).at[:, off : off + nfc].set(jnp.eye(nfc))
    return Task(a=a, b=kin.forces_d.reshape(-1), d=jnp.zeros((0, ndec)), f=jnp.zeros(0))


def scale_task(task: Task, w) -> Task:
    return Task(a=w * task.a, b=w * task.b, d=task.d, f=task.f)
