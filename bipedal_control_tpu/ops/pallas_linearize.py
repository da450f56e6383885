"""Pallas TPU kernels: whole-node OCP linearization + merit evaluation.

Why: the XLA linearization/merit pipeline evaluates ~300 small tensor ops per
shooting node whose per-instance operands are tiny ((nb,3), (nv,3), (nc,3,nv)
...).  Under the scenario x horizon vmap (~17k instances at B=256) every one
of those ops runs with 3- or 22-wide minor dimensions — 2-17% VPU lane
utilization — and the framework-op profile shows the solve step dominated by
lane-starved reduce/cross/concat chains no XLA-level rewrite can fix (the
dot_general -> broadcast-reduce rewrite just moved the time into reduce_sum).

This module instead evaluates the model with the fused (node x scenario)
instance axis on the 128-wide LANE dimension and everything per-instance
unrolled at trace time:

- scalars are (1, L) arrays, 3-vectors are component-split triples of (S, L)
  arrays (crosses/dots become 6-op scalar formulas — no slices, no
  transposes, no concat relayouts), rotation matrices are 9-entry lists;
- per-coordinate field data is coordinate-stacked ((nv, L) arrays, nv=16 for
  H1 => 100% sublane utilization on f32 tiles);
- all model constants (joint offsets, axes, inertias, masses, masks) are
  baked in as Python floats at trace time, with zero-entry pruning — the
  rigid-body tree becomes a flat arithmetic circuit;
- the math mirrors model/kinematics.py, model/second_order.py (velocity-field
  algebra, the dA(q)v directional derivative), and ocp/linearize.py
  node-by-node; outputs are produced directly in the (rows, cols, lanes)
  batch-last layout the whole-sweep Riccati kernel (pallas_riccati.py)
  consumes.

Validated against linearize_node_structured / node_eval in f64 interpret mode
(tests/test_pallas_linearize.py).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.robot_model import RobotModel
from ..model.urdf import JOINT_PRISMATIC, JOINT_REVOLUTE

LANE = 128
_PRUNE = 1e-14  # treat |constant| below this as exactly zero when unrolling


# --------------------------------------------------------------------- algebra
# triple = (x, y, z) arrays of shape (S, L); mat3 = row-major 9-list.
def t_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def t_sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def t_scale(s, a):
    return tuple(s * x for x in a)


def t_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def t_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def m3_mul_const(M, C):
    """mat3 @ constant 3x3 (python floats), pruning zero terms."""
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for k in range(3):
                c = float(C[k][j]) if not isinstance(C, np.ndarray) else float(C[k, j])
                if abs(c) < _PRUNE:
                    continue
                term = M[3 * i + k] * c
                acc = term if acc is None else acc + term
            out.append(acc if acc is not None else jnp.zeros_like(M[0]))
    return out


def m3_mul(A, B):
    """mat3 @ mat3 (both 9-lists)."""
    return [
        sum(A[3 * i + k] * B[3 * k + j] for k in range(3)) for i in range(3) for j in range(3)
    ]


def m3_vec(M, v):
    """mat3 @ triple."""
    return tuple(M[3 * i + 0] * v[0] + M[3 * i + 1] * v[1] + M[3 * i + 2] * v[2] for i in range(3))


def m3T_vec(M, v):
    """mat3^T @ triple."""
    return tuple(M[0 + i] * v[0] + M[3 + i] * v[1] + M[6 + i] * v[2] for i in range(3))


def m3_vec_const(M, c3):
    """mat3 @ constant 3-vector (floats), pruned."""
    out = []
    for i in range(3):
        acc = None
        for k in range(3):
            c = float(c3[k])
            if abs(c) < _PRUNE:
                continue
            term = M[3 * i + k] * c
            acc = term if acc is None else acc + term
        out.append(acc if acc is not None else jnp.zeros_like(M[0]))
    return tuple(out)


def const_triple(c3, like):
    return tuple(
        jnp.full_like(like, float(c)) if abs(float(c)) >= _PRUNE else jnp.zeros_like(like)
        for c in c3
    )


# --------------------------------------------------------------------- statics
@dataclasses.dataclass
class StaticModel:
    """All robot constants as numpy/python, extracted once at trace time."""

    nj: int
    nb: int
    nv: int
    parent: list[int]
    jtype: list[int]
    axis: np.ndarray  # (nj, 3)
    off_R: np.ndarray  # (nj, 3, 3)
    off_p: np.ndarray  # (nj, 3)
    mass: np.ndarray  # (nb,)
    total_mass: float
    com: np.ndarray  # (nb, 3)
    inertia: np.ndarray  # (nb, 3, 3)
    anc: np.ndarray  # (nb, nj) bool: joint j moves body b
    contact_body: list[int]
    contact_R: np.ndarray  # (nc, 3, 3)
    contact_p: np.ndarray  # (nc, 3)
    children: list[list[int]]  # body -> child bodies


def make_static_model(model: RobotModel, contact_frame_ids) -> StaticModel:
    anc = model.ancestor_mask()
    nb = model.nb
    parent = [int(model.joint_parent_body[j]) for j in range(model.nj)]
    children = [[] for _ in range(nb)]
    for j in range(model.nj):
        children[parent[j]].append(j + 1)
    return StaticModel(
        nj=model.nj,
        nb=nb,
        nv=model.nv,
        parent=parent,
        jtype=[int(t) for t in model.joint_type],
        axis=np.asarray(model.joint_axis, dtype=np.float64),
        off_R=np.asarray(model.joint_offset_R, dtype=np.float64),
        off_p=np.asarray(model.joint_offset_p, dtype=np.float64),
        mass=np.asarray(model.body_mass, dtype=np.float64),
        total_mass=float(np.sum(np.asarray(model.body_mass, dtype=np.float64))),
        com=np.asarray(model.body_com, dtype=np.float64),
        inertia=np.asarray(model.body_inertia, dtype=np.float64),
        anc=np.asarray(anc, dtype=bool),
        contact_body=[int(model.frame_body[f]) for f in contact_frame_ids],
        contact_R=np.stack([np.asarray(model.frame_R[f], dtype=np.float64) for f in contact_frame_ids]),
        contact_p=np.stack([np.asarray(model.frame_p[f], dtype=np.float64) for f in contact_frame_ids]),
        children=children,
    )


# --------------------------------------------------------------------- FK
class KinLanes(NamedTuple):
    """Forward kinematics with instances on lanes."""

    R: list  # per body: mat3 (9-list of (1, L))
    p: list  # per body: triple
    E: list  # mat3: Euler-rate map, omega_world = E theta_dot
    cz: object
    sz: object
    cy: object
    sy: object
    cx: object
    sx: object


def fk_lanes(sm: StaticModel, p_b, theta, q_j) -> KinLanes:
    """p_b: triple (1,L); theta: triple (z, y, x); q_j: (nj, L)."""
    z, y, x = theta
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    R0 = [
        cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
        sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
        -sy, cy * sx, cy * cx,
    ]
    zero = jnp.zeros_like(cz)
    one = jnp.ones_like(cz)
    E = [zero, -sz, cy * cz, zero, cz, cy * sz, one, zero, -sy]

    R = [R0]
    p = [p_b]
    for j in range(sm.nj):
        par = sm.parent[j]
        Rp, pp = R[par], p[par]
        R_j = m3_mul_const(Rp, sm.off_R[j])
        p_j = t_add(pp, m3_vec_const(Rp, sm.off_p[j]))
        qj = q_j[j : j + 1, :]
        a = sm.axis[j]
        if sm.jtype[j] == JOINT_REVOLUTE:
            c, s = jnp.cos(qj), jnp.sin(qj)
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
            KK = K @ K
            # R_m[i][k] = I + s K + (1-c) KK, entries as scalar expressions
            Rm = []
            for i in range(3):
                for k in range(3):
                    ent = None
                    if i == k:
                        ent = one
                    if abs(K[i, k]) >= _PRUNE:
                        term = s * float(K[i, k])
                        ent = term if ent is None else ent + term
                    if abs(KK[i, k]) >= _PRUNE:
                        term = (one - c) * float(KK[i, k])
                        ent = term if ent is None else ent + term
                    Rm.append(ent if ent is not None else zero)
            R_b = m3_mul(R_j, Rm)
            p_bdy = p_j
        elif sm.jtype[j] == JOINT_PRISMATIC:
            R_b = R_j
            p_bdy = t_add(p_j, m3_vec(R_j, (qj * a[0], qj * a[1], qj * a[2])))
        else:
            raise ValueError(f"bad joint type {sm.jtype[j]}")
        R.append(R_b)
        p.append(p_bdy)
    return KinLanes(R=R, p=p, E=E, cz=cz, sz=sz, cy=cy, sy=sy, cx=cx, sx=sx)


def body_coms_lanes(sm: StaticModel, kin: KinLanes):
    """Per-body world com triples + total com triple."""
    coms = [t_add(kin.p[b], m3_vec_const(kin.R[b], sm.com[b])) for b in range(sm.nb)]
    acc = t_scale(float(sm.mass[0]), coms[0])
    for b in range(1, sm.nb):
        acc = t_add(acc, t_scale(float(sm.mass[b]), coms[b]))
    com = t_scale(1.0 / sm.total_mass, acc)
    return coms, com


def contact_positions_lanes(sm: StaticModel, kin: KinLanes):
    return [
        t_add(kin.p[b], m3_vec_const(kin.R[b], sm.contact_p[i]))
        for i, b in enumerate(sm.contact_body)
    ]


def rotate_inertia_lanes(sm: StaticModel, kin: KinLanes):
    """Per-body world inertia R I R^T as mat3 lists."""
    out = []
    for b in range(sm.nb):
        RI = m3_mul_const(kin.R[b], sm.inertia[b])  # R @ I
        R = kin.R[b]
        # (R I) R^T: out[i][l] = sum_k RI[i,k] R[l,k]
        out.append(
            [
                sum(RI[3 * i + k] * R[3 * l + k] for k in range(3))
                for i in range(3)
                for l in range(3)
            ]
        )
    return out


# ------------------------------------------------------------------ tables
class Tables(NamedTuple):
    """Static 0/1 masks / weights broadcast to (nv, L).

    Constant arrays cannot be captured inside a pallas kernel, so every
    per-coordinate static vector rides in as one stacked input tensor
    (loaded into VMEM once — the block index never changes)."""

    msub: jnp.ndarray  # (nv, L) subtree mass per coordinate
    move: list  # per body: (nv, L) "coordinate l moves body b"
    rot: list  # per body: (nv, L) "coordinate l rotates body b"
    euler_dw: list  # i=0..2: (nv, L) mask of dw[3+i][l]
    trans_sel: list  # c=0..2: (nv, L) one-hot of translation coordinate c


def tables_np(sm: StaticModel) -> np.ndarray:
    """(NT, nv) numpy table stack; see Tables for row meaning."""
    nv, nb, nj = sm.nv, sm.nb, sm.nj
    move = np.zeros((nb, nv))
    move[:, 0:6] = 1.0
    move[:, 6:] = sm.anc.astype(float)
    rot = move.copy()
    rot[:, 0:3] = 0.0
    msub = np.zeros(nv)
    msub[:6] = sm.total_mass
    for j in range(nj):
        msub[6 + j] = float(np.sum(sm.mass * sm.anc[:, j]))
    euler_dw = np.zeros((3, nv))
    for i in range(3):
        euler_dw[i, 3 : 3 + i] = 1.0
    trans_sel = np.zeros((3, nv))
    for c in range(3):
        trans_sel[c, c] = 1.0
    return np.concatenate([msub[None], move, rot, euler_dw, trans_sel], axis=0)


def tables_from_array(sm: StaticModel, arr) -> Tables:
    """Split the (NT, nv, L) stacked tensor back into the Tables views."""
    nb = sm.nb
    i = 0
    msub = arr[i]
    i += 1
    move = [arr[i + b] for b in range(nb)]
    i += nb
    rot = [arr[i + b] for b in range(nb)]
    i += nb
    euler_dw = [arr[i + c] for c in range(3)]
    i += 3
    trans_sel = [arr[i + c] for c in range(3)]
    return Tables(msub=msub, move=move, rot=rot, euler_dw=euler_dw, trans_sel=trans_sel)


# ------------------------------------------------------------------ fields
class FieldLanes(NamedTuple):
    W: tuple  # triple of (nv, L): w_l stacked over coordinates
    V0: tuple  # triple of (nv, L)
    axes: list  # per joint: (1, L) triple (world axis)
    anchors: list  # per joint: (1, L) triple (joint anchor point)


def fields_lanes(sm: StaticModel, kin: KinLanes, p_b, tb: Tables) -> FieldLanes:
    """Velocity fields per coordinate, stacked over l (second_order.py:74)."""
    zero = jnp.zeros_like(kin.cz)
    one = jnp.ones_like(kin.cz)
    E = kin.E

    w_rows = [[zero, zero, zero] for _ in range(3)]
    v0_rows = [
        [one, zero, zero],
        [zero, one, zero],
        [zero, zero, one],
    ]
    for i in range(3):
        w = (E[0 + i], E[3 + i], E[6 + i])
        w_rows.append(list(w))
        v0_rows.append(list(t_scale(-1.0, t_cross(w, p_b))))
    axes, anchors = [], []
    for j in range(sm.nj):
        b = j + 1
        a = m3_vec_const(kin.R[b], sm.axis[j])
        anchor = kin.p[b]
        axes.append(a)
        anchors.append(anchor)
        if sm.jtype[j] == JOINT_REVOLUTE:
            w_rows.append(list(a))
            v0_rows.append(list(t_scale(-1.0, t_cross(a, anchor))))
        else:  # prismatic
            w_rows.append([zero, zero, zero])
            v0_rows.append(list(a))
    W = tuple(jnp.concatenate([r[c] for r in w_rows], axis=0) for c in range(3))
    V0 = tuple(jnp.concatenate([r[c] for r in v0_rows], axis=0) for c in range(3))
    return FieldLanes(W=W, V0=V0, axes=axes, anchors=anchors)


# ------------------------------------------------------------------ CMM
class CmmLanes(NamedTuple):
    A: list  # 6 rows, each triple-free: (nv, L) per row (A[r][l])
    csub: tuple  # triple (nv, L): sum m move c_b
    qsub: jnp.ndarray  # (nv, L): sum m move |c_b|^2
    CC: list  # 6-list (xx, xy, xz, yy, yz, zz) of (nv, L)
    Isub_rot: list  # 9-list of (nv, L) (rot-masked subtree world inertia)
    coms: list  # per body com triple
    com: tuple  # total com triple
    Iw: list  # per-body world inertia mat3


def _subtree_stack(sm: StaticModel, per_body, base_total, base_zero_rows, like):
    """Stack per-coordinate subtree sums: rows l<6 = total (or 0 for the
    first `base_zero_rows`), rows 6+j = subtree below body j+1.

    per_body: list of (1, L) leaf values; returns (nv, L)."""
    # subtree sums bottom-up over the static tree
    sub = [None] * sm.nb
    order = list(range(sm.nb))
    for b in reversed(order):  # children have larger indices in URDF order
        acc = per_body[b]
        for cb in sm.children[b]:
            acc = acc + sub[cb]
        sub[b] = acc
    total = sub[0]
    zero = jnp.zeros_like(like)
    rows = [zero] * base_zero_rows + [total] * (6 - base_zero_rows)
    for j in range(sm.nj):
        rows.append(sub[j + 1])
    return jnp.concatenate(rows, axis=0)


def cmm_lanes(sm: StaticModel, kin: KinLanes, fl: FieldLanes, tb: Tables) -> CmmLanes:
    """Centroidal momentum matrix rows stacked over coordinates, via subtree
    aggregates (the lane-layout analog of centroidal_momentum_matrix)."""
    coms, com = body_coms_lanes(sm, kin)
    Iw = rotate_inertia_lanes(sm, kin)
    like = kin.cz
    W, V0 = fl.W, fl.V0

    m = [float(sm.mass[b]) for b in range(sm.nb)]
    csub = tuple(
        _subtree_stack(sm, [m[b] * coms[b][c] for b in range(sm.nb)], None, 0, like)
        for c in range(3)
    )
    qsub = _subtree_stack(
        sm, [m[b] * t_dot(coms[b], coms[b]) for b in range(sm.nb)], None, 0, like
    )
    cc_idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    CC = [
        _subtree_stack(sm, [m[b] * coms[b][i] * coms[b][j] for b in range(sm.nb)], None, 0, like)
        for (i, j) in cc_idx
    ]
    Isub_rot = [
        _subtree_stack(sm, [Iw[b][e] for b in range(sm.nb)], None, 3, like)
        for e in range(9)
    ]

    # A_lin[l] = msub_l v0_l + w_l x csub_l
    Alin = t_add(tuple(tb.msub * V0[c] for c in range(3)), t_cross(W, csub))
    # A_ang[l] = Isub_rot[l] w_l + ssub_l x v0_l + w_l a_l - CC_l w_l + csub_l (com . w_l)
    Irow = lambda r: (Isub_rot[3 * r + 0], Isub_rot[3 * r + 1], Isub_rot[3 * r + 2])
    I_w_stack = tuple(t_dot(Irow(r), W) for r in range(3))
    ssub = tuple(csub[c] - tb.msub * com[c] for c in range(3))
    alpha = qsub - t_dot(com, csub)
    cc_full = {
        (0, 0): CC[0], (0, 1): CC[1], (0, 2): CC[2],
        (1, 0): CC[1], (1, 1): CC[3], (1, 2): CC[4],
        (2, 0): CC[2], (2, 1): CC[4], (2, 2): CC[5],
    }
    CCw = tuple(sum(cc_full[(r, c)] * W[c] for c in range(3)) for r in range(3))
    com_dot_w = t_dot(com, W)
    Aang = tuple(
        I_w_stack[c]
        + t_cross(ssub, V0)[c]
        + W[c] * alpha
        - CCw[c]
        + csub[c] * com_dot_w
        for c in range(3)
    )
    A = [Alin[0], Alin[1], Alin[2], Aang[0], Aang[1], Aang[2]]
    return CmmLanes(A=A, csub=csub, qsub=qsub, CC=CC, Isub_rot=Isub_rot, coms=coms, com=com, Iw=Iw)


# ------------------------------------------------------------------ inverse
def inv3_scalars(M):
    """Closed-form 3x3 inverse on a 9-list of (1, L) scalars."""
    a, b, c, d, e, f, g, h, i = M
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv = 1.0 / det
    return [c00 * inv, c01 * inv, c02 * inv, c10 * inv, c11 * inv, c12 * inv, c20 * inv, c21 * inv, c22 * inv]


def inv6_scalars(M):
    """6x6 block-Schur inverse on a 36-list (row-major) of (1, L) scalars
    (ops/linalg.py inv6_block, scalarized)."""
    idx = lambda r, c: 6 * r + c
    A11 = [M[idx(r, c)] for r in range(3) for c in range(3)]
    A12 = [M[idx(r, c + 3)] for r in range(3) for c in range(3)]
    A21 = [M[idx(r + 3, c)] for r in range(3) for c in range(3)]
    A22 = [M[idx(r + 3, c + 3)] for r in range(3) for c in range(3)]
    A11i = inv3_scalars(A11)
    A11i_A12 = m3_mul(A11i, A12)
    # S = A22 - A21 @ A11i_A12
    S = [
        A22[3 * r + c] - sum(A21[3 * r + j] * A11i_A12[3 * j + c] for j in range(3))
        for r in range(3)
        for c in range(3)
    ]
    Si = inv3_scalars(S)
    A21_A11i = m3_mul(A21, A11i)
    TR = [-x for x in m3_mul(A11i_A12, Si)]
    BL = [-x for x in m3_mul(Si, A21_A11i)]
    TL = [
        A11i[3 * r + c] - sum(TR[3 * r + j] * A21_A11i[3 * j + c] for j in range(3))
        for r in range(3)
        for c in range(3)
    ]
    out = [None] * 36
    for r in range(3):
        for c in range(3):
            out[idx(r, c)] = TL[3 * r + c]
            out[idx(r, c + 3)] = TR[3 * r + c]
            out[idx(r + 3, c)] = BL[3 * r + c]
            out[idx(r + 3, c + 3)] = Si[3 * r + c]
    return out


def generalized_velocity_lanes(sm: StaticModel, cm: CmmLanes, h6, v_j):
    """v = [Ab^{-1}(h - A_j v_j); v_j]: h6 = 6-list of (1,L); v_j (nj, L).

    Returns (v_stack (nv, L), Ab_inv 36-list, v_b 6-list)."""
    nv = sm.nv
    like = v_j[0:1] * 0.0
    vj_full = jnp.concatenate([jnp.zeros((6,) + v_j.shape[1:], v_j.dtype), v_j], axis=0)
    Ab = [cm.A[r][l : l + 1, :] for r in range(6) for l in range(6)]
    Ajv = [jnp.sum(cm.A[r] * vj_full, axis=0, keepdims=True) for r in range(6)]
    Ab_inv = inv6_scalars(Ab)
    rhs = [h6[r] - Ajv[r] for r in range(6)]
    v_b = [sum(Ab_inv[6 * r + s] * rhs[s] for s in range(6)) for r in range(6)]
    v_stack = jnp.concatenate(v_b + [v_j], axis=0)
    return v_stack, Ab_inv, v_b


def contact_jacobians_lanes(sm: StaticModel, fl: FieldLanes, p_ee, tb: Tables):
    """Per contact: stacked J_ee triple (nv, L) per component."""
    out = []
    for i, b in enumerate(sm.contact_body):
        mv = tb.move[b]
        col = t_add(fl.V0, t_cross(fl.W, p_ee[i]))
        out.append(tuple(mv * col[c] for c in range(3)))
    return out
