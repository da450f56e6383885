"""Pallas TPU kernel: whole-node OCP linearization (A, B, c, C, D, e).

The structured linearization (ocp/linearize.py) is ~78% of the RTI solve at
B=256: per (scenario x node) instance it evaluates FK, the velocity-field
algebra, the directional CMM derivative dA(q)v, and assembles the RK2
discrete Jacobians — hundreds of tensor ops with 3- and 16-wide minor
dimensions that leave the VPU lanes ~95% idle under the batch vmap (the
same lane-starvation the merit kernel already fixed for node_eval).

This kernel evaluates the ENTIRE FK-dependent linearization per instance on
the 128-wide lane axis, reusing the trace-time-unrolled circuits of
ops/pallas_linearize.py (FK, fields, CMM subtree aggregates, 6x6 momentum
inverse, contact Jacobians) and adding the lane form of
model/second_order.py::cmm_v_derivative (body-wise tree-accumulated P/W
aggregates).  Discrete-time A/B assembly exploits the flow Jacobian's block
sparsity through a None-pruned scalar-grid matmul: structurally-zero
products are dropped at trace time.

Outputs: dense LinearizedNode tensors in the standard (instance, rows,
cols) layout the Riccati backends consume.  The FK-free cost quadratics
(Qxx/Quu/qx/qu/cost — dt-scaled tracking + cone barrier) stay outside as
batched XLA matmuls, exactly like the merit split.

Semantics: linearize_node_structured with the default same-point RK2
sensitivity (exact values, O(dt^2) Jacobians — Gauss-Newton fixed points
unchanged); reference role: the CppAD-codegenned dynamics derivatives,
BipedalRobotDynamicsAD.cpp:53-56.  CI oracle: both the bare lane circuit and
the pallas_call wrapper (interpret mode) are compared against
linearize_node_structured in f64 to 1e-9 on a small synthetic biped in
tests/test_pallas_linearize_kernel.py (compiles in seconds on CPU; the
oracle demonstrably fails on a 1e-6 math perturbation);
tools/lin_kernel_oracle.py is the full-size H1 manual check (~15 min XLA CPU
compile).  Enabled via settings.linearize = "pallas" (TPU production path;
CPU keeps the structured XLA path).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_linearize as PL

LANE = 128
_GRAVITY_Z = -9.81


# ----------------------------------------------------- dA(q)v in lane layout
def cmm_v_derivative_lanes(sm: PL.StaticModel, kin, fl, cm, tb, p_b, v_stack, v_b6):
    """Lane form of model/second_order.py::cmm_v_derivative.

    v_stack: (nv, L); v_b6: 6-list of (1, L) base rates.
    Returns (dA_v rows: 6-list of (nv, L), per-body aggregates needed by the
    constraint Jacobians: P[b], W[b] (triples of (nv, L)), om[b] (1,L
    triples)).
    """
    nv = sm.nv
    W, V0 = fl.W, fl.V0
    zero = jnp.zeros_like(kin.cz)
    zt = (jnp.zeros((nv,) + kin.cz.shape[1:], kin.cz.dtype),) * 3

    # per-euler-coordinate dw rows (masked cross of the field stack)
    w_euler = [tuple(E_col[c] for c in range(3)) for E_col in
               [(kin.E[0], kin.E[3], kin.E[6]), (kin.E[1], kin.E[4], kin.E[7]),
                (kin.E[2], kin.E[5], kin.E[8])]]
    dp_b = (tb.trans_sel[0], tb.trans_sel[1], tb.trans_sel[2])  # dp_base/dq_l

    dw_euler, dv0_euler = [], []
    for i in range(3):
        wk = w_euler[i]
        full = PL.t_cross(W, wk)  # (nv, L) triple: w_l x w_k
        dw_i = tuple(tb.euler_dw[i] * full[c] for c in range(3))
        term = PL.t_add(PL.t_cross(dw_i, p_b), PL.t_cross(wk, dp_b))
        dv0_euler.append(tuple(-term[c] for c in range(3)))
        dw_euler.append(dw_i)

    # base seeds: sums over k = 0..5 weighted by v_k
    vb = v_b6
    P = [None] * sm.nb
    Wb = [None] * sm.nb
    om = [None] * sm.nb
    v0a = [None] * sm.nb
    P0, W0 = zt, zt
    om0 = (zero, zero, zero)
    v0_0 = (vb[0], vb[1], vb[2])
    for i in range(3):
        vk = vb[3 + i]
        P0 = PL.t_add(P0, tuple(vk * dv0_euler[i][c] for c in range(3)))
        W0 = PL.t_add(W0, tuple(vk * dw_euler[i][c] for c in range(3)))
        om0 = PL.t_add(om0, tuple(vk * w_euler[i][c] for c in range(3)))
        # v0 row of euler coordinate i, sliced from the stacked field
        v0_0 = PL.t_add(v0_0, tuple(vk * V0[c][3 + i : 4 + i] for c in range(3)))
    P[0], Wb[0], om[0], v0a[0] = P0, W0, om0, v0_0

    for j in range(sm.nj):
        b = j + 1
        par = sm.parent[j]
        vk = v_stack[6 + j : 7 + j]
        a_j = fl.axes[j]
        anchor = fl.anchors[j]
        if sm.jtype[j] == PL.JOINT_REVOLUTE:
            w_row = a_j
        else:
            w_row = (zero, zero, zero)
        # da_j = rot(body b) masked (w_l x a_j); own column auto-zero
        da = tuple(tb.rot[b] * PL.t_cross(W, a_j)[c] for c in range(3))
        danchor = tuple(tb.move[b] * PL.t_add(V0, PL.t_cross(W, anchor))[c] for c in range(3))
        if sm.jtype[j] == PL.JOINT_REVOLUTE:
            term = PL.t_add(PL.t_cross(da, anchor), PL.t_cross(a_j, danchor))
            dv0_row = tuple(-term[c] for c in range(3))
            v0_row = PL.t_scale(-1.0, PL.t_cross(a_j, anchor))
            dw_row = da  # for a revolute joint the axis IS the field w
        else:
            dv0_row = da
            v0_row = a_j
            dw_row = zt
        P[b] = PL.t_add(P[par], tuple(vk * dv0_row[c] for c in range(3)))
        Wb[b] = PL.t_add(Wb[par], tuple(vk * dw_row[c] for c in range(3)))
        om[b] = PL.t_add(om[par], tuple(vk * w_row[c] for c in range(3)))
        v0a[b] = PL.t_add(v0a[par], tuple(vk * v0_row[c] for c in range(3)))

    # body-wise assembly
    m_b = [float(sm.mass[b]) for b in range(sm.nb)]
    total = sm.total_mass
    coms, com = cm.coms, cm.com
    dcom = tuple(cm.A[c] * (1.0 / total) for c in range(3))  # (nv, L) triple

    dp = zt
    dL = zt
    for b in range(sm.nb):
        cdot = PL.t_add(v0a[b], PL.t_cross(om[b], coms[b]))
        Jv = tuple(tb.move[b] * PL.t_add(V0, PL.t_cross(W, coms[b]))[c] for c in range(3))
        dcdot = PL.t_add(
            PL.t_add(P[b], PL.t_cross(Wb[b], coms[b])), PL.t_cross(om[b], Jv)
        )
        dp = PL.t_add(dp, PL.t_scale(m_b[b], dcdot))
        Iw = cm.Iw[b]
        Iom = PL.m3_vec(Iw, om[b])
        wxom = PL.t_cross(W, om[b])
        dI_om = tuple(
            tb.rot[b] * (PL.t_cross(W, Iom)[c] - PL.m3_vec(Iw, wxom)[c])
            for c in range(3)
        )
        I_dom = PL.m3_vec(Iw, Wb[b])
        rel = PL.t_sub(coms[b], com)
        Jv_m_dcom = PL.t_sub(Jv, dcom)
        dL = PL.t_add(
            dL,
            PL.t_add(
                PL.t_add(dI_om, I_dom),
                PL.t_scale(
                    m_b[b],
                    PL.t_add(PL.t_cross(Jv_m_dcom, cdot), PL.t_cross(rel, dcdot)),
                ),
            ),
        )
    dA_v = [dp[0], dp[1], dp[2], dL[0], dL[1], dL[2]]
    return dA_v, P, Wb, om, dcom


# ------------------------------------------------------------------ circuit
def linearize_node_lanes(sm, tb, m_total, gain, integrator, nx, nu, x, u, x_next,
                         flags, vref, pref, dt):
    """Full FK-dependent linearization for one lane block.

    Returns flat list of (1, L) output rows: A | B | c | C | D | e."""
    nv = sm.nv
    nj = sm.nj
    p_b = tuple(x[6 + i : 7 + i] for i in range(3))
    theta = tuple(x[9 + i : 10 + i] for i in range(3))
    q_j = x[12 : 12 + nj]
    kin = PL.fk_lanes(sm, p_b, theta, q_j)
    fl = PL.fields_lanes(sm, kin, p_b, tb)
    cm = PL.cmm_lanes(sm, kin, fl, tb)
    p_ee = PL.contact_positions_lanes(sm, kin)
    h6 = [m_total * x[r : r + 1] for r in range(6)]
    v_j = u[12 : 12 + nj]
    v_stack, Ab_inv, v_b = PL.generalized_velocity_lanes(sm, cm, h6, v_j)

    forces = [tuple(u[3 * i + c : 3 * i + c + 1] for c in range(3)) for i in range(4)]
    inv_m = 1.0 / m_total
    f_sum = forces[0]
    for i in range(1, 4):
        f_sum = PL.t_add(f_sum, forces[i])
    hdot_lin = (f_sum[0] * inv_m, f_sum[1] * inv_m, f_sum[2] * inv_m + _GRAVITY_Z)
    ang = (jnp.zeros_like(x[0:1]),) * 3
    rels = [PL.t_sub(p_ee[i], cm.com) for i in range(4)]
    for i in range(4):
        ang = PL.t_add(ang, PL.t_cross(rels[i], forces[i]))
    hdot_ang = PL.t_scale(inv_m, ang)
    f0 = list(hdot_lin) + list(hdot_ang) + v_b + [v_j[j : j + 1] for j in range(nj)]

    # directional CMM derivative + per-body aggregates
    dA_v, P, Wb, om, dcom = cmm_v_derivative_lanes(
        sm, kin, fl, cm, tb, p_b, v_stack, v_b
    )
    # Nq[r] = dv_b/dq rows: -Ab_inv dA_v  (6 rows of (nv, L))
    Nq = [
        -sum(Ab_inv[6 * r + s] * dA_v[s] for s in range(6)) for r in range(6)
    ]
    # GJ[r][j] = (-Ab_inv A_j)[r, j]  (dv_b/dv_j, scalars)
    GJ = [
        [
            -sum(Ab_inv[6 * r + s] * cm.A[s][6 + j : 7 + j] for s in range(6))
            for j in range(nj)
        ]
        for r in range(6)
    ]
    J_ee = PL.contact_jacobians_lanes(sm, fl, p_ee, tb)  # per contact triple (nv, L)

    like = x[0:1]
    zero = jnp.zeros_like(like)
    one = jnp.ones_like(like)
    # n == 0 -> None (filtered out before the concat): Mosaic rejects
    # zero-size vectors even when dead, so they must never be created.
    zrow = lambda n: jnp.zeros((n,) + like.shape[1:], like.dtype) if n > 0 else None

    def diag_add(M, k, val):
        """M with val added to row k — slice-concat form (Mosaic has no
        scatter-add, and .at[k].add lowers to one even for a static k)."""
        parts = ([M[:k]] if k > 0 else []) + [M[k : k + 1] + val]
        if k + 1 < M.shape[0]:
            parts.append(M[k + 1 :])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    # ---- Jx blocks (flow Jacobian, block-sparse):
    #   rows 3:6, q cols:  Pq  = sum_i (J_ee[i] - dcom) x F_i / m   (3 x (nv,L))
    #   rows 6:12, h cols: Mh  = m * Ab_inv                          (36 scalars)
    #   rows 6:12, q cols: Nq  = -Ab_inv dA_v                        (6 x (nv,L))
    CRq = (jnp.zeros_like(dcom[0]),) * 3
    for i in range(4):
        drel = PL.t_sub(J_ee[i], dcom)
        CRq = PL.t_add(CRq, PL.t_cross(drel, forces[i]))
    Pq = [CRq[c] * inv_m for c in range(3)]  # 3 rows of (nv, L)
    Mh = [m_total * Ab_inv[i] for i in range(36)]
    # base-column scalar views of the q-row stacks
    Pq_b = [[Pq[r][s : s + 1] for s in range(6)] for r in range(3)]
    Nq_b = [[Nq[r][s : s + 1] for s in range(6)] for r in range(6)]

    # ---- discrete A, B (same-point RK2 / euler).  A = I + dt Jx + h Jx^2,
    # B = dt Ju + h Jx Ju with h = dt^2/2, using the block sparsity:
    # (Jx^2)[3:6] = Pq_b @ [Mh | Nq];  (Jx^2)[6:12] = Mh[:,3:6] @ [0|Pq]
    #               + Nq_b @ [Mh | Nq]   (joint-q columns of Jx are zero rows)
    if integrator == "euler":
        h = None
    elif integrator == "rk2":
        h = 0.5 * dt * dt
    else:
        raise NotImplementedError(f"linearize kernel integrator {integrator}")

    def matmul_sl(S, V, n_out):
        """(n_out x 6 scalars) @ (6 x (nv,L) stack) -> n_out x (nv,L)."""
        return [sum(S[r][s] * V[s] for s in range(6)) for r in range(n_out)]

    def matmul_ss(S, T, n_out, n_in, n_cols):
        """scalar (n_out x n_in) @ scalar (n_in x n_cols) grids."""
        return [
            [sum(S[r][k] * T[k][c] for k in range(n_in)) for c in range(n_cols)]
            for r in range(n_out)
        ]

    Mh_g = [[Mh[6 * r + c] for c in range(6)] for r in range(6)]
    if h is not None:
        PN = matmul_sl(Pq_b, Nq, 3)  # (Jx^2)[3:6, q]
        PM = matmul_ss(Pq_b, Mh_g, 3, 6, 6)  # (Jx^2)[3:6, h]
        NN = matmul_sl(Nq_b, Nq, 6)
        NM = matmul_ss(Nq_b, Mh_g, 6, 6, 6)
        MP = [sum(Mh_g[r][3 + j] * Pq[j] for j in range(3)) for r in range(6)]

    # assemble A rows as (1,L)/(nv,L) blocks in row-major output order
    A_rows = []
    for r in range(3):  # identity rows 0:3
        A_rows += [zrow(r), one, zrow(nx - r - 1)]
    for r in range(3):  # hdot_ang rows 3:6
        if h is None:
            A_rows += [zrow(3 + r), one, zrow(2 - r), dt * Pq[r]]
        else:
            hc = jnp.concatenate([h * PM[r][c] for c in range(6)], axis=0)
            hc = diag_add(hc, 3 + r, 1.0)  # diagonal
            A_rows += [hc, dt * Pq[r] + h * PN[r]]
    for r in range(6):  # v_b rows 6:12
        if h is None:
            hcols = jnp.concatenate([dt * Mh[6 * r + c] for c in range(6)], axis=0)
            qcols = dt * Nq[r]
        else:
            hcols = jnp.concatenate(
                [dt * Mh_g[r][c] + h * NM[r][c] for c in range(6)], axis=0
            )
            qcols = dt * Nq[r] + h * (MP[r] + NN[r])
        qcols = diag_add(qcols, r, 1.0)  # diagonal: col 6+r is q index r
        A_rows += [hcols, qcols]
    for r in range(nj):  # v_j rows 12:: identity (their Jx rows are zero)
        A_rows += [zrow(12 + r), one, zrow(nx - 13 - r)]

    # ---- Ju blocks: rows 0:3 F cols = I/m pattern; rows 3:6 F cols =
    # skew(rel_i)/m; rows 6:12 vj cols = GJ; rows 12: vj cols = I
    # B = dt Ju + h Jx Ju with (Jx Ju)[3:6, vj] = Pq_b @ GJ + Pq_j,
    # (Jx Ju)[6:12, F] = Mh[:,0:3] @ (I/m pattern) + Mh[:,3:6] @ skews/m,
    # (Jx Ju)[6:12, vj] = Nq_b @ GJ + Nq_j.
    sk = []  # per contact: 3x3 scalar grid of skew(rel)/m
    for i in range(4):
        rx, ry, rz = rels[i]
        sk.append([
            [zero, -rz * inv_m, ry * inv_m],
            [rz * inv_m, zero, -rx * inv_m],
            [-ry * inv_m, rx * inv_m, zero],
        ])
    GJ_g = [[GJ[r][j] for j in range(nj)] for r in range(6)]
    B_rows = []
    for r in range(3):  # hdot_lin rows: dt * I/m per contact, no Jx^2 term
        row = []
        for i in range(4):
            row += [zrow(r), dt * inv_m * one, zrow(2 - r)]
        row.append(zrow(nj))
        B_rows += row
    if h is not None:
        Pq_j = [[Pq[r][6 + j : 7 + j] for j in range(nj)] for r in range(3)]
        Nq_j = [[Nq[r][6 + j : 7 + j] for j in range(nj)] for r in range(6)]
        PG = matmul_ss(Pq_b, GJ_g, 3, 6, nj)
        NG = matmul_ss(Nq_b, GJ_g, 6, 6, nj)
    for r in range(3):  # hdot_ang rows: dt * skews + h * (Pq_b GJ + Pq_j) on vj
        row = []
        for i in range(4):
            row += [dt * sk[i][r][c] for c in range(3)]
        if h is None:
            row.append(zrow(nj))
        else:
            row += [h * (PG[r][j] + Pq_j[r][j]) for j in range(nj)]
        B_rows += row
    for r in range(6):  # v_b rows
        row = []
        if h is None:
            row.append(zrow(12))
            row += [dt * GJ_g[r][j] for j in range(nj)]
        else:
            for i in range(4):
                for c in range(3):
                    # h * (Mh[:,0:3] I/m + Mh[:,3:6] skews/m)[r, 3i+c]
                    ent = Mh_g[r][c] * inv_m + sum(
                        Mh_g[r][3 + t] * sk[i][t][c] for t in range(3)
                    )
                    row.append(h * ent)
            row += [dt * GJ_g[r][j] + h * (NG[r][j] + Nq_j[r][j]) for j in range(nj)]
        B_rows += row
    for r in range(nj):  # v_j rows: dt * I on vj cols
        B_rows += [zrow(12 + r), dt * one, zrow(nj - r - 1)]

    if integrator == "euler":
        F = [x[r : r + 1] + dt * f0[r] for r in range(nx)]
    else:
        # exact value: second flow pass at the midpoint
        x1 = jnp.concatenate(
            [x[r : r + 1] + (0.5 * dt) * f0[r] for r in range(nx)], axis=0
        )
        p_b1 = tuple(x1[6 + i : 7 + i] for i in range(3))
        theta1 = tuple(x1[9 + i : 10 + i] for i in range(3))
        kin1 = PL.fk_lanes(sm, p_b1, theta1, x1[12 : 12 + nj])
        fl1 = PL.fields_lanes(sm, kin1, p_b1, tb)
        cm1 = PL.cmm_lanes(sm, kin1, fl1, tb)
        p_ee1 = PL.contact_positions_lanes(sm, kin1)
        h61 = [m_total * x1[r : r + 1] for r in range(6)]
        _, _, v_b1 = PL.generalized_velocity_lanes(sm, cm1, h61, v_j)
        ang1 = (jnp.zeros_like(x[0:1]),) * 3
        for i in range(4):
            ang1 = PL.t_add(ang1, PL.t_cross(PL.t_sub(p_ee1[i], cm1.com), forces[i]))
        hdot_ang1 = PL.t_scale(inv_m, ang1)
        f1 = list(hdot_lin) + list(hdot_ang1) + v_b1 + [v_j[j : j + 1] for j in range(nj)]
        F = [x[r : r + 1] + dt * f1[r] for r in range(nx)]
    c_rows = [F[r] - x_next[r : r + 1] for r in range(nx)]

    # ---- constraints: e, C, D (ocp/linearize.py::_eq_jacobians), emitted
    # as row blocks: per row, 6 h-column scalars then one (nv, L) q block
    mAb = [m_total * Ab_inv[i] for i in range(36)]
    e_pc, e_nv = [], []
    C_pc, C_nv = [], []
    D_pc, D_nv = [], []
    for i, b in enumerate(sm.contact_body):
        fi = flags[i : i + 1]
        swing = 1.0 - fi
        Ji = J_ee[i]
        v_ee = tuple(jnp.sum(Ji[c] * v_stack, axis=0, keepdims=True) for c in range(3))
        # dJ_v = P[b] + Wb[b] x p_ee + om[b] x J_ee
        dJ_v = PL.t_add(
            PL.t_add(P[b], PL.t_cross(Wb[b], p_ee[i])), PL.t_cross(om[b], Ji)
        )
        # J6 scalars (3 x 6)
        J6 = [[Ji[c][s : s + 1] for s in range(6)] for c in range(3)]
        # dv_ee_dq = dJ_v + J6 @ Nq
        dv_ee_dq = tuple(
            dJ_v[c] + sum(J6[c][s] * Nq[s] for s in range(6)) for c in range(3)
        )
        # dv_ee_dh (3 x 6 scalars) = J6 @ (m Ab_inv)
        dv_ee_dh = [
            [sum(J6[c][t] * mAb[6 * t + s] for t in range(6)) for s in range(6)]
            for c in range(3)
        ]
        # dv_ee_dvj (3 x nj scalars) = J6 @ GJ + J_ee[:, 6:]
        dv_ee_dvj = [
            [
                sum(J6[c][s] * GJ[s][j] for s in range(6)) + Ji[c][6 + j : 7 + j]
                for j in range(nj)
            ]
            for c in range(3)
        ]
        pz = p_ee[i][2]
        for c in range(3):
            zv = v_ee[c] + gain * pz if (c == 2 and gain != 0.0) else v_ee[c]
            e_pc.append(fi * zv + swing * u[3 * i + c : 3 * i + c + 1])
            dzv = dv_ee_dq[c]
            if c == 2 and gain != 0.0:
                dzv = dzv + gain * Ji[2]
            C_pc += [fi * dv_ee_dh[c][s] for s in range(6)] + [fi * dzv]
            # D: swing force identity + stance vel-jacobian on the vj cols
            D_pc += [zrow(3 * i + c), swing, zrow(11 - 3 * i - c)]
            D_pc += [fi * dv_ee_dvj[c][j] for j in range(nj)]
        # normal-velocity row
        nvl = v_ee[2] - vref[i : i + 1]
        if gain != 0.0:
            nvl = nvl + gain * (pz - pref[i : i + 1])
        e_nv.append(swing * nvl)
        dz2 = dv_ee_dq[2] + gain * Ji[2] if gain != 0.0 else dv_ee_dq[2]
        C_nv += [swing * dv_ee_dh[2][s] for s in range(6)] + [swing * dz2]
        D_nv += [zrow(12)] + [swing * dv_ee_dvj[2][j] for j in range(nj)]

    out = A_rows + B_rows + c_rows + C_pc + C_nv + D_pc + D_nv + e_pc + e_nv
    return [r for r in out if r is not None]


# ------------------------------------------------------------------ kernel
def _lin_kernel_rows(sm, m_total, gain, integrator, nx, nu, data_ref, tables_ref):
    d = data_ref[0]
    tb = PL.tables_from_array(sm, tables_ref[...])
    x = d[0:nx]
    u = d[nx : nx + nu]
    xn = d[nx + nu : 2 * nx + nu]
    b = 2 * nx + nu
    flags = d[b : b + 4]
    vref = d[b + 4 : b + 8]
    pref = d[b + 8 : b + 12]
    dt = d[b + 12 : b + 13]
    return linearize_node_lanes(
        sm, tb, m_total, gain, integrator, nx, nu, x, u, xn, flags, vref, pref, dt
    )


def _lin_kernel(sm, m_total, gain, integrator, nx, nu, data_ref, tables_ref, out_ref):
    rows = _lin_kernel_rows(sm, m_total, gain, integrator, nx, nu, data_ref, tables_ref)
    out_ref[0] = jnp.concatenate(rows, axis=0)


def _lin_kernel_fields(sm, m_total, gain, integrator, nx, nu, data_ref, tables_ref,
                       a_ref, b_ref, c_ref, cc_ref, dd_ref, e_ref):
    """Per-field output variant (the fused lanes path): each LinearizedNode
    field writes straight to its own (1, rows, LANE) block, so no
    whole-OUT-buffer concat + downstream slice copies (~0.4 ms/step of pure
    HBM shuffle at B=256)."""
    rows = _lin_kernel_rows(sm, m_total, gain, integrator, nx, nu, data_ref, tables_ref)
    full = jnp.concatenate(rows, axis=0)  # (OUT, L) in VMEM
    counts = [nx * nx, nx * nu, nx, 16 * nx, 16 * nu, 16]
    refs = [a_ref, b_ref, c_ref, cc_ref, dd_ref, e_ref]
    o = 0
    for ref, cnt in zip(refs, counts):
        ref[0] = full[o : o + cnt]
        o += cnt


def _out_rows(nx, nu):
    return nx * nx + nx * nu + nx + 16 * nx + 16 * nu + 16


def linearize_flat_static(sm, tables, nx, nu, robot_mass, gain, integrator,
                          xs, us, xns, flags, vref, pref, dt):
    """(M, ...) inputs -> dict of dense node tensors (M leading axis)."""
    dtype = xs.dtype
    data = jnp.concatenate([xs, us, xns, flags, vref, pref, dt[:, None]], axis=1)
    M, R = data.shape
    T = max(1, math.ceil(M / LANE))
    pad = T * LANE - M
    if pad:
        data = jnp.concatenate([data, jnp.zeros((pad, R), dtype)], axis=0)
    data_t = data.T.reshape(R, T, LANE).transpose(1, 0, 2)
    nt, nv = tables.shape
    tables_l = jnp.broadcast_to(jnp.asarray(tables, dtype)[:, :, None], (nt, nv, LANE))

    OUT = _out_rows(nx, nu)
    plat = jax.local_devices()[0].platform.lower()
    interpret = plat not in ("tpu", "axon")
    kernel = lambda d, t, o: _lin_kernel(sm, robot_mass, gain, integrator, nx, nu, d, t, o)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, nv, LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, OUT, LANE), dtype),
        interpret=interpret,
    )(data_t, tables_l)
    flat = out.transpose(0, 2, 1).reshape(T * LANE, OUT)[:M]
    o = 0
    def take(n):
        nonlocal o
        block = flat[:, o : o + n]
        o += n
        return block
    A = take(nx * nx).reshape(M, nx, nx)
    B = take(nx * nu).reshape(M, nx, nu)
    c = take(nx)
    C = take(16 * nx).reshape(M, 16, nx)
    D = take(16 * nu).reshape(M, 16, nu)
    e = take(16)
    return {"A": A, "B": B, "c": c, "C": C, "D": D, "e": e}


def linearize_lanes_batched(sm, tables, nx, nu, robot_mass, gain, integrator,
                            xs, us, xns, flags, vref, pref, dt):
    """Explicitly batched variant emitting LANE layout: (B, N, .) inputs ->
    dict of (N, rows, cols, Bp) tensors with the scenario batch on the lane
    axis, zero-padded to a LANE multiple.

    This is the fused-path producer (solver/lanes_rti.py): the Riccati
    kernels consume exactly this layout, so the ~120 MB/step of
    lane->instance->lane transposes the standard path pays at the
    linearize/Riccati seam (measured 2.6 ms/step of reshape/pad/copy glue
    at B=256 — 39% of device time) never materializes.  Same kernel body
    (_lin_kernel); only the grid/in/out block maps differ."""
    dtype = xs.dtype
    Bb, N = xs.shape[:2]
    data = jnp.concatenate([xs, us, xns, flags, vref, pref, dt[..., None]], axis=-1)
    R = data.shape[-1]
    Bt = max(1, -(-Bb // LANE))
    Bp = Bt * LANE
    if Bp != Bb:
        data = jnp.concatenate(
            [data, jnp.zeros((Bp - Bb,) + data.shape[1:], dtype)], axis=0
        )
    # (Bp, N, R) -> (N*Bt, R, LANE): node-major lane tiles of pure batch
    data_t = data.reshape(Bt, LANE, N, R).transpose(2, 0, 3, 1).reshape(N * Bt, R, LANE)
    nt, nv = tables.shape
    tables_l = jnp.broadcast_to(jnp.asarray(tables, dtype)[:, :, None], (nt, nv, LANE))

    plat = jax.local_devices()[0].platform.lower()
    interpret = plat not in ("tpu", "axon")
    kernel = lambda d, t, *outs: _lin_kernel_fields(
        sm, robot_mass, gain, integrator, nx, nu, d, t, *outs
    )
    counts = [nx * nx, nx * nu, nx, 16 * nx, 16 * nu, 16]
    out_spec = lambda rows: pl.BlockSpec(
        (1, rows, LANE), lambda n, j: (n, 0, j), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(N, Bt),
        in_specs=[
            pl.BlockSpec((1, R, LANE), lambda n, j: (n * Bt + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, nv, LANE), lambda n, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec(cnt) for cnt in counts],
        out_shape=[jax.ShapeDtypeStruct((N, cnt, Bp), dtype) for cnt in counts],
        interpret=interpret,
    )(data_t, tables_l)
    A, B, c, C, D, e = outs
    return {
        "A": A.reshape(N, nx, nx, Bp), "B": B.reshape(N, nx, nu, Bp), "c": c,
        "C": C.reshape(N, 16, nx, Bp), "D": D.reshape(N, 16, nu, Bp), "e": e,
    }


def make_node_linearizer(model, info, settings, Q, R):
    """Batch-shape-polymorphic full-node linearizer producing LinearizedNode
    (the structured-XLA path's exact output).  custom_vmap fuses the
    scenario batch onto the lane axis (mirrors ops/pallas_merit.py)."""
    from ..ocp.linearize import _barrier_grad_u
    from ..ocp.problem import (
        LinearizedNode,
        _barrier_hessian_u,
        relaxed_barrier,
    )
    from .pallas_merit import _get_static

    if info.model_type != 0:
        raise NotImplementedError("linearize kernel supports FullCentroidalDynamics only")
    if settings.exact_rk2_sensitivity and settings.integrator == "rk2":
        raise NotImplementedError("linearize kernel implements same-point RK2 only")
    sm, tables = _get_static(model, info)
    nx, nu = info.state_dim, info.input_dim
    robot_mass = float(info.robot_mass)
    gain = float(settings.position_error_gain)
    integrator = settings.integrator

    def impl(xs, us, xns, flags, vref, pref, dt):
        lead = xs.shape[:-1]
        flat = lambda a: a.reshape((-1,) + a.shape[len(lead):])
        kd = linearize_flat_static(
            sm, tables, nx, nu, robot_mass, gain, integrator,
            flat(xs), flat(us), flat(xns), flat(flags), flat(vref), flat(pref),
            dt.reshape(-1),
        )
        rs = lambda a: a.reshape(lead + a.shape[1:])
        return tuple(rs(kd[k]) for k in ("A", "B", "c", "C", "D", "e"))

    @jax.custom_batching.custom_vmap
    def kern(xs, us, xns, flags, vref, pref, dt):
        return impl(xs, us, xns, flags, vref, pref, dt)

    @kern.def_vmap
    def _kern_vmap(axis_size, in_batched, *args):
        out_args = [
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        return impl(*out_args), tuple([True] * 6)

    def linearize(xs, us, xns, refs):
        """xs/us/xns stacked (..., N, dim); refs stacked NodeRefs."""
        A, B, c, C, D, e = kern(
            xs, us, xns, refs.contact_flags, refs.swing_vref, refs.swing_pref,
            refs.dt,
        )
        # FK-free cost quadratics (same math as linearize_node_structured)
        dt = refs.dt[..., None]
        dx = xs - refs.x_nom
        du = us - refs.u_nom
        Qxx = dt[..., None] * Q
        bar_h = jax.vmap(
            lambda uu, ref: _barrier_hessian_u(settings, info, uu, ref),
            in_axes=(0, 0),
        )
        bar_g = jax.vmap(
            lambda uu, ref: _barrier_grad_u(settings, info, uu, ref), in_axes=(0, 0)
        )
        # flatten leading dims for the vmapped barrier terms
        lead = us.shape[:-1]
        us_f = us.reshape((-1, us.shape[-1]))
        refs_f = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[len(lead):]), refs)
        Quu = dt[..., None] * R + bar_h(us_f, refs_f).reshape(lead + (us.shape[-1], us.shape[-1]))
        qu = (dt * jnp.einsum("ij,...j->...i", R, du)
              + bar_g(us_f, refs_f).reshape(lead + (us.shape[-1],)))
        qx = dt * jnp.einsum("ij,...j->...i", Q, dx)
        Qux = jnp.zeros(lead + (us.shape[-1], xs.shape[-1]), xs.dtype)
        # batched cone values (friction_cone_values is single-node shaped)
        from ..model.centroidal import get_contact_forces

        forces = get_contact_forces(us, info)  # (..., nc, 3)
        f_tan = jnp.sqrt(
            forces[..., 0] ** 2 + forces[..., 1] ** 2 + settings.cone_regularization
        )
        cones = (
            settings.friction_coefficient * (forces[..., 2] + settings.gripper_force)
            - f_tan
        )
        pen = relaxed_barrier(cones, settings.barrier_mu, settings.barrier_delta)
        cost = refs.dt * (
            0.5 * jnp.sum((dx @ Q) * dx, axis=-1)
            + 0.5 * jnp.sum((du @ R) * du, axis=-1)
            + jnp.sum(refs.contact_flags * pen, axis=-1)
        )
        return LinearizedNode(
            A=A, B=B, c=c, C=C, D=D, e=e,
            Qxx=Qxx, Quu=Quu, Qux=Qux, qx=qx, qu=qu, cost=cost,
        )

    return linearize
