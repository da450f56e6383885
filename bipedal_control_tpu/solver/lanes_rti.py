"""Explicitly-batched lane-layout RTI solve — the fused TPU throughput path.

The standard batched solver is ``vmap(sqp_solve)``: each Pallas kernel pulls
the scenario batch onto its lane axis via custom_vmap, but the custom_vmap
contract forces every kernel boundary back to batch-LEADING tensors, so the
linearize kernel transposes its lane-resident output to instance-major and
the Riccati kernels immediately transpose it back — ~120 MB of pure layout
shuffle per step at B=256, measured as 2.6 ms/step of reshape/pad/copy glue
(39% of device time, xprof framework_op_stats 2026-08-22).

This module is the explicit batched alternative used by
parallel/batch_solver.py when the settings qualify (pallas linearize +
pallas riccati, soft cone): the batch never leaves lane layout between the
linearize and Riccati kernels.  Only the small tensors (dx/du/K, merit
candidates, diagnostics) cross back to batch-leading.  Semantics are
sqp_solve's exactly — same kernels, same cost quadratics, same OCS2 filter
linesearch (tests/test_lanes_rti.py pins batched-vs-vmap parity).

Reference role: this is the HPIPM-replacement throughput surface
(SURVEY §7.3 item 1; task.info:66-83 sqp settings).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp.problem import relaxed_barrier
from .sqp import (
    SqpSolution,
    _candidate_costs,
    _filter_accept,
    eq_mask_from_flags,
)


def _supports(settings) -> bool:
    """The configurations this fast path implements with exact sqp_solve
    semantics (everything else falls back to vmap(sqp_solve))."""
    return (
        settings.linearize == "pallas"
        and settings.riccati == "pallas"
        and settings.cone == "soft"
        and settings.merit == "pallas"
    )


def make_lanes_rti_solver(model, info, settings, Q, R):
    """Build f(refs_b, t_nodes_b, x_init_b, xs_b, us_b) -> batched SqpSolution."""
    from ..ops.pallas_linearize_kernel import LANE, linearize_lanes_batched
    from ..ops.pallas_merit import _get_static, make_merit_sums
    from ..ocp.linearize import _barrier_grad_u
    from ..ocp.problem import _barrier_hessian_u
    from .riccati import _regs

    if info.model_type != 0:
        raise NotImplementedError("lanes RTI supports FullCentroidalDynamics only")
    sm, tables = _get_static(model, info)
    nx, nu = info.state_dim, info.input_dim
    robot_mass = float(info.robot_mass)
    gain = float(settings.position_error_gain)
    integrator = settings.integrator
    alphas = tuple(settings.linesearch_alphas)
    merit_fn = make_merit_sums(model, info, settings) if alphas else None
    Qj = jnp.asarray(Q)
    Rj = jnp.asarray(R)

    def _to_lanes_small(x, Bp):
        """(B, N, ...) -> (N, ..., Bp) for the SMALL tensors built XLA-side
        (cost quadratics, masks): XLA fuses the layout into the producers —
        unlike the kernels' custom-call outputs, nothing forces an
        intermediate batch-leading materialization."""
        x = jnp.moveaxis(x, 0, -1)
        if x.shape[-1] != Bp:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - x.shape[-1])])
        return x

    def solve(refs_b, t_nodes_b, x_init_b, xs_b, us_b):
        Bb = xs_b.shape[0]
        Bp = max(1, -(-Bb // LANE)) * LANE
        xs = xs_b.at[:, 0].set(x_init_b)
        us = us_b

        from ..model.centroidal import get_contact_forces

        step_size = jnp.ones((Bb,), xs.dtype)
        cost = defect = eq = jnp.zeros((Bb,), xs.dtype)
        gains = None
        masks_b = eq_mask_from_flags(refs_b.contact_flags)  # (B, N, ne)
        masks_t = _to_lanes_small(masks_b, Bp)
        dx0_t = jnp.zeros((nx, Bp), xs.dtype)
        dual_eps, huu_reg = _regs(xs.dtype)
        plat = jax.local_devices()[0].platform.lower()
        interpret = plat not in ("tpu", "axon")

        for _ in range(settings.sqp_iterations):
            # FK-dependent stage data straight into lane layout
            lanes = linearize_lanes_batched(
                sm, tables, nx, nu, robot_mass, gain, integrator,
                xs[:, :-1], us, xs[:, 1:], refs_b.contact_flags,
                refs_b.swing_vref, refs_b.swing_pref, refs_b.dt,
            )
            # FK-free cost quadratics, built batch-last (lane layout) so XLA
            # fuses the layout into the producing ops — same math as
            # make_node_linearizer
            dt_t = _to_lanes_small(refs_b.dt, Bp)  # (N, Bp)
            dx_b = xs[:, :-1] - refs_b.x_nom  # (B, N, nx)
            du_b = us - refs_b.u_nom
            lead = us.shape[:2]
            us_f = us.reshape((-1, nu))
            refs_f = jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), refs_b
            )
            bar_h = jax.vmap(lambda uu, ref: _barrier_hessian_u(settings, info, uu, ref))(
                us_f, refs_f
            ).reshape(lead + (nu, nu))
            bar_g = jax.vmap(lambda uu, ref: _barrier_grad_u(settings, info, uu, ref))(
                us_f, refs_f
            ).reshape(lead + (nu,))
            lanes["Qxx"] = dt_t[:, None, None, :] * Qj[None, :, :, None]
            lanes["Quu"] = (
                dt_t[:, None, None, :] * Rj[None, :, :, None]
                + _to_lanes_small(bar_h, Bp)
            )
            lanes["Qux"] = jnp.zeros((dt_t.shape[0], nu, nx, Bp), xs.dtype)
            qx_b = refs_b.dt[..., None] * jnp.einsum("ij,bnj->bni", Qj, dx_b)
            qu_b = refs_b.dt[..., None] * jnp.einsum("ij,bnj->bni", Rj, du_b) + bar_g
            lanes["qx"] = _to_lanes_small(qx_b, Bp)
            lanes["qu"] = _to_lanes_small(qu_b, Bp)

            # node costs (B, N) — diagnostics + filter baseline
            forces = get_contact_forces(us, info)
            f_tan = jnp.sqrt(
                forces[..., 0] ** 2 + forces[..., 1] ** 2 + settings.cone_regularization
            )
            cones = (
                settings.friction_coefficient * (forces[..., 2] + settings.gripper_force)
                - f_tan
            )
            pen = relaxed_barrier(cones, settings.barrier_mu, settings.barrier_delta)
            cost_b = refs_b.dt * (
                0.5 * jnp.sum((dx_b @ Qj) * dx_b, axis=-1)
                + 0.5 * jnp.sum((du_b @ Rj) * du_b, axis=-1)
                + jnp.sum(refs_b.contact_flags * pen, axis=-1)
            )

            from ..ops.pallas_riccati import riccati_solve_pallas_prelaned

            K, kvec, dx_all, dus = riccati_solve_pallas_prelaned(
                lanes, masks_t, dx0_t, Bb, dual_eps, huu_reg, interpret
            )
            gains = K

            # pre-step diagnostics from the lane-resident residuals
            c_lane = lanes["c"][..., :Bb]  # (N, nx, Bb)
            e_lane = lanes["e"][..., :Bb] * masks_t[..., :Bb]
            cost0 = jnp.sum(cost_b, axis=1)  # (B,)
            viol0 = jnp.sum(c_lane**2, axis=(0, 1)) + jnp.sum(e_lane**2, axis=(0, 1))
            d1_0 = jnp.sum(jnp.abs(c_lane), axis=(0, 1))
            e1_0 = jnp.sum(jnp.abs(e_lane), axis=(0, 1))

            if not alphas:
                # pure RTI: full step, pre-step diagnostics (sqp_solve's
                # empty-alphas mode)
                xs = xs + dx_all
                us = us + dus
                step_size = jnp.ones((Bb,), xs.dtype)
                cost, defect, eq = cost0, d1_0, e1_0
                continue

            a_arr = jnp.asarray(alphas)
            n_a = len(alphas)
            # candidates (B, A, N+1, nx)
            xs_c = xs[:, None] + a_arr[None, :, None, None] * dx_all[:, None]
            us_c = us[:, None] + a_arr[None, :, None, None] * dus[:, None]
            bc = lambda a: jnp.broadcast_to(
                a[:, None], (Bb, n_a) + a.shape[1:]
            )
            sums = merit_fn(
                xs_c[:, :, :-1], us_c, xs_c[:, :, 1:],
                bc(refs_b.contact_flags), bc(refs_b.swing_vref),
                bc(refs_b.swing_pref), bc(refs_b.dt),
            )  # (B, A, N, 4)
            d1_a = jnp.sum(sums[..., 0], axis=2)
            viols_a = jnp.sum(sums[..., 1] + sums[..., 3], axis=2)
            e1_a = jnp.sum(sums[..., 2], axis=2)
            costs_a = jax.vmap(
                lambda xc, uc, ref: _candidate_costs(
                    info, settings, Q, R, xc[:, :-1], uc, ref
                )
            )(xs_c, us_c, refs_b)  # (B, A)

            # _filter_accept maps (scalar, scalar, (A,), (A,)) -> (A,);
            # vmapped over the scenario axis -> (B, A)
            accepted = jax.vmap(_filter_accept)(cost0, viol0, costs_a, viols_a)
            idx = jnp.argmax(accepted, axis=1)
            any_ok = jnp.any(accepted, axis=1)
            step_size = jnp.where(any_ok, a_arr[idx], 0.0)
            xs = xs + step_size[:, None, None] * dx_all
            us = us + step_size[:, None, None] * dus
            take = lambda m: jnp.take_along_axis(m, idx[:, None], axis=1)[:, 0]
            cost = jnp.where(any_ok, take(costs_a), cost0)
            defect = jnp.where(any_ok, take(d1_a), d1_0)
            eq = jnp.where(any_ok, take(e1_a), e1_0)

        return SqpSolution(
            t_nodes=t_nodes_b,
            x_traj=xs,
            u_traj=us,
            K=gains,
            cost=cost,
            defect_norm=defect,
            eq_norm=eq,
            step_size=step_size,
        )

    return solve
