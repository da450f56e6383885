"""iLQR solver path: warm-started refinement + cold-start convergence.

Cold starts work because iteration 0 linearizes around the Initializer's
constant-state trajectory (not a diverging open-loop rollout) and the first
nonlinear rollout then runs under that backward pass's feedback; constraints
enter by augmented Lagrangian (multiplier updates on accepted iterates).
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import REFERENCE_ASSETS

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_ASSETS, "bipedal_robot_example")),
    reason="reference assets unavailable",
)


def test_ilqr_h1_stance_warm():
    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.solver import build_refs, initial_trajectory, sqp_solve
    from bipedal_control_tpu.solver.ddp import DdpSettings, ilqr_solve

    iface = make_interface_for("h1")
    settings = dataclasses.replace(iface.settings, sqp_iterations=1)
    rm = iface.make_reference_manager()
    x0 = jnp.asarray(iface.initial_state)
    frozen = rm.freeze(0.0)
    t_nodes = jnp.asarray(frozen.t_nodes)
    refs = build_refs(iface.info, frozen.gait, frozen.swing, frozen.target, t_nodes)
    xs, us = initial_trajectory(iface.info, refs, x0, settings.num_intervals + 1)
    sqp = jax.jit(
        lambda refs, t, x, xs, us: sqp_solve(
            iface.model, iface.info, settings, iface.Q, iface.R, refs, t, x, xs, us
        )
    )
    for _ in range(5):
        s = sqp(refs, t_nodes, x0, xs, us)
        xs, us = s.x_traj, s.u_traj

    solve = jax.jit(
        lambda refs, t, x, us: ilqr_solve(
            iface.model, iface.info, settings,
            DdpSettings(iterations=3, constraint_penalty=100.0, penalty_increase_rate=1.0),
            iface.Q, iface.R, refs, t, x, us,
        )
    )
    sol = solve(refs, t_nodes, x0, us)
    # single shooting: dynamics defects vanish identically
    assert float(sol.defect_norm) < 1e-8
    # holds/refines the near-feasible warm start (l1 over 67x16 rows)
    assert float(sol.eq_norm) < 5.0, float(sol.eq_norm)
    base = np.asarray(sol.x_traj[:, 6:12])
    np.testing.assert_allclose(base[:, 2], 0.93, atol=0.05)
    assert np.all(np.isfinite(np.asarray(sol.u_traj)))


def test_ilqr_h1_stance_cold_start():
    """From the Initializer alone (no SQP refinement) the AL-iLQR converges
    to a near-feasible stance trajectory — the former penalty-only path
    diverged at the first open-loop rollout (eq_norm ~3000)."""
    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.solver import build_refs, initial_trajectory
    from bipedal_control_tpu.solver.ddp import DdpSettings, ilqr_solve

    iface = make_interface_for("h1")
    settings = dataclasses.replace(iface.settings, sqp_iterations=1)
    rm = iface.make_reference_manager()
    x0 = jnp.asarray(iface.initial_state)
    frozen = rm.freeze(0.0)
    t_nodes = jnp.asarray(frozen.t_nodes)
    refs = build_refs(iface.info, frozen.gait, frozen.swing, frozen.target, t_nodes)
    _, us = initial_trajectory(iface.info, refs, x0, settings.num_intervals + 1)
    sol = ilqr_solve(
        iface.model, iface.info, settings,
        DdpSettings(iterations=10, constraint_penalty=100.0, penalty_increase_rate=2.0),
        iface.Q, iface.R, refs, t_nodes, x0, us,
    )
    assert float(sol.defect_norm) < 1e-8
    assert np.all(np.isfinite(np.asarray(sol.u_traj)))
    # l1 over 67 nodes x 16 rows; the broken cold start sat at ~3e3
    assert float(sol.eq_norm) < 50.0, float(sol.eq_norm)
    base = np.asarray(sol.x_traj[:, 6:12])
    assert base[:, 2].min() > 0.6 and base[:, 2].max() < 1.05
