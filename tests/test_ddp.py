"""iLQR solver path: stance convergence, zero defects by construction."""
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


def test_ilqr_h1_stance():
    import dataclasses

    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.solver import build_refs, initial_trajectory
    from bipedal_control_tpu.solver.ddp import DdpSettings, ilqr_solve

    iface = make_interface_for("h1")
    settings = iface.settings
    rm = iface.make_reference_manager()
    x0 = jnp.asarray(iface.initial_state)
    frozen = rm.freeze(0.0)
    t_nodes = jnp.asarray(frozen.t_nodes)
    refs = build_refs(iface.info, frozen.gait, frozen.swing, frozen.target, t_nodes)
    _, us = initial_trajectory(iface.info, refs, x0, settings.num_intervals + 1)

    solve = jax.jit(
        lambda refs, t, x, us: ilqr_solve(
            iface.model, iface.info, settings, DdpSettings(iterations=12),
            iface.Q, iface.R, refs, t, x, us,
        )
    )
    sol = solve(refs, t_nodes, x0, us)
    # single shooting: dynamics defects vanish identically
    assert float(sol.defect_norm) < 1e-8
    # penalty-method contact handling converges slowly by design; require a
    # substantial reduction of the equality violation and a sane trajectory
    # the escalating penalty (x2 per iteration, reference semantics) must cut
    # the violation well below the open-loop rollout's ~2900
    assert float(sol.eq_norm) < 500.0, float(sol.eq_norm)
    base = np.asarray(sol.x_traj[:, 6:12])
    np.testing.assert_allclose(base[:, 2], 0.93, atol=0.1)
    assert np.all(np.isfinite(np.asarray(sol.u_traj)))
