"""Hard friction-cone path (VERDICT r1 item #9): interior-point barrier
continuation (`cone="hard"`) against a cone-activity oracle.

Scenario: low-friction ground + an aggressive lateral displacement target
drives tangential forces onto the cone.  The soft relaxed-barrier default
(delta = 5 N switch point) tolerates real violations under this stress; the
hard path must return forces satisfying the cone to ~cone_delta_final while
the cone is demonstrably ACTIVE (some margins ride the boundary)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def h1():
    from bipedal_control_tpu.interface import make_interface_for

    return make_interface_for("h1")


def _lean_solve(h1, cone: str, mu_friction=0.15, iters=6):
    from bipedal_control_tpu.ocp.problem import friction_cone_values
    from bipedal_control_tpu.reference.target import goal_to_target_trajectories
    from bipedal_control_tpu.runtime.mpc_runner import MpcRunner

    settings = dataclasses.replace(
        h1.settings,
        horizon=0.3,
        friction_coefficient=mu_friction,
        cone=cone,
        sqp_iterations=iters,
    )
    iface = dataclasses.replace(h1, settings=settings)
    iface.task.mpc.time_horizon = 0.3
    mpc = MpcRunner(iface)
    x0 = np.asarray(iface.initial_state)
    goal = np.array([x0[6] + 0.6, x0[7], 0.0, 0.0, 0.0, 0.0])  # aggressive lunge
    mpc.rm.set_target(
        goal_to_target_trajectories(goal, 0.0, x0, iface.command_config, iface.info.input_dim)
    )
    sol = None
    for _ in range(4):
        sol = mpc.advance(0.0, jnp.asarray(x0))
    cones = np.asarray(
        jnp.stack([
            friction_cone_values(settings, u, iface.info) for u in sol.u_traj
        ])
    )  # (N, nc)
    flags = np.asarray(mpc.last_frozen.gait.contact_flags_at(jnp.asarray(0.1)))
    stance = np.broadcast_to(flags > 0.5, cones.shape)
    return sol, cones[stance]


def test_hard_cone_respects_boundary(h1):
    sol, margins = _lean_solve(h1, cone="hard")
    assert np.all(np.isfinite(margins))
    # hard path: no stance cone violated beyond the final relaxation width
    assert margins.min() > -2e-2, margins.min()
    # ...and the scenario genuinely stresses the cone (active at boundary)
    assert margins.min() < 1.0, margins.min()
    assert float(sol.defect_norm) < 0.05, float(sol.defect_norm)


def test_soft_cone_violates_under_stress(h1):
    """Oracle half: the default soft path tolerates real violations here —
    proving the hard path's tightness is doing actual work."""
    _, margins_soft = _lean_solve(h1, cone="soft")
    _, margins_hard = _lean_solve(h1, cone="hard")
    assert margins_soft.min() < -0.5, margins_soft.min()
    assert margins_hard.min() > -2e-2
