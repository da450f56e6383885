"""Whole-horizon merit kernel vs the XLA node_eval path.

The lane circuit (flow value + RK2 + masked equality residual) and the full
Pallas kernel (interpret mode on CPU) are validated in f64 against
ocp/linearize.py::node_eval at realistic trot nodes; the solver-level check
confirms sqp_solve(merit="pallas") reproduces the "xla" line search bit-near.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import REFERENCE_ASSETS
from bipedal_control_tpu.ocp.linearize import node_eval
from bipedal_control_tpu.ops import pallas_linearize as PL
from bipedal_control_tpu.ops import pallas_merit as PM
from bipedal_control_tpu.solver import build_refs, initial_trajectory, sqp_solve

H1_TASK = os.path.join(
    REFERENCE_ASSETS, "bipedal_robot_example/unitree_h1/h1_ocs2_config/config/task/task.info"
)
pytestmark = pytest.mark.skipif(
    not os.path.exists(H1_TASK), reason="reference assets unavailable"
)


@pytest.fixture(scope="module")
def h1():
    from bipedal_control_tpu.interface import make_interface_for

    return make_interface_for("h1")


@pytest.fixture(scope="module")
def trot_setup(h1):
    rm = h1.make_reference_manager()
    rm.set_gait(h1.task.gait_library["trot"], start_time=0.05)
    frozen = rm.freeze(0.0)
    t_nodes = jnp.asarray(frozen.t_nodes)
    refs = build_refs(h1.info, frozen.gait, frozen.swing, frozen.target, t_nodes)
    x0 = jnp.asarray(h1.initial_state)
    xs, us = initial_trajectory(h1.info, refs, x0, h1.settings.num_intervals + 1)
    return refs, t_nodes, x0, xs, us


def _perturbed_instances(h1, trot_setup, m):
    """m (node, x, u, x_next) instances off the initializer trajectory, with
    mixed stance/swing flags from the real trot schedule."""
    refs, _, _, xs, us = trot_setup
    rng = np.random.default_rng(0)
    n = us.shape[0]
    idx = rng.integers(0, n, size=m)
    x = np.asarray(xs[idx]) + rng.normal(size=(m, xs.shape[1])) * 0.05
    u = np.asarray(us[idx]) + rng.normal(size=(m, us.shape[1])) * 2.0
    xn = np.asarray(xs[idx + 1]) + rng.normal(size=(m, xs.shape[1])) * 0.05
    sub = jax.tree.map(lambda a: a[idx], refs)
    return jnp.asarray(x), jnp.asarray(u), jnp.asarray(xn), sub, idx


def _ref_sums(h1, x, u, xn, refs_sub):
    c, d, e = jax.vmap(
        lambda xx, uu, xxn, rr: node_eval(
            h1.model, h1.info, h1.settings, h1.Q, h1.R, xx, uu, xxn, rr
        )
    )(x, u, xn, refs_sub)
    return (
        c,
        jnp.sum(jnp.abs(d), axis=1),
        jnp.sum(d**2, axis=1),
        jnp.sum(jnp.abs(e), axis=1),
        jnp.sum(e**2, axis=1),
    )


def test_circuit_matches_node_eval(h1, trot_setup):
    """Pure-jnp lane circuit (no Pallas) vs node_eval, f64."""
    m = 7
    x, u, xn, sub, _ = _perturbed_instances(h1, trot_setup, m)
    sm, tables = PM._get_static(h1.model, h1.info)
    tb = PL.tables_from_array(
        sm, jnp.asarray(tables, x.dtype)[:, :, None] * jnp.ones((1, 1, m), x.dtype)
    )
    lanes = lambda a: a.T  # (m, r) -> (r, m)
    defect, eq = PM.node_eval_lanes(
        sm,
        tb,
        float(h1.info.robot_mass),
        float(h1.settings.position_error_gain),
        h1.settings.integrator,
        lanes(x),
        lanes(u),
        lanes(xn),
        lanes(sub.contact_flags),
        lanes(sub.swing_vref),
        lanes(sub.swing_pref),
        sub.dt[None, :],
    )
    _, d1, _, e1, _ = _ref_sums(h1, x, u, xn, sub)
    np.testing.assert_allclose(jnp.sum(jnp.abs(defect), axis=0), d1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(jnp.sum(jnp.abs(eq), axis=0), e1, rtol=1e-10, atol=1e-12)


def test_kernel_interpret_matches_node_eval(h1, trot_setup):
    """Full pallas_call in interpret mode (padding + layout plumbing)."""
    m = 150  # > one lane tile, exercises padding
    x, u, xn, sub, _ = _perturbed_instances(h1, trot_setup, m)
    sums = PM.merit_sums_flat(
        h1.model,
        h1.info,
        h1.settings,
        x,
        u,
        xn,
        sub.contact_flags,
        sub.swing_vref,
        sub.swing_pref,
        sub.dt,
    )
    _, d1, d2, e1, e2 = _ref_sums(h1, x, u, xn, sub)
    np.testing.assert_allclose(sums[:, 0], d1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sums[:, 1], d2, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sums[:, 2], e1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sums[:, 3], e2, rtol=1e-10, atol=1e-12)


def test_sqp_merit_backends_agree(h1, trot_setup):
    """sqp_solve line-search outcomes identical across merit backends."""
    refs, t_nodes, x0, xs, us = trot_setup
    sols = {}
    for merit in ("xla", "pallas"):
        settings = dataclasses.replace(h1.settings, sqp_iterations=2, merit=merit)
        sols[merit] = jax.jit(
            lambda refs, t, x, a, b, s=settings: sqp_solve(
                h1.model, h1.info, s, h1.Q, h1.R, refs, t, x, a, b
            )
        )(refs, t_nodes, x0, xs, us)
    a, b = sols["xla"], sols["pallas"]
    assert float(a.step_size) == float(b.step_size)
    np.testing.assert_allclose(a.x_traj, b.x_traj, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(a.cost, b.cost, rtol=1e-9)
    np.testing.assert_allclose(a.defect_norm, b.defect_norm, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(a.eq_norm, b.eq_norm, rtol=1e-8, atol=1e-12)
