"""Whole-backward-sweep Pallas Riccati kernel vs the XLA stage-KKT scan.

The kernel (ops/pallas_riccati.py) must reproduce solver/riccati.py
bit-tolerantly on constrained problems with masked rows, both through the
scenario `vmap` (the production batched path, via custom_vmap) and unbatched.
Runs in Pallas interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bipedal_control_tpu.solver.riccati import solve_lqr, solve_lqr_pallas

from test_riccati import _random_problem


def _batched_problem(seed, B, **kw):
    nodes_l, masks_l = [], []
    for b in range(B):
        rng = np.random.default_rng(seed + b)
        n, m = _random_problem(rng, **kw)
        nodes_l.append(n)
        masks_l.append(m)
    nodes = jax.tree.map(lambda *a: jnp.stack(a), *nodes_l)
    masks = jnp.stack(masks_l)
    return nodes, masks


def test_pallas_matches_xla_batched():
    B, nx = 3, 4
    nodes, masks = _batched_problem(11, B, N=5, nx=nx, nu=3, ne=2, constrained=True)
    rng = np.random.default_rng(99)
    dx0 = jnp.asarray(rng.normal(size=(B, nx)) * 0.1)

    ref = jax.vmap(solve_lqr)(nodes, masks, dx0)
    out = jax.vmap(solve_lqr_pallas)(nodes, masks, dx0)

    np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.dx), np.asarray(ref.dx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(out.expected_decrease), np.asarray(ref.expected_decrease), rtol=1e-8
    )


def test_pallas_unbatched_entry():
    rng = np.random.default_rng(21)
    nodes, masks = _random_problem(rng, N=4, nx=4, nu=3, ne=2, constrained=True)
    dx0 = jnp.asarray(rng.normal(size=4) * 0.1)
    ref = solve_lqr(nodes, masks, dx0)
    out = solve_lqr_pallas(nodes, masks, dx0)
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.dx), np.asarray(ref.dx), atol=1e-9)


def test_pallas_in_sqp_jit():
    """settings.riccati='pallas' composes with jit + the scenario vmap."""
    import dataclasses

    from bipedal_control_tpu.solver.riccati import _solve_lqr_pallas_batched

    B = 2
    nodes, masks = _batched_problem(31, B, N=4, nx=4, nu=3, ne=2, constrained=True)
    dx0 = jnp.zeros((B, 4))
    out = jax.jit(_solve_lqr_pallas_batched)(nodes, masks, dx0)
    ref = jax.jit(jax.vmap(solve_lqr))(nodes, masks, dx0)
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du), atol=1e-9)


def test_pallas_backend_in_full_sqp():
    """riccati='pallas' through the full batched SQP (jit + scenario vmap)
    matches the sequential backend on a short-horizon H1 problem."""
    import dataclasses
    import os

    import pytest

    from conftest import REFERENCE_ASSETS

    task = os.path.join(
        REFERENCE_ASSETS,
        "bipedal_robot_example/unitree_h1/h1_ocs2_config/config/task/task.info",
    )
    if not os.path.exists(task):
        pytest.skip("reference assets unavailable")

    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.parallel.batch_solver import batched_sqp_solve
    from bipedal_control_tpu.solver import build_refs, initial_trajectory

    iface = make_interface_for("h1")
    base = dataclasses.replace(iface.settings, horizon=0.09, sqp_iterations=1)
    rm = iface.make_reference_manager()
    frozen = rm.freeze(0.0)
    t_nodes = jnp.asarray(frozen.t_nodes)[: base.num_intervals + 1]
    refs = build_refs(iface.info, frozen.gait, frozen.swing, frozen.target, t_nodes)
    x0 = jnp.asarray(iface.initial_state)
    xs, us = initial_trajectory(iface.info, refs, x0, base.num_intervals + 1)

    B = 2
    tile = lambda a: jnp.broadcast_to(a[None], (B,) + a.shape)
    args = (jax.tree.map(tile, refs), tile(t_nodes), tile(x0), tile(xs), tile(us))

    outs = {}
    for backend in ("sequential", "pallas"):
        st = dataclasses.replace(base, riccati=backend)
        outs[backend] = jax.jit(
            lambda *a, st=st: batched_sqp_solve(
                iface.model, iface.info, st, iface.Q, iface.R, *a
            )
        )(*args)
    np.testing.assert_allclose(
        np.asarray(outs["pallas"].x_traj),
        np.asarray(outs["sequential"].x_traj),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(outs["pallas"].u_traj),
        np.asarray(outs["sequential"].u_traj),
        atol=1e-8,
    )
