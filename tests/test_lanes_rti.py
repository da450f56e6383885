"""Fused lane-layout batched RTI (solver/lanes_rti.py) vs vmap(sqp_solve).

The fast path must be SEMANTICALLY IDENTICAL to the standard batched solver
— same kernels, same cost quadratics, same filter linesearch — it only
changes the physical layout at the linearize/Riccati seam.  Pinned here on
the synthetic 4-joint biped (CPU interpret mode, f64, tight tolerance)
across batch lanes with different contact patterns, warm starts and both
linesearch modes (filter candidates and the empty-alphas pure RTI).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipedal_control_tpu.ocp.problem import NodeRefs, OcpSettings

from test_pallas_linearize_kernel import _FLAGS, tiny_biped


def _batched_problem(model, info, B=3, N=4, seed=11):
    nx, nu = info.state_dim, info.input_dim
    rng = np.random.default_rng(seed)
    xs = rng.normal(scale=0.3, size=(B, N, nx))
    xs[..., 8] += 0.6
    us = rng.normal(scale=0.8, size=(B, N, nu))
    us[..., 2:12:3] += 30.0
    dt = np.tile(np.array([0.015, 0.02, 0.015, 0.035][:N]), (B, 1))
    refs = NodeRefs(
        t=jnp.asarray(np.cumsum(dt, axis=1) - dt),
        dt=jnp.asarray(dt),
        contact_flags=jnp.asarray(
            np.stack([np.roll(_FLAGS[:N], k, axis=0) for k in range(B)])
        ),
        swing_vref=jnp.asarray(rng.normal(scale=0.3, size=(B, N, 4))),
        swing_pref=jnp.asarray(rng.normal(scale=0.05, size=(B, N, 4))),
        x_nom=jnp.asarray(xs + rng.normal(scale=0.1, size=(B, N, nx))),
        u_nom=jnp.asarray(us + rng.normal(scale=0.4, size=(B, N, nu))),
    )
    t_nodes = jnp.asarray(
        np.concatenate([np.zeros((B, 1)), np.cumsum(dt, axis=1)], axis=1)
    )
    x_init = jnp.asarray(xs[:, 0] + rng.normal(scale=0.02, size=(B, nx)))
    xs_w = jnp.asarray(np.concatenate([xs, xs[:, -1:]], axis=1))
    us_w = jnp.asarray(us)
    return refs, t_nodes, x_init, xs_w, us_w


@pytest.mark.parametrize("alphas", [(1.0, 0.5), ()])
def test_lanes_rti_matches_vmap_sqp(alphas):
    from bipedal_control_tpu.parallel.batch_solver import batched_sqp_solve
    from bipedal_control_tpu.solver.lanes_rti import _supports, make_lanes_rti_solver
    from bipedal_control_tpu.solver.sqp import sqp_solve

    model, info = tiny_biped()
    nx, nu = info.state_dim, info.input_dim
    Q = jnp.asarray(np.diag(np.linspace(1.0, 3.0, nx)))
    R = jnp.asarray(np.diag(np.linspace(0.1, 0.5, nu)))
    settings = OcpSettings(
        position_error_gain=0.35, integrator="rk2",
        linearize="pallas", riccati="pallas", merit="pallas",
        sqp_iterations=2, linesearch_alphas=alphas,
    )
    assert _supports(settings)
    refs, t_nodes, x_init, xs_w, us_w = _batched_problem(model, info)

    fast = jax.jit(make_lanes_rti_solver(model, info, settings, Q, R))(
        refs, t_nodes, x_init, xs_w, us_w
    )
    ref = jax.jit(
        jax.vmap(
            lambda r, t, x, ws_x, ws_u: sqp_solve(
                model, info, settings, Q, R, r, t, x, ws_x, ws_u
            )
        )
    )(refs, t_nodes, x_init, xs_w, us_w)

    # Tolerance note: the two paths are the SAME kernels on inputs that
    # differ only at f64 rounding level (different lane packing reassociates
    # the data-prep arithmetic, measured <=9e-16 absolute on every stage
    # tensor), but the stage-KKT solve amplifies input perturbations by
    # ~1e10 here — the pallas backward sweep differs from the exact
    # sequential solve_lqr by the same order (6.6e-4 abs on K, measured on
    # this problem).  1e-5 relative is therefore the honest parity bar;
    # the discrete linesearch outcome must match exactly.
    # (K amplifies hardest: measured 4.2e-5 after the second iteration
    # relinearizes at the 1e-6-perturbed iterate)
    for name, tol in (("x_traj", 1e-5), ("u_traj", 1e-5), ("K", 1e-3),
                      ("cost", 1e-5), ("defect_norm", 1e-5), ("eq_norm", 1e-5)):
        got = np.asarray(getattr(fast, name), dtype=np.float64)
        want = np.asarray(getattr(ref, name), dtype=np.float64)
        scale = max(1.0, float(np.max(np.abs(want))))
        err = float(np.max(np.abs(got - want))) / scale
        assert err < tol, f"{name}: rel err {err:.3e}"
    np.testing.assert_array_equal(
        np.asarray(fast.step_size), np.asarray(ref.step_size)
    )

    # the dispatcher routes qualifying settings through the fast path
    via_dispatch = jax.jit(
        lambda *a: batched_sqp_solve(model, info, settings, Q, R, *a)
    )(refs, t_nodes, x_init, xs_w, us_w)
    np.testing.assert_allclose(
        np.asarray(via_dispatch.x_traj), np.asarray(fast.x_traj), atol=1e-12
    )


def test_lanes_rti_sharded_matches_unsharded():
    """The fused lanes path under a device mesh (shard_map in
    make_batched_solver): per-device shards solve their local batch; the
    sharded result equals the unsharded one.  Runs on the 8 virtual CPU
    devices the conftest configures — the same falsification path as
    __graft_entry__.dryrun_multichip."""
    import jax

    from bipedal_control_tpu.parallel.batch_solver import (
        make_batched_solver,
        make_mesh,
        shard_batch,
    )
    from bipedal_control_tpu.solver.lanes_rti import _supports, make_lanes_rti_solver

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU config")
    model, info = tiny_biped()
    nx, nu = info.state_dim, info.input_dim
    Q = jnp.asarray(np.diag(np.linspace(1.0, 3.0, nx)))
    R = jnp.asarray(np.diag(np.linspace(0.1, 0.5, nu)))
    settings = OcpSettings(
        position_error_gain=0.35, integrator="rk2",
        linearize="pallas", riccati="pallas", merit="pallas",
        sqp_iterations=1, linesearch_alphas=(1.0,),
    )
    assert _supports(settings)
    n_dev = 4
    mesh = make_mesh("data", jax.devices()[:n_dev])
    refs, t_nodes, x_init, xs_w, us_w = _batched_problem(model, info, B=n_dev)
    args = shard_batch((refs, t_nodes, x_init, xs_w, us_w), mesh, "data")
    solver = make_batched_solver(
        model, info, settings, Q, R, mesh, "data", donate_warm_start=False
    )
    sol = solver(*args)
    ref = jax.jit(make_lanes_rti_solver(model, info, settings, Q, R))(
        refs, t_nodes, x_init, xs_w, us_w
    )
    # per-shard compilation refuses the full-batch program's exact fusion
    # choices (the cost-quadratic reassociation shifts by ~1e-16, amplified
    # through the stage KKT like the vmap-parity case above): 1e-5 is the
    # honest agreement bar, with the discrete linesearch outcome exact
    np.testing.assert_allclose(
        np.asarray(sol.x_traj), np.asarray(ref.x_traj), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(sol.step_size), np.asarray(ref.step_size)
    )
