"""Parallel (associative-scan) Riccati vs the sequential sweep."""
import jax.numpy as jnp
import numpy as np

from bipedal_control_tpu.solver.parallel_riccati import solve_lqr_parallel
from bipedal_control_tpu.solver.riccati import solve_lqr

from test_riccati import _random_problem


def test_parallel_matches_sequential_unconstrained():
    rng = np.random.default_rng(7)
    nodes, masks = _random_problem(rng, N=12, constrained=False)
    dx0 = jnp.asarray(rng.normal(size=4) * 0.1)
    seq = solve_lqr(nodes, masks, dx0)
    par = solve_lqr_parallel(nodes, masks, dx0)
    np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K), atol=1e-7)


def test_parallel_matches_sequential_constrained():
    """Penalty-folded constraints: agreement to O(1/rho)."""
    rng = np.random.default_rng(8)
    nodes, masks = _random_problem(rng, N=10, constrained=True)
    dx0 = jnp.asarray(rng.normal(size=4) * 0.1)
    seq = solve_lqr(nodes, masks, dx0)
    par = solve_lqr_parallel(nodes, masks, dx0, penalty=1e6)
    np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du), atol=1e-5)
