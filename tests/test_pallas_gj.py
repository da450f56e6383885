"""Pallas Gauss-Jordan kernel vs the XLA formulation (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from bipedal_control_tpu.ops.linalg import gauss_jordan_solve
from bipedal_control_tpu.ops.pallas_gj import gauss_jordan_solve_pallas


def _quasi_definite(rng, n, m):
    W = rng.normal(size=(n - m, n - m))
    H = W @ W.T + np.eye(n - m)
    D = rng.normal(size=(m, n - m))
    A = np.zeros((n, n))
    A[: n - m, : n - m] = H
    A[n - m :, : n - m] = D
    A[: n - m, n - m :] = D.T
    A[n - m :, n - m :] = -np.eye(m) * 0.5
    return A


def test_pallas_gj_matches_xla(rng):
    batch, n, k = 5, 14, 6
    A = np.stack([_quasi_definite(rng, n, 4) for _ in range(batch)])
    B = rng.normal(size=(batch, n, k))
    X_ref = np.stack([np.linalg.solve(A[i], B[i]) for i in range(batch)])
    X_xla = gauss_jordan_solve(jnp.asarray(A), jnp.asarray(B))
    X_pl = gauss_jordan_solve_pallas(
        jnp.asarray(A), jnp.asarray(B), batch_tile=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(X_xla), X_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(X_pl), X_ref, atol=1e-9)
