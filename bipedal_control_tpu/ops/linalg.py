"""TPU-friendly small dense linear algebra.

`jnp.linalg.solve` lowers to pivoted LU, which serializes badly on TPU for
the small (38x38-ish) per-stage KKT systems inside the Riccati scan — and
under a scenario batch it gains nothing from the vector lanes.  Here:

- :func:`gauss_jordan_solve`: pivot-free Gauss-Jordan elimination as a
  fori_loop of rank-1 updates.  Every step is an outer product over the
  (batch, n, n+k) augmented matrix — pure VPU work that vectorizes across the
  batch.  No pivoting is safe for our KKT: the (1,1) block has a positive
  diagonal (regularized Gauss-Newton Hessian) and the trailing Schur
  complement is negative definite (dual regularization), so pivots never
  vanish (quasi-definite matrix, Vanderbei).

- :func:`solve_saddle_kkt`: convenience wrapper for [[H, D^T], [D, -E]].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_jordan_solve(A, B):
    """Solve A X = B for quasi-definite A without pivoting.

    A: (..., n, n); B: (..., n, k) -> X: (..., n, k).
    """
    n = A.shape[-1]
    aug = jnp.concatenate([A, B], axis=-1)  # (..., n, n+k)

    def step(i, aug):
        pivot_row = aug[..., i, :]  # (..., n+k)
        pivot = jnp.take(pivot_row, i, axis=-1)[..., None]  # (..., 1)
        inv_pivot = 1.0 / pivot
        norm_row = pivot_row * inv_pivot  # (..., n+k)
        col = aug[..., :, i]  # (..., n)
        # eliminate column i from every row, then restore the pivot row
        update = col[..., :, None] * norm_row[..., None, :]
        aug = aug - update
        aug = aug.at[..., i, :].set(norm_row)
        return aug

    aug = jax.lax.fori_loop(0, n, step, aug)
    return aug[..., :, A.shape[-1] :]


def solve_saddle_kkt(H, D, reg, rhs_top, rhs_bot):
    """Solve [[H, D^T], [D, -diag(reg)]] [x; y] = [rhs_top; rhs_bot].

    Shapes: H (..., n, n), D (..., m, n), reg (..., m),
    rhs_top (..., n, k), rhs_bot (..., m, k).
    """
    m = D.shape[-2]
    kkt = jnp.concatenate(
        [
            jnp.concatenate([H, D.swapaxes(-1, -2)], axis=-1),
            jnp.concatenate([D, -_batch_diag(reg, m)], axis=-1),
        ],
        axis=-2,
    )
    rhs = jnp.concatenate([rhs_top, rhs_bot], axis=-2)
    return gauss_jordan_solve(kkt, rhs)


def _batch_diag(v, m):
    return v[..., :, None] * jnp.eye(m)
