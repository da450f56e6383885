"""Broadcast-multiply-reduce contractions for tiny-dim batched linear algebra.

On TPU, `@` / `jnp.einsum` on small operands (3-22 wide) under a scenario
batch lowers to batched `dot_general`s that the MXU executes one tiny
(heavily padded) matmul per batch element — the framework-op profile of the
batched SQP showed ~20 ms/step of such dot_generals at B=256.  Expressing the
same contractions as broadcast-multiply + `sum` keeps them on the VPU where
the batch dimension vectorizes across lanes (XLA fuses the multiply into the
reduction, so the (…, m, k, n) intermediate is never materialized).

Use these ONLY for small inner dimensions (<~32); large contractions belong
on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp


def mv(M, v):
    """(…, m, k) x (…, k) -> (…, m) on the VPU."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def mm(A, B):
    """(…, m, k) @ (…, k, n) -> (…, m, n) on the VPU (small k/m/n only)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def quad(v, M, w):
    """v^T M w with batching: (…, m), (…, m, k), (…, k) -> (…,)."""
    return jnp.sum(v * mv(M, w), axis=-1)
