"""Pallas TPU kernel: batched pivot-free Gauss-Jordan solve.

The Riccati stage-KKT systems are (nu+ne)^2 quasi-definite solves, batched
over scenarios at every one of the ~67 scan steps.  XLA executes the
rank-1-update formulation (ops/linalg.py) as ~n separate fused ops per step;
this kernel runs the whole elimination over a VMEM-resident batch tile
instead — one kernel per scan step, all updates on-chip.

Layout: the augmented matrix (batch, n, n + k) is padded to sublane/lane
tiles (rows -> multiple of 8, cols -> multiple of 128 for f32).  Padding is
benign: padded rows/cols are zero and elimination never pivots on them.

Falls back to the XLA formulation under `interpret=True` for CPU tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gj_kernel(n: int, rows: int, cols: int, aug_ref, out_ref):
    """Eliminate n pivots on aug (bt, rows, cols) in VMEM.

    Mosaic restricts unaligned dynamic slicing on the sublane/lane dims, so
    pivot row/column extraction uses one-hot masked reductions instead —
    pure VPU elementwise + reduce per pivot."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)

    def body(i, _):
        aug = aug_ref[:, :, :]
        mask_row = (row_ids == i).astype(aug.dtype)  # (rows, cols)
        mask_col = (col_ids == i).astype(aug.dtype)
        pivot_row = jnp.sum(aug * mask_row[None], axis=1)  # (bt, cols)
        onehot_col = (col_ids[0] == i).astype(aug.dtype)  # (cols,)
        pivot = jnp.sum(pivot_row * onehot_col[None], axis=1, keepdims=True)
        norm_row = pivot_row / pivot  # (bt, cols)
        col = jnp.sum(aug * mask_col[None], axis=2)  # (bt, rows)
        eliminated = aug - col[:, :, None] * norm_row[:, None, :]
        aug_ref[:, :, :] = (
            eliminated * (1.0 - mask_row)[None] + mask_row[None] * norm_row[:, None, :]
        )
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[:, :, :] = aug_ref[:, :, :]


def gauss_jordan_solve_pallas(A, B, batch_tile: int = 8, interpret: bool = False):
    """Solve A X = B for quasi-definite A (no pivoting).

    A: (batch, n, n); B: (batch, n, k) -> X: (batch, n, k).
    """
    batch, n, _ = A.shape
    k = B.shape[-1]
    rows = _round_up(n, 8)
    cols = _round_up(n + k, 128)
    bt = min(batch_tile, batch)
    pad_b = _round_up(batch, bt)

    aug = jnp.zeros((pad_b, rows, cols), dtype=A.dtype)
    aug = aug.at[:batch, :n, :n].set(A)
    aug = aug.at[:batch, :n, n : n + k].set(B)
    # unit diagonal on padded rows keeps them inert if ever touched
    diag_idx = jnp.arange(n, rows)
    aug = aug.at[:, diag_idx, diag_idx].set(1.0)

    grid = (pad_b // bt,)
    out = pl.pallas_call(
        functools.partial(_gj_kernel, n, rows, cols),
        out_shape=jax.ShapeDtypeStruct((pad_b, rows, cols), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, rows, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bt, rows, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aug)
    return out[:batch, :n, n : n + k]
