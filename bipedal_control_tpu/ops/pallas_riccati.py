"""Pallas TPU kernel: the ENTIRE constrained Riccati backward sweep.

Why: the XLA formulation (solver/riccati.py) is a `lax.scan` of ~67 stages,
each a ~38-pivot Gauss-Jordan KKT solve plus ~10 small matmuls — ~3700 tiny
sequential HLO ops whose per-op dispatch overhead (~4-5 us) dominates the
16-17 ms stage time at batch 256.  A previous per-stage kernel (pallas_gj.py)
still paid one kernel launch per scan step.  This kernel runs the WHOLE
backward recursion in one `pallas_call`:

- grid = (batch_tiles, N) with the stage dimension innermost and index-mapped
  in reverse, so the cost-to-go carry (S, s) lives in VMEM scratch across
  stages of a fixed batch tile;
- layout is batch-on-lanes ("struct of arrays"): every per-stage tensor is
  stored (N, rows, cols, batch) with the 128-wide batch tile on the lane
  dimension, so every contraction is an unrolled sequence of 8x128 VPU FMAs
  with *static* sublane/lane indexing — no one-hot masked reductions, no MXU
  relayouts of 22-wide operands (batched dot_general on tiny dims is
  MXU-hostile, see ops/linalg.py);
- the per-stage KKT solve is the same pivot-free Gauss-Jordan as
  ops/linalg.py (quasi-definite => pivots never vanish), fully unrolled over
  static pivot indices.

Stage math is identical to solver/riccati.py::_stage_kkt (the Riccati
recursion with stage-wise equality elimination that replaces OCS2/HPIPM's
projected QP, reference task.info sqp block), so the kernel is validated
against the XLA path bit-tolerantly in tests/test_pallas_riccati.py.

Interpret mode (CPU tests) runs the same program unrolled by the Pallas
interpreter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # batch tile width = TPU lane count


def _mm(a, b):
    """Contract over the LEADING dim of both operands (batch on lanes).

    a: (k, m, bt), b: (k, n, bt) -> (m, n, bt) with out[m,n] = sum_k a[k,m] b[k,n]
    (i.e. a^T @ b per batch lane).  Unrolled: k static slices on the leading
    dim are free; each step is one (m, n, bt) VPU FMA.
    """
    k = a.shape[0]
    acc = a[0][:, None, :] * b[0][None, :, :]
    for i in range(1, k):
        acc = acc + a[i][:, None, :] * b[i][None, :, :]
    return acc


def _mv(a, v):
    """a: (k, m, bt), v: (k, bt) -> (m, bt) = sum_k a[k,m] v[k] (a^T v)."""
    k = a.shape[0]
    acc = a[0] * v[0][None, :]
    for i in range(1, k):
        acc = acc + a[i] * v[i][None, :]
    return acc


def _transpose01(m):
    """(r, c, bt) -> (c, r, bt) via static sublane slices (no lane movement)."""
    return jnp.concatenate([m[:, i, :][None] for i in range(m.shape[1])], axis=0)


def _backward_kernel(
    nu: int,
    ne: int,
    nx: int,
    dual_eps: float,
    huu_reg: float,
    A_ref,
    B_ref,
    c_ref,
    C_ref,
    D_ref,
    e_ref,
    Qxx_ref,
    Quu_ref,
    Qux_ref,
    qx_ref,
    qu_ref,
    mask_ref,
    K_ref,
    k_ref,
    KT_ref,
    S_ref,
    s_ref,
):
    j = pl.program_id(1)  # 0 == last stage (index map reverses time)

    @pl.when(j == 0)
    def _():
        S_ref[...] = jnp.zeros_like(S_ref)
        s_ref[...] = jnp.zeros_like(s_ref)

    A = A_ref[0]  # (nx, nx, bt) rows on dim 0
    Bm = B_ref[0]  # (nx, nu, bt)
    c = c_ref[0]  # (nx, bt)
    Cm = C_ref[0]  # (ne, nx, bt)
    D = D_ref[0]  # (ne, nu, bt)
    e = e_ref[0]  # (ne, bt)
    Qxx = Qxx_ref[0]
    Quu = Quu_ref[0]
    Qux = Qux_ref[0]  # (nu, nx, bt)
    qx = qx_ref[0]
    qu = qu_ref[0]
    mask = mask_ref[0]  # (ne, bt)
    S = S_ref[...]
    s = s_ref[...]

    # S is symmetric: S A == (S^T) A == _mm(S, A)
    SA = _mm(S, A)  # (nx, nx, bt)
    SB = _mm(S, Bm)  # (nx, nu, bt)
    Sc = _mv(S, c) + s  # (nx, bt)
    H_xx = Qxx + _mm(A, SA)
    H_uu = Quu + _mm(Bm, SB)
    H_ux = Qux + _mm(Bm, SA)  # (nu, nx, bt)
    h_x = qx + _mv(A, Sc)
    h_u = qu + _mv(Bm, Sc)

    dt = A.dtype

    def _eye(n):
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return (r == cc).astype(dt)

    eye_nu = _eye(nu)[:, :, None]
    reg = mask * dual_eps + (1.0 - mask) * 1.0  # (ne, bt)
    negE = -_eye(ne)[:, :, None] * reg[:, None, :]
    DT = _transpose01(D)  # (nu, ne, bt)
    # augmented KKT system [Huu+rI  D^T | Hux  h_u] ; [D  -E | C  e], built
    # COLUMN-major (cols, rows, bt) directly — the Gauss-Jordan below drops
    # eliminated columns by leading-axis slicing, and building in that
    # orientation avoids a (79, 47, bt) whole-matrix transpose (the
    # symmetric blocks Huu+rI and -E are their own transposes)
    nk = nu + ne
    aug = jnp.concatenate(
        [
            jnp.concatenate([H_uu + huu_reg * eye_nu, DT], axis=1),  # cols 0..nu
            jnp.concatenate([D, negE], axis=1),  # cols nu..nk
            jnp.concatenate(
                [_transpose01(H_ux), _transpose01(Cm)], axis=1
            ),  # state columns
            jnp.concatenate([h_u, e], axis=0)[None],  # RHS column
        ],
        axis=0,
    )  # (nk+nx+1, nk, bt) column-major

    # Pivot-free Gauss-Jordan, fully unrolled with static indices, with two
    # VPU-level reductions vs the naive form:
    # - one reciprocal + multiplies instead of per-column divisions (VPU
    #   divides are slower than FMAs);
    # - ELIMINATED COLUMNS ARE DROPPED in blocks of 8: only the trailing
    #   [Hux | h_u] solution columns are ever read after the sweep, so the
    #   working set shrinks 79 -> 32 wide (H1) across the sweep — ~25%
    #   fewer FMAs than updating the full augmented matrix.  The matrix is
    #   held column-major (cols, rows, bt) so the shrink is a LEADING-axis
    #   slice; blockwise (not per-pivot) shrinking keeps the number of
    #   distinct intermediate shapes small enough for the Mosaic compiler
    #   (per-pivot shrinking crashed the compile helper), and dropped
    #   column indices are tracked by `off`.
    augT = aug  # already column-major (cols, nk, bt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0)
    _BLK = 8
    off = 0  # columns already dropped
    for i in range(nk):
        e_i = (rows == i).astype(dt)  # (nk, 1)
        colm = augT[i - off] - e_i  # (nk, bt)
        rowi = augT[:, i, :]  # (w, bt) current pivot row, column-major
        piv = rowi[i - off]  # (bt,)
        norm = rowi * (1.0 / piv)[None, :]
        augT = augT - norm[:, None, :] * colm[None, :, :]
        if (i + 1) % _BLK == 0:
            augT = augT[_BLK:]
            off += _BLK

    augT = augT[nk - off :]  # (nx+1, nk, bt): the solution columns
    K = _transpose01(augT[:nx, :nu, :])  # (nu, nx, bt)
    kvec = augT[nx, :nu, :]  # (nu, bt)

    HuuK = _mm(H_uu, K)  # (nu, nx, bt) = Huu K (Huu symmetric)
    KtHuuK = _mm(K, HuuK)  # (nx, nx, bt)
    KtHux = _mm(K, H_ux)  # (nx, nx, bt) = K^T Hux
    HuxtK = _mm(H_ux, K)  # (nx, nx, bt) = Hux^T K
    S_new = H_xx + KtHuuK - KtHux - HuxtK
    S_new = 0.5 * (S_new + _transpose01(S_new))
    Huuk = _mv(H_uu, kvec)  # (nu, bt)
    s_new = h_x + _mv(K, Huuk) - _mv(K, h_u) - _mv(H_ux, kvec)

    S_ref[...] = S_new
    s_ref[...] = s_new
    K_ref[0] = K
    k_ref[0] = kvec
    # contraction-ready orientation for the forward-rollout kernel
    KT_ref[0] = _transpose01(K)


def _forward_kernel(AT_ref, BT_ref, c_ref, KT_ref, k_ref, dx0_ref, dxs_ref, dus_ref, dxl_ref, dx_scr):
    """One forward stage: du = -K dx - k; dx' = A dx + B du + c.

    All matrix inputs are stored contraction-index-leading (A^T/B^T/K^T
    orientation), so every product is the leading-dim `_mv` contraction."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dx_scr[...] = dx0_ref[...]

    dx = dx_scr[...]
    du = -_mv(KT_ref[0], dx) - k_ref[0]
    dxs_ref[0] = dx
    dus_ref[0] = du
    dxn = _mv(AT_ref[0], dx) + _mv(BT_ref[0], du) + c_ref[0]
    dx_scr[...] = dxn
    dxl_ref[...] = dxn  # revisited every stage; the last stage's value survives


def riccati_backward_pallas(nodes, masks, dual_eps: float, huu_reg: float, interpret: bool):
    """Whole-horizon backward sweep over a scenario batch.

    nodes: LinearizedNode pytree with leading axes (B, N, ...);
    masks: (B, N, ne).  Returns K (B, N, nu, nx), k (B, N, nu).
    """
    Bb, N, nx, nu = nodes.B.shape
    ne = nodes.e.shape[-1]
    Bp = -(-Bb // LANE) * LANE  # pad batch to full lane tiles

    def to_lanes(x):
        # (B, N, ...) -> (N, ..., Bp): batch last, zero-padded
        x = jnp.moveaxis(x, 0, -1)
        if Bp != Bb:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - Bb)]
            x = jnp.pad(x, pad)
        return x

    A_t = to_lanes(nodes.A)
    B_t = to_lanes(nodes.B)
    c_t = to_lanes(nodes.c)
    C_t = to_lanes(nodes.C)
    D_t = to_lanes(nodes.D)
    e_t = to_lanes(nodes.e)
    Qxx_t = to_lanes(nodes.Qxx)
    Quu_t = to_lanes(nodes.Quu)
    Qux_t = to_lanes(nodes.Qux)
    qx_t = to_lanes(nodes.qx)
    qu_t = to_lanes(nodes.qu)
    m_t = to_lanes(masks)
    # padded batch lanes see an identity-friendly KKT: zero H/D rows would
    # divide 0/0, so give padded lanes a unit Huu diagonal via Quu padding
    if Bp != Bb:
        padeye = jnp.asarray(np.eye(nu), A_t.dtype)[None, :, :, None] * jnp.ones(
            (N, 1, 1, Bp - Bb), A_t.dtype
        )
        Quu_t = jnp.concatenate([Quu_t[..., :Bb], padeye], axis=-1)
        m_t = jnp.concatenate([m_t[..., :Bb], jnp.zeros((N, ne, Bp - Bb), m_t.dtype)], axis=-1)

    dt = A_t.dtype
    grid = (Bp // LANE, N)

    def mat_spec(r, cdim):
        return pl.BlockSpec(
            (1, r, cdim, LANE),
            lambda i, j: (N - 1 - j, 0, 0, i),
            memory_space=pltpu.VMEM,
        )

    def vec_spec(r):
        return pl.BlockSpec(
            (1, r, LANE), lambda i, j: (N - 1 - j, 0, i), memory_space=pltpu.VMEM
        )

    kern = functools.partial(_backward_kernel, nu, ne, nx, dual_eps, huu_reg)
    K_t, k_t, KT_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            mat_spec(nx, nx),  # A
            mat_spec(nx, nu),  # B
            vec_spec(nx),  # c
            mat_spec(ne, nx),  # C
            mat_spec(ne, nu),  # D
            vec_spec(ne),  # e
            mat_spec(nx, nx),  # Qxx
            mat_spec(nu, nu),  # Quu
            mat_spec(nu, nx),  # Qux
            vec_spec(nx),  # qx
            vec_spec(nu),  # qu
            vec_spec(ne),  # mask
        ],
        out_specs=[mat_spec(nu, nx), vec_spec(nu), mat_spec(nx, nu)],
        out_shape=[
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dt),
            jax.ShapeDtypeStruct((N, nu, Bp), dt),
            jax.ShapeDtypeStruct((N, nx, nu, Bp), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, nx, LANE), dt),
            pltpu.VMEM((nx, LANE), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(A_t, B_t, c_t, C_t, D_t, e_t, Qxx_t, Quu_t, Qux_t, qx_t, qu_t, m_t)

    K = jnp.moveaxis(K_t[..., :Bb], -1, 0)  # (B, N, nu, nx)
    kk = jnp.moveaxis(k_t[..., :Bb], -1, 0)  # (B, N, nu)
    return K, kk, (KT_t, c_t, grid, dt)


def riccati_solve_pallas(nodes, masks, dx0, dual_eps: float, huu_reg: float, interpret: bool):
    """Backward sweep + forward rollout, both as whole-horizon kernels.

    Returns (K (B,N,nu,nx), k (B,N,nu), dx_all (B,N+1,nx), du (B,N,nu)).
    """
    Bb, N, nx, nu = nodes.B.shape
    Bp = -(-Bb // LANE) * LANE
    K, kk, (KT_t, c_t, grid, dt) = riccati_backward_pallas(
        nodes, masks, dual_eps, huu_reg, interpret
    )
    k_t = jnp.moveaxis(kk, 0, -1)
    if Bp != Bb:
        k_t = jnp.pad(k_t, ((0, 0), (0, 0), (0, Bp - Bb)))

    def tr_lanes(x):
        # (B, N, r, c) -> (N, c, r, Bp): contraction-index-leading + batch last
        x = jnp.transpose(x, (1, 3, 2, 0))
        if Bp != Bb:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Bp - Bb)))
        return x

    AT_t = tr_lanes(nodes.A)  # (N, nx, nx, Bp), A^T orientation
    BT_t = tr_lanes(nodes.B)  # (N, nu, nx, Bp)
    dx0_t = jnp.moveaxis(dx0, 0, -1)
    if Bp != Bb:
        dx0_t = jnp.pad(dx0_t, ((0, 0), (0, Bp - Bb)))

    def mat_fwd(r, cdim):
        return pl.BlockSpec(
            (1, r, cdim, LANE), lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM
        )

    def vec_fwd(r):
        return pl.BlockSpec((1, r, LANE), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM)

    fixed = lambda r: pl.BlockSpec((r, LANE), lambda i, j: (0, i), memory_space=pltpu.VMEM)

    dxs_t, dus_t, dxl_t = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            mat_fwd(nx, nx),  # A^T
            mat_fwd(nu, nx),  # B^T
            vec_fwd(nx),  # c
            mat_fwd(nx, nu),  # K^T
            vec_fwd(nu),  # k
            fixed(nx),  # dx0
        ],
        out_specs=[vec_fwd(nx), vec_fwd(nu), fixed(nx)],
        out_shape=[
            jax.ShapeDtypeStruct((N, nx, Bp), dt),
            jax.ShapeDtypeStruct((N, nu, Bp), dt),
            jax.ShapeDtypeStruct((nx, Bp), dt),
        ],
        scratch_shapes=[pltpu.VMEM((nx, LANE), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(AT_t, BT_t, c_t, KT_t, k_t, dx0_t)

    dxs = jnp.moveaxis(dxs_t[..., :Bb], -1, 0)  # (B, N, nx)
    dus = jnp.moveaxis(dus_t[..., :Bb], -1, 0)  # (B, N, nu)
    dx_all = jnp.concatenate([dxs, jnp.moveaxis(dxl_t[:, :Bb], -1, 0)[:, None]], axis=1)
    return K, kk, dx_all, dus


def riccati_solve_pallas_prelaned(
    lanes, masks_t, dx0_t, Bb: int, dual_eps: float, huu_reg: float, interpret: bool
):
    """Backward sweep + forward rollout on PRE-LANED stage data.

    The fused RTI path (solver/lanes_rti.py): every stage tensor arrives
    already in this module's lane layout — (N, rows, cols, Bp) with the
    scenario batch zero-padded onto the lane axis — as produced by
    ops/pallas_linearize_kernel.linearize_lanes_batched and the lane-layout
    cost quadratics.  This entry therefore runs the SAME two kernels as
    riccati_solve_pallas with ZERO input relayout (the standard entry's
    to_lanes/tr_lanes moveaxes are the measured 2.6 ms/step glue at B=256);
    the only remaining transposes are the sublane-dim A^T/B^T orientation
    swaps (lanes untouched) and the small batch-leading outputs.

    lanes: dict A,B,c,C,D,e,Qxx,Quu,Qux,qx,qu; masks_t (N, ne, Bp);
    dx0_t (nx, Bp).  Returns (K (B,N,nu,nx), k (B,N,nu), dx_all (B,N+1,nx),
    du (B,N,nu)) sliced back to the true batch Bb.
    """
    A_t = lanes["A"]
    N, nx, _, Bp = A_t.shape
    nu = lanes["B"].shape[2]
    ne = lanes["e"].shape[1]
    dt = A_t.dtype
    Quu_t = lanes["Quu"]
    if Bp != Bb:
        # padded lanes carry zero stage data; give them a unit Huu diagonal
        # so the in-kernel KKT solve stays finite (same fix as to_lanes)
        padeye = jnp.asarray(np.eye(nu), dt)[None, :, :, None] * jnp.ones(
            (N, 1, 1, Bp - Bb), dt
        )
        Quu_t = jnp.concatenate([Quu_t[..., :Bb], padeye], axis=-1)

    grid = (Bp // LANE, N)

    def mat_spec(r, cdim):
        return pl.BlockSpec(
            (1, r, cdim, LANE),
            lambda i, j: (N - 1 - j, 0, 0, i),
            memory_space=pltpu.VMEM,
        )

    def vec_spec(r):
        return pl.BlockSpec(
            (1, r, LANE), lambda i, j: (N - 1 - j, 0, i), memory_space=pltpu.VMEM
        )

    kern = functools.partial(_backward_kernel, nu, ne, nx, dual_eps, huu_reg)
    K_t, k_t, KT_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            mat_spec(nx, nx),  # A
            mat_spec(nx, nu),  # B
            vec_spec(nx),  # c
            mat_spec(ne, nx),  # C
            mat_spec(ne, nu),  # D
            vec_spec(ne),  # e
            mat_spec(nx, nx),  # Qxx
            mat_spec(nu, nu),  # Quu
            mat_spec(nu, nx),  # Qux
            vec_spec(nx),  # qx
            vec_spec(nu),  # qu
            vec_spec(ne),  # mask
        ],
        out_specs=[mat_spec(nu, nx), vec_spec(nu), mat_spec(nx, nu)],
        out_shape=[
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dt),
            jax.ShapeDtypeStruct((N, nu, Bp), dt),
            jax.ShapeDtypeStruct((N, nx, nu, Bp), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, nx, LANE), dt),
            pltpu.VMEM((nx, LANE), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        A_t, lanes["B"], lanes["c"], lanes["C"], lanes["D"], lanes["e"],
        lanes["Qxx"], Quu_t, lanes["Qux"], lanes["qx"], lanes["qu"], masks_t,
    )

    # A^T/B^T orientation: sublane-dim swap only, lanes untouched
    AT_t = jnp.swapaxes(A_t, 1, 2)
    BT_t = jnp.swapaxes(lanes["B"], 1, 2)

    def mat_fwd(r, cdim):
        return pl.BlockSpec(
            (1, r, cdim, LANE), lambda i, j: (j, 0, 0, i), memory_space=pltpu.VMEM
        )

    def vec_fwd(r):
        return pl.BlockSpec((1, r, LANE), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM)

    fixed = lambda r: pl.BlockSpec((r, LANE), lambda i, j: (0, i), memory_space=pltpu.VMEM)

    dxs_t, dus_t, dxl_t = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            mat_fwd(nx, nx),  # A^T
            mat_fwd(nu, nx),  # B^T
            vec_fwd(nx),  # c
            mat_fwd(nx, nu),  # K^T
            vec_fwd(nu),  # k
            fixed(nx),  # dx0
        ],
        out_specs=[vec_fwd(nx), vec_fwd(nu), fixed(nx)],
        out_shape=[
            jax.ShapeDtypeStruct((N, nx, Bp), dt),
            jax.ShapeDtypeStruct((N, nu, Bp), dt),
            jax.ShapeDtypeStruct((nx, Bp), dt),
        ],
        scratch_shapes=[pltpu.VMEM((nx, LANE), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(AT_t, BT_t, lanes["c"], KT_t, k_t, dx0_t)

    K = jnp.moveaxis(K_t[..., :Bb], -1, 0)  # (B, N, nu, nx)
    kk = jnp.moveaxis(k_t[..., :Bb], -1, 0)
    dxs = jnp.moveaxis(dxs_t[..., :Bb], -1, 0)  # (B, N, nx)
    dus = jnp.moveaxis(dus_t[..., :Bb], -1, 0)
    dx_all = jnp.concatenate([dxs, jnp.moveaxis(dxl_t[:, :Bb], -1, 0)[:, None]], axis=1)
    return K, kk, dx_all, dus
