"""Pallas TPU kernel: whole-horizon merit (line-search) evaluation.

The SQP filter line search evaluates the nonlinear performance of every step
candidate: per node one RK2 flow rollout (two FK/CMM/inv6 passes) plus the
masked equality residual (ocp/linearize.py::node_eval).  Under the
(alphas x nodes x scenarios) vmap that is ~34k tiny model evaluations per
solve whose 3- and 22-wide operands leave the VPU lanes ~95% idle — profiled
at ~10 ms per candidate at batch 256, i.e. the same order as the whole
linearization.

This kernel evaluates node_eval with the fused (alpha x node x scenario)
instance axis on the 128-wide lane dimension, using the trace-time-unrolled
lane circuits of ops/pallas_linearize.py (FK, velocity fields, CMM via
subtree aggregates, closed-form 6x6 momentum-block inverse, contact
Jacobians).  Only the FK-dependent outputs leave the kernel — the four merit
reductions (l1/squared defect, l1/squared masked equality residual) per
instance; the quadratic tracking cost + cone barrier have no FK dependence
and stay outside as one big MXU matmul over the flattened candidates
(solver/sqp.py::_candidate_costs).

Reference semantics: OCS2 FilterLinesearch performance evaluation
(task.info sqp g_min/g_max); constraint layout per ocp/problem.py.
Validated against node_eval in f64 (tests/test_pallas_merit.py) and used by
settings.merit = "pallas" (the TPU production path; CPU keeps XLA).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_linearize as PL

LANE = 128
_GRAVITY_Z = -9.81


# ----------------------------------------------------------------- circuit
def _split_state(sm: PL.StaticModel, x):
    """x: (nx, L) -> (p_b triple, theta-zyx triple, q_j (nj, L))."""
    p_b = tuple(x[6 + i : 7 + i] for i in range(3))
    theta = tuple(x[9 + i : 10 + i] for i in range(3))
    q_j = x[12 : 12 + sm.nj]
    return p_b, theta, q_j


def flow_lanes(sm: PL.StaticModel, tb: PL.Tables, m_total: float, x, u):
    """Centroidal flow value in lane layout (linearize._flow_from_terms).

    x: (nx, L), u: (nu, L).  Returns (f (nx, L), fl, p_ee, v_stack)."""
    p_b, theta, q_j = _split_state(sm, x)
    kin = PL.fk_lanes(sm, p_b, theta, q_j)
    fl = PL.fields_lanes(sm, kin, p_b, tb)
    cm = PL.cmm_lanes(sm, kin, fl, tb)
    p_ee = PL.contact_positions_lanes(sm, kin)
    h6 = [m_total * x[r : r + 1] for r in range(6)]
    v_j = u[12 : 12 + sm.nj]
    v_stack, _, v_b = PL.generalized_velocity_lanes(sm, cm, h6, v_j)

    forces = [tuple(u[3 * i + c : 3 * i + c + 1] for c in range(3)) for i in range(4)]
    inv_m = 1.0 / m_total
    f_sum = forces[0]
    for i in range(1, 4):
        f_sum = PL.t_add(f_sum, forces[i])
    hdot_lin = (f_sum[0] * inv_m, f_sum[1] * inv_m, f_sum[2] * inv_m + _GRAVITY_Z)
    ang = (jnp.zeros_like(x[0:1]),) * 3
    for i in range(4):
        ang = PL.t_add(ang, PL.t_cross(PL.t_sub(p_ee[i], cm.com), forces[i]))
    hdot_ang = PL.t_scale(inv_m, ang)
    f = jnp.concatenate(list(hdot_lin) + list(hdot_ang) + v_b + [v_j], axis=0)
    return f, fl, p_ee, v_stack


def node_eval_lanes(
    sm: PL.StaticModel,
    tb: PL.Tables,
    m_total: float,
    gain: float,
    integrator: str,
    x,
    u,
    x_next,
    flags,
    vref,
    pref,
    dt,
):
    """(defect (nx, L), masked eq (16, L)) — node_eval minus the cost term.

    All inputs lane-stacked: x/x_next (nx, L), u (nu, L), flags/vref/pref
    (4, L), dt (1, L)."""
    f0, fl0, p_ee0, v0 = flow_lanes(sm, tb, m_total, x, u)
    if integrator == "euler":
        F = x + dt * f0
    elif integrator == "rk2":
        x1 = x + (0.5 * dt) * f0
        f1, _, _, _ = flow_lanes(sm, tb, m_total, x1, u)
        F = x + dt * f1
    else:
        raise NotImplementedError(f"merit kernel integrator {integrator}")
    defect = F - x_next

    # equality residual from the pass-0 terms (ocp/problem.py layout:
    # 12 complementary zero-vel/zero-force rows + 4 swing normal-vel rows)
    J = PL.contact_jacobians_lanes(sm, fl0, p_ee0, tb)
    pc_rows, nvel_rows = [], []
    for i in range(4):
        fi = flags[i : i + 1]
        swing = 1.0 - fi
        v_ee = tuple(jnp.sum(J[i][c] * v0, axis=0, keepdims=True) for c in range(3))
        pz = p_ee0[i][2]
        for c in range(3):
            zv = v_ee[c] + gain * pz if (c == 2 and gain != 0.0) else v_ee[c]
            pc_rows.append(fi * zv + swing * u[3 * i + c : 3 * i + c + 1])
        nv = v_ee[2] - vref[i : i + 1]
        if gain != 0.0:
            nv = nv + gain * (pz - pref[i : i + 1])
        nvel_rows.append(swing * nv)
    eq = jnp.concatenate(pc_rows + nvel_rows, axis=0)
    return defect, eq


# ------------------------------------------------------------------ kernel
def _merit_kernel(sm, m_total, gain, integrator, nx, nu, data_ref, tables_ref, out_ref):
    d = data_ref[0]  # (R, LANE)
    tb = PL.tables_from_array(sm, tables_ref[...])
    x = d[0:nx]
    u = d[nx : nx + nu]
    xn = d[nx + nu : 2 * nx + nu]
    b = 2 * nx + nu
    flags = d[b : b + 4]
    vref = d[b + 4 : b + 8]
    pref = d[b + 8 : b + 12]
    dt = d[b + 12 : b + 13]
    defect, eq = node_eval_lanes(
        sm, tb, m_total, gain, integrator, x, u, xn, flags, vref, pref, dt
    )
    out_ref[0] = jnp.concatenate(
        [
            jnp.sum(jnp.abs(defect), axis=0, keepdims=True),
            jnp.sum(defect * defect, axis=0, keepdims=True),
            jnp.sum(jnp.abs(eq), axis=0, keepdims=True),
            jnp.sum(eq * eq, axis=0, keepdims=True),
        ],
        axis=0,
    )


_static_cache: dict = {}


def _model_fingerprint(model) -> str:
    """Hash of the model's numeric parameter arrays (concrete leaves only):
    two same-named/same-topology models with different numerics (payload or
    parameter-perturbed variants) must not share cached tables."""
    import hashlib

    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(model):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def _get_static(model, info):
    """StaticModel + tables for a concrete model, cached by topology + a
    numeric-parameter fingerprint.  The numpy extraction must run on CONCRETE
    arrays: under jit, a closure-captured RobotModel pytree is rebuilt with
    tracer leaves, so interface construction warms this cache eagerly
    (interface.py).  Traced calls resolve against the warmed cache by
    topology; they fail loudly when the cache is cold or ambiguous instead of
    surfacing a numpy-on-tracer error (or silently reusing wrong tables)."""
    topo = (model.name, model.nj, tuple(int(f) for f in info.contact_frame_ids))
    if any(isinstance(leaf, jax.core.Tracer) for leaf in jax.tree_util.tree_leaves(model)):
        hits = [v for k, v in _static_cache.items() if k[0] == topo]
        if len(hits) == 1:
            return hits[0]
        if not hits:
            raise RuntimeError(
                "merit='pallas' requires the static-model cache to be warmed on "
                f"concrete model arrays before tracing (robot {model.name!r}). "
                "Build the model through RobotInterface (interface.py warms the "
                "cache) or call merit_sums_flat once outside jit."
            )
        raise RuntimeError(
            f"merit='pallas': {len(hits)} distinct models named {model.name!r} "
            "with the same topology were warmed; a traced call cannot tell them "
            "apart. Give parameter-perturbed variants distinct model names."
        )
    key = (topo, _model_fingerprint(model))
    if key not in _static_cache:
        sm = PL.make_static_model(model, info.contact_frame_ids)
        _static_cache[key] = (sm, PL.tables_np(sm))
    return _static_cache[key]


def merit_sums_flat(model, info, settings, xs, us, xns, flags, vref, pref, dt):
    """Per-instance merit reductions over a flat instance axis.

    xs/xns: (M, nx), us: (M, nu), flags/vref/pref: (M, 4), dt: (M,).
    Returns (M, 4): [sum|defect|, sum defect^2, sum|eq|, sum eq^2].
    """
    if info.model_type != 0:
        raise NotImplementedError("merit kernel supports FullCentroidalDynamics only")
    sm, tables = _get_static(model, info)
    return _merit_sums_flat_static(
        sm,
        tables,
        info.state_dim,
        info.input_dim,
        float(info.robot_mass),
        float(settings.position_error_gain),
        settings.integrator,
        xs,
        us,
        xns,
        flags,
        vref,
        pref,
        dt,
    )


def _merit_sums_flat_static(
    sm, tables, nx, nu, robot_mass, gain, integrator, xs, us, xns, flags, vref, pref, dt
):
    """Same as merit_sums_flat but over pre-extracted static model data
    (numpy/python only — safe to close over under custom_vmap's closure
    conversion, which would turn jnp model arrays into tracers)."""
    dtype = xs.dtype
    data = jnp.concatenate(
        [xs, us, xns, flags, vref, pref, dt[:, None]], axis=1
    )  # (M, R)
    M, R = data.shape
    T = max(1, math.ceil(M / LANE))
    pad = T * LANE - M
    if pad:
        data = jnp.concatenate([data, jnp.zeros((pad, R), dtype)], axis=0)
    data_t = data.T.reshape(R, T, LANE).transpose(1, 0, 2)  # (T, R, LANE)
    nt, nv = tables.shape
    tables_l = jnp.broadcast_to(
        jnp.asarray(tables, dtype)[:, :, None], (nt, nv, LANE)
    )

    plat = jax.local_devices()[0].platform.lower()
    interpret = plat not in ("tpu", "axon")
    kernel = lambda d, t, o: _merit_kernel(
        sm, robot_mass, gain, integrator, nx, nu, d, t, o
    )
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, nv, LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, 4, LANE), dtype),
        interpret=interpret,
    )(data_t, tables_l)
    return out.transpose(0, 2, 1).reshape(T * LANE, 4)[:M]


def make_merit_sums(model, info, settings):
    """Batch-shape-polymorphic merit evaluator: all array args share leading
    dims (...), the kernel fuses them onto the lane axis.  Wrapped in
    custom_vmap so the scenario vmap of the batched solver feeds ONE kernel
    (mirrors solver/riccati.py::solve_lqr_pallas)."""

    if info.model_type != 0:
        raise NotImplementedError("merit kernel supports FullCentroidalDynamics only")
    # extract static model data OUTSIDE the custom_vmap trace: closure
    # conversion would otherwise lift the model's jnp arrays into tracers
    sm, tables = _get_static(model, info)
    nx, nu = info.state_dim, info.input_dim
    robot_mass = float(info.robot_mass)
    gain = float(settings.position_error_gain)
    integrator = settings.integrator

    def impl(xs, us, xns, flags, vref, pref, dt):
        lead = xs.shape[:-1]
        flat = lambda a: a.reshape((-1,) + a.shape[len(lead) :])
        out = _merit_sums_flat_static(
            sm,
            tables,
            nx,
            nu,
            robot_mass,
            gain,
            integrator,
            flat(xs),
            flat(us),
            flat(xns),
            flat(flags),
            flat(vref),
            flat(pref),
            dt.reshape(-1),
        )
        return out.reshape(lead + (4,))

    @jax.custom_batching.custom_vmap
    def merit(xs, us, xns, flags, vref, pref, dt):
        return impl(xs, us, xns, flags, vref, pref, dt)

    @merit.def_vmap
    def _merit_vmap(axis_size, in_batched, xs, us, xns, flags, vref, pref, dt):
        args = [xs, us, xns, flags, vref, pref, dt]
        out_args = []
        for a, b in zip(args, in_batched):
            out_args.append(
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
        return impl(*out_args), True

    return merit
