"""CI oracle for the whole-node Pallas linearization kernel.

The production TPU path (`ops/pallas_linearize_kernel.py`, enabled with
``settings.linearize = "pallas"``) is the single most perf-critical circuit in
the repo; a jax/Mosaic toolchain update silently broke it once (round 3:
zero-size vectors, scatter-add lowering) and only the on-chip bench caught it.
This test makes the kernel's *math* falsifiable on CPU in CI:

- a hand-built 4-joint biped (revolute + prismatic joints, skewed axes,
  non-identity joint/frame offsets, off-diagonal inertias) keeps the
  trace-unrolled circuit small enough that XLA CPU compiles it in seconds
  rather than the ~15 min the full H1 circuit needs
  (tools/lin_kernel_oracle.py remains the full-size manual check);
- every node output (A, B, c, C, D, e and the wrapper's cost quadratics) is
  compared in f64 against the analytic structured path
  (`ocp/linearize.py::linearize_node_structured`) to 1e-9 relative;
- contact-flag patterns cover full stance, full flight, and both mixed modes,
  so the masked constraint rows, the zrow(0)-filtering and the slice-concat
  diagonal adds (the round-3 Mosaic rewrite sites) are all load-bearing;
- both integrators (euler and same-point rk2) and both entry points (the bare
  lane circuit and the padded/packed ``pallas_call`` wrapper in interpret
  mode, via ``make_node_linearizer``) are exercised.

Reference role: CppAD codegen-vs-runtime parity,
BipedalRobotDynamicsAD.cpp:38-56.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipedal_control_tpu.model.urdf import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotDescription,
)
from bipedal_control_tpu.model.robot_model import from_description
from bipedal_control_tpu.model.centroidal import make_info
from bipedal_control_tpu.ocp.problem import NodeRefs, OcpSettings
from bipedal_control_tpu.ocp.linearize import linearize_node_structured
from bipedal_control_tpu.ops import pallas_linearize as PL
from bipedal_control_tpu.ops.pallas_linearize_kernel import (
    linearize_node_lanes,
    make_node_linearizer,
)
from bipedal_control_tpu.ops.pallas_merit import _get_static


def _rot(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def tiny_biped():
    """4-joint biped: left leg = skew hip revolute + revolute knee; right leg
    = revolute hip + PRISMATIC shank (covers both joint-type branches of the
    lane FK/field circuits).  Toe/heel contact frames sit on the shank bodies
    with non-identity frame rotations."""
    nj = 4
    axes = np.array(
        [
            [0.1, 0.99, 0.0],  # left hip: slightly skewed pitch axis
            [0.0, 1.0, 0.05],  # left knee
            [0.0, 1.0, 0.0],  # right hip
            [0.05, 0.0, 1.0],  # right prismatic shank (extension)
        ]
    )
    axes = axes / np.linalg.norm(axes, axis=1, keepdims=True)
    off_R = np.stack(
        [
            _rot([0, 0, 1], 0.1),
            _rot([1, 0, 0], -0.15),
            _rot([0, 1, 0], 0.07),
            _rot([1, 1, 0], 0.12),
        ]
    )
    off_p = np.array(
        [
            [0.01, 0.11, -0.12],
            [0.02, 0.01, -0.31],
            [0.01, -0.11, -0.12],
            [-0.015, 0.005, -0.29],
        ]
    )
    mass = np.array([9.0, 1.6, 0.9, 1.5, 0.7])
    com = np.array(
        [
            [0.01, 0.0, 0.15],
            [0.0, 0.02, -0.14],
            [0.01, -0.005, -0.17],
            [0.0, -0.02, -0.15],
            [-0.01, 0.005, -0.16],
        ]
    )
    inertia = []
    for b in range(5):
        d = 0.02 + 0.01 * b
        I = np.diag([d, d * 1.2, d * 0.8])
        I[0, 1] = I[1, 0] = 0.002
        I[1, 2] = I[2, 1] = -0.001
        inertia.append(I)
    frame_R = np.stack(
        [
            _rot([0, 1, 0], 0.05),
            _rot([0, 1, 0], -0.05),
            _rot([1, 0, 0], 0.04),
            np.eye(3),
        ]
    )
    frame_p = np.array(
        [
            [0.09, 0.0, -0.33],
            [-0.06, 0.01, -0.33],
            [0.09, -0.01, -0.31],
            [-0.06, 0.0, -0.31],
        ]
    )
    desc = RobotDescription(
        name="tiny_biped_lin_oracle",
        joint_names=["l_hip", "l_knee", "r_hip", "r_shank"],
        joint_parent_body=np.array([0, 1, 0, 3]),
        joint_type=np.array(
            [JOINT_REVOLUTE, JOINT_REVOLUTE, JOINT_REVOLUTE, JOINT_PRISMATIC]
        ),
        joint_offset_R=off_R,
        joint_offset_p=off_p,
        joint_axis=axes,
        joint_limit_lower=-2 * np.ones(nj),
        joint_limit_upper=2 * np.ones(nj),
        joint_limit_effort=100 * np.ones(nj),
        joint_limit_velocity=20 * np.ones(nj),
        body_mass=mass,
        body_com=com,
        body_inertia=np.stack(inertia),
        frame_names=["lt", "lh", "rt", "rh"],
        frame_body=np.array([2, 2, 4, 4]),
        frame_R=frame_R,
        frame_p=frame_p,
    )
    model = from_description(desc)
    info = make_info(model, ["lt", "lh", "rt", "rh"])
    return model, info


# contact-flag patterns spanning stance / flight / both mixed modes; the
# fourth node stresses the swing rows (nonzero vref/pref) at a different dt
_FLAGS = np.array(
    [
        [1.0, 1.0, 1.0, 1.0],
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 1.0],
        [0.0, 1.0, 1.0, 0.0],
    ]
)


def _nodes(info, rng, n=4):
    nx, nu = info.state_dim, info.input_dim
    xs = rng.normal(scale=0.4, size=(n, nx))
    xs[:, 8] += 0.6  # base up
    us = rng.normal(scale=1.0, size=(n, nu))
    us[:, 2:12:3] += 30.0  # normal forces
    xns = xs + rng.normal(scale=0.05, size=(n, nx))
    dt = np.array([0.015, 0.02, 0.015, 0.035][:n])
    vref = rng.normal(scale=0.3, size=(n, 4))
    pref = rng.normal(scale=0.05, size=(n, 4))
    refs = NodeRefs(
        t=jnp.asarray(dt * 0),
        dt=jnp.asarray(dt),
        contact_flags=jnp.asarray(_FLAGS[:n]),
        swing_vref=jnp.asarray(vref),
        swing_pref=jnp.asarray(pref),
        x_nom=jnp.asarray(xs + rng.normal(scale=0.1, size=(n, nx))),
        u_nom=jnp.asarray(us + rng.normal(scale=0.5, size=(n, nu))),
    )
    return jnp.asarray(xs), jnp.asarray(us), jnp.asarray(xns), refs


def _structured(model, info, settings, Q, R, xs, us, xns, refs):
    out = []
    for i in range(xs.shape[0]):
        node = linearize_node_structured(
            model, info, settings, Q, R, xs[i], us[i], xns[i],
            jax.tree.map(lambda a: a[i], refs),
        )
        out.append(node)
    return out


def _check(name, got, ref, tol=1e-9):
    got = np.asarray(got, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    scale = max(1.0, float(np.max(np.abs(ref))))
    err = float(np.max(np.abs(got - ref))) / scale
    assert err < tol, f"{name}: rel err {err:.3e}"


@pytest.mark.parametrize("integrator", ["rk2", "euler"])
def test_lane_circuit_matches_structured(integrator):
    """Bare linearize_node_lanes circuit (the kernel body) vs the analytic
    structured linearization, all contact modes, f64, 1e-9."""
    model, info = tiny_biped()
    settings = OcpSettings(position_error_gain=0.35, integrator=integrator)
    nx, nu = info.state_dim, info.input_dim
    Q = jnp.asarray(np.diag(np.linspace(1.0, 3.0, nx)))
    R = jnp.asarray(np.diag(np.linspace(0.1, 0.5, nu)))
    rng = np.random.default_rng(3)
    xs, us, xns, refs = _nodes(info, rng)
    nodes = _structured(model, info, settings, Q, R, xs, us, xns, refs)

    sm, tables = _get_static(model, info)
    L = xs.shape[0]
    pack = lambda a: jnp.asarray(np.asarray(a).T)
    tb = PL.tables_from_array(
        sm, jnp.broadcast_to(jnp.asarray(tables)[:, :, None], tables.shape + (L,))
    )
    rows = jnp.concatenate(
        linearize_node_lanes(
            sm, tb, float(info.robot_mass), float(settings.position_error_gain),
            integrator, nx, nu, pack(xs), pack(us), pack(xns),
            pack(refs.contact_flags), pack(refs.swing_vref),
            pack(refs.swing_pref), jnp.asarray(np.asarray(refs.dt)[None, :]),
        ),
        axis=0,
    )
    rows = np.asarray(rows)
    o = 0

    def take(n, shape):
        nonlocal o
        block = rows[o : o + n].T.reshape((L,) + shape)
        o += n
        return block

    A = take(nx * nx, (nx, nx))
    B = take(nx * nu, (nx, nu))
    c = take(nx, (nx,))
    C = take(16 * nx, (16, nx))
    D = take(16 * nu, (16, nu))
    e = take(16, (16,))
    for k, node in enumerate(nodes):
        for name, got in [
            ("A", A[k]), ("B", B[k]), ("c", c[k]),
            ("C", C[k]), ("D", D[k]), ("e", e[k]),
        ]:
            _check(f"node{k}.{name}", got, getattr(node, name))


def test_pallas_wrapper_matches_structured():
    """The full production entry point — make_node_linearizer's pallas_call
    (interpret mode on CPU), including lane packing, padding to 128, the
    custom_vmap and the FK-free cost quadratics — vs structured, f64."""
    model, info = tiny_biped()
    settings = OcpSettings(
        position_error_gain=0.35, integrator="rk2", linearize="pallas"
    )
    nx, nu = info.state_dim, info.input_dim
    Q = jnp.asarray(np.diag(np.linspace(1.0, 3.0, nx)))
    R = jnp.asarray(np.diag(np.linspace(0.1, 0.5, nu)))
    rng = np.random.default_rng(4)
    xs, us, xns, refs = _nodes(info, rng)
    nodes = _structured(model, info, settings, Q, R, xs, us, xns, refs)

    linearize = make_node_linearizer(model, info, settings, Q, R)
    got = jax.jit(linearize)(xs, us, xns, refs)
    for k, node in enumerate(nodes):
        for name in ("A", "B", "c", "C", "D", "e", "Qxx", "Quu", "Qux", "qx", "qu", "cost"):
            _check(
                f"node{k}.{name}",
                jax.tree.map(lambda a: a[k], getattr(got, name)),
                getattr(node, name),
            )
