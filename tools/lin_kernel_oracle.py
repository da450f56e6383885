import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from bipedal_control_tpu.interface import make_interface_for
from bipedal_control_tpu.solver.sqp import build_refs, initial_trajectory
from bipedal_control_tpu.ocp.linearize import linearize_node_structured
from bipedal_control_tpu.ops import pallas_linearize as PL
from bipedal_control_tpu.ops.pallas_linearize_kernel import linearize_node_lanes, _out_rows
from bipedal_control_tpu.ops.pallas_merit import _get_static

iface = make_interface_for("h1")
settings = iface.settings
info = iface.info
rm = iface.make_reference_manager()
rm.set_gait(iface.task.gait_library["trot"], start_time=0.1)
frozen = rm.freeze(0.0)
t_nodes = jnp.asarray(frozen.t_nodes)
refs = build_refs(info, frozen.gait, frozen.swing, frozen.target, t_nodes)
x0 = jnp.asarray(iface.initial_state)
N1 = settings.num_intervals + 1
xs, us = initial_trajectory(info, refs, x0, N1)
rng = np.random.default_rng(0)
xs = xs + jnp.asarray(rng.normal(scale=0.05, size=xs.shape))
us = us + jnp.asarray(rng.normal(scale=5.0, size=us.shape))

sm, tables = _get_static(iface.model, info)
nx, nu = info.state_dim, info.input_dim
L = 8  # pick 8 nodes spanning different contact modes
idx = [0, 3, 7, 12, 20, 33, 45, 60]

# lane-pack the inputs: (dim, L)
pack = lambda a: jnp.asarray(np.asarray(a)[idx].T)
x_l = pack(xs[:-1]); u_l = pack(us); xn_l = pack(xs[1:])
flags_l = pack(refs.contact_flags); vref_l = pack(refs.swing_vref); pref_l = pack(refs.swing_pref)
dt_l = jnp.asarray(np.asarray(refs.dt)[idx][None, :])
nt, nv = tables.shape
tb = PL.tables_from_array(sm, jnp.broadcast_to(jnp.asarray(tables, x_l.dtype)[:, :, None], (nt, nv, L)))

t0 = time.time()
rows = jax.jit(lambda *a: jnp.concatenate(linearize_node_lanes(
    sm, tb, float(info.robot_mass), float(settings.position_error_gain),
    settings.integrator, nx, nu, *a), axis=0))(x_l, u_l, xn_l, flags_l, vref_l, pref_l, dt_l)
rows = np.asarray(rows)
print("circuit done", time.time() - t0, rows.shape, flush=True)

# oracle per node
o = 0
def take(n, shape):
    global o
    b = rows[o:o+n].T.reshape((L,) + shape)
    o += n
    return b
A = take(nx*nx, (nx, nx)); B = take(nx*nu, (nx, nu)); c = take(nx, (nx,))
C = take(16*nx, (16, nx)); D = take(16*nu, (16, nu)); e = take(16, (16,))

import dataclasses
for k, i in enumerate(idx):
    node = linearize_node_structured(iface.model, info, settings, iface.Q, iface.R,
                                     xs[i], us[i], xs[i+1], jax.tree.map(lambda a: a[i], refs))
    for name, got in [("A",A[k]),("B",B[k]),("c",c[k]),("C",C[k]),("D",D[k]),("e",e[k])]:
        ref_v = np.asarray(getattr(node, name))
        err = np.max(np.abs(got - ref_v))
        scale = max(1.0, np.max(np.abs(ref_v)))
        if err / scale > 1e-9:
            print(f"node {i} {name}: maxabs={err:.3e} relscale={err/scale:.3e}")
            bad = np.unravel_index(np.argmax(np.abs(got - ref_v)), ref_v.shape)
            print("   at", bad, "got", got[bad], "ref", ref_v[bad])
print("done")
