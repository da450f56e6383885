"""On-device physics backend (sim/jax_physics.py) + batched closed loop
(sim/batch_loop.py) — the MJX-role layer (SURVEY §7.1 layer 8, VERDICT r1
item #2).  Behavioral validation: ballistic motion, static force balance,
drop-settle, and the full MPC->WBC->physics cascade holding stance balance
for a randomized batch in ONE jitted program."""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def h1():
    from bipedal_control_tpu.interface import make_interface_for

    return make_interface_for("h1")


def _roll(model, info, cfg, st, n, q_des, kp, kd):
    import bipedal_control_tpu.sim.jax_physics as JP

    @partial(jax.jit, static_argnums=(1,))
    def run(st, n):
        def body(s, _):
            tau = JP.hybrid_pd_torque_explicit(q_des, 0.0, kp, kd, 0.0, s.q[6:])
            s2, f = JP.sim_step(model, info, cfg, s, tau, joint_damping=kd)
            return s2, jnp.array([s2.q[2], jnp.abs(s2.q[4]) + jnp.abs(s2.q[5]), jnp.sum(f[:, 2])])
        return jax.lax.scan(body, st, None, length=n)

    return run(st, n)


def test_free_fall_ballistic(h1):
    """No contact, no torque: the base integrates exactly ballistically."""
    import bipedal_control_tpu.sim.jax_physics as JP

    model, info = h1.model, h1.info
    cfg = JP.JaxSimConfig()
    st = JP.initial_sim_state(model, info, jnp.asarray(h1.initial_state))
    st = st._replace(q=st.q.at[2].set(2.0))
    T = 0.3
    st2, _ = _roll(model, info, cfg, st, int(T / cfg.dt),
                   jnp.asarray(h1.initial_state[12:]), 0.0, 0.0)
    dz = float(st2.q[2]) - 2.0
    # semi-implicit Euler: dz = -g dt^2 n(n+1)/2
    n = int(T / cfg.dt)
    expected = -9.81 * cfg.dt**2 * n * (n + 1) / 2
    assert abs(dz - expected) < 1e-6, (dz, expected)
    assert float(jnp.abs(st2.v[3:6]).max()) < 1e-10  # no phantom rotation


def test_statue_static_force_balance(h1):
    """Stiff PD hold: the robot stands; total normal force == weight."""
    import bipedal_control_tpu.sim.jax_physics as JP

    model, info = h1.model, h1.info
    cfg = JP.JaxSimConfig(torque_limit=500.0)
    x0 = jnp.asarray(h1.initial_state)
    st = JP.initial_sim_state(model, info, x0)
    st = st._replace(q=st.q.at[2].add(0.01))  # drop in from 1 cm
    st2, tr = _roll(model, info, cfg, st, 3000, x0[12:], 3000.0, 100.0)
    tr = np.asarray(tr)
    weight = float(info.robot_mass) * 9.81
    assert tr[-1, 0] > 0.9, tr[-1]  # standing height held
    assert tr[-1, 1] < 0.1, tr[-1]  # upright
    assert abs(tr[-1, 2] - weight) < 0.02 * weight, (tr[-1, 2], weight)
    # settled: velocity transients decayed
    assert float(jnp.abs(st2.v).max()) < 0.15


def test_sticking_feet_do_not_creep(h1):
    """The anchored tangential model gives true stiction: after the initial
    elastic settle (the anchor spring deflects a few mm under the standing
    leg-spread forces — compliance, not slip), the feet stop moving.  A
    viscous-only tangential model creeps without bound instead."""
    import bipedal_control_tpu.sim.jax_physics as JP
    from bipedal_control_tpu.model.kinematics import forward_kinematics

    model, info = h1.model, h1.info
    cfg = JP.JaxSimConfig(torque_limit=500.0)
    x0 = jnp.asarray(h1.initial_state)
    st = JP.initial_sim_state(model, info, x0)
    pts0 = np.asarray(JP._contact_points(model, info, forward_kinematics(model, st.q)))
    st1, _ = _roll(model, info, cfg, st, 3000, x0[12:], 3000.0, 100.0)
    pts1 = np.asarray(JP._contact_points(model, info, forward_kinematics(model, st1.q)))
    st2, _ = _roll(model, info, cfg, st1, 1500, x0[12:], 3000.0, 100.0)
    pts2 = np.asarray(JP._contact_points(model, info, forward_kinematics(model, st2.q)))
    # bounded elastic deflection from the start...
    assert np.abs(pts2[:, :2] - pts0[:, :2]).max() < 8e-3, pts2 - pts0
    # ...and motion has died out after the 3 s settle (measured: 1.5e-4 over
    # this window, still decaying; viscous-only friction never stops)
    assert np.abs(pts2[:, :2] - pts1[:, :2]).max() < 3e-4, pts2 - pts1


def test_batched_cascade_stance(h1):
    """Full MPC -> policy -> WBC -> PD -> physics cascade, batched and
    domain-randomized, one jitted program: every scenario stays upright."""
    from bipedal_control_tpu.sim.batch_loop import (
        BatchLoopConfig,
        make_batched_closed_loop,
        randomized_initial_states,
    )

    iface = dataclasses.replace(
        h1, settings=dataclasses.replace(h1.settings, dt=0.05, sqp_iterations=1)
    )
    cfg = BatchLoopConfig(duration=0.4)
    run = make_batched_closed_loop(iface, cfg)
    X = randomized_initial_states(iface, 4, seed=0)
    res = run(X)
    z_min = np.asarray(res.base_z_min)
    tilt = np.asarray(res.tilt_max)
    assert np.all(np.isfinite(z_min)), z_min
    assert np.all(z_min > 0.80), z_min
    assert np.all(tilt < 0.35), tilt
    assert np.all(np.isfinite(np.asarray(res.defect_last)))
