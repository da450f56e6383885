"""Hunter MuJoCo scene generation (sim/urdf_mjcf.py).

The reference ships no MJCF for Hunter (its de-facto support stops at the
SQP planner launch); the runtime URDF->MJCF builder gives it a physics
backend: floating base, ground, torque motors at the URDF effort limits,
IMU sensors.  Closed-loop *stance* on this robot is an open item — Hunter
has line feet (toe/heel on the x axis, no ankle roll), so static balance
is marginal by construction and needs a stepping-based controller; the
generated scene + backend plumbing is what this locks in.
"""
import os

import numpy as np
import pytest

from conftest import REFERENCE_ASSETS

URDF = os.path.join(
    REFERENCE_ASSETS, "bipedal_robot_example/hunter/legged_hunter_description/urdf/hunter.urdf"
)
pytestmark = pytest.mark.skipif(not os.path.exists(URDF), reason="hunter URDF unavailable")


def test_hunter_scene_builds_and_steps(tmp_path):
    pytest.importorskip("mujoco")
    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.runtime.controller import JointCommand
    from bipedal_control_tpu.sim.mujoco_backend import MujocoSimBackend, MujocoSimConfig
    from bipedal_control_tpu.sim.urdf_mjcf import build_mjcf_scene_from_urdf

    iface = make_interface_for("hunter")
    scene = build_mjcf_scene_from_urdf(
        URDF, list(iface.task.joint_names), out_path=str(tmp_path / "hunter_scene.xml")
    )
    sim = MujocoSimBackend(scene, list(iface.task.joint_names), MujocoSimConfig())
    assert sim.model.nu == iface.info.nj  # one torque motor per leg joint
    assert sim.model.nq == 7 + iface.info.nj  # freejoint + joints

    x0 = iface.initial_state
    sim.reset(base_pos=x0[6:9], base_quat_wxyz=np.array([1.0, 0, 0, 0]), joint_pos=x0[12:])
    imu = sim.imu()
    assert set(imu) == {"imu_quat", "imu_gyro", "imu_acc"}
    rbd = sim.rbd_state()
    assert rbd.shape == (2 * (6 + iface.info.nj),)
    # PD hold keeps it from collapsing over a short window (actuators wired)
    nj = iface.info.nj
    hold = JointCommand(
        pos_des=np.asarray(x0[12:]), vel_des=np.zeros(nj),
        kp=np.full(nj, 120.0), kd=np.full(nj, 4.0), tau_ff=np.zeros(nj),
    )
    sim.apply_command(hold)
    sim.step(300)  # 0.3 s
    z = sim.ground_truth()[0][2]
    assert z > 0.4, z  # held up by the motors (passive collapse hits ~0.3)
    # measured contact flags read the generated foot spheres
    flags = sim.contact_flags_by_side("leg_l5_link", "leg_r5_link")
    assert flags.shape == (4,) and flags.max() == 1.0


def test_hunter_closed_loop_marginal_stance_safety(tmp_path):
    """Hunter through the FULL controller cascade in physics (first closed
    loop on this robot — the reference never ran Hunter either).  Measured
    (2026-08-21 sweeps; tools in git history): model CoM == MuJoCo CoM to
    1e-4, the MPC solves cleanly (defect 4e-4), but the 9 cm line feet
    leave static stance marginal — a pure PD hold settles heel-pitched
    (-0.16 rad) and the closed loop tips within ~1-2 s under every tested
    bringup (drop-in, PD settle-then-handover, kp up to 150, stepping at
    0.15-0.2 s cadences).  Lateral capture stepping (captureStepping in
    overrides.info, wired 2026-08-21) does not rescue it either: the
    collapse is SAGITTAL/vertical (base z 0.64 -> 0.29 within 0.6 s of a
    standing_trot bringup, before lateral drift appears) — the 23.7 N m
    uniform actuator limit leaves no knee authority for recovery, so the
    next lever is a crouch-height/torque-budget redesign, not foot
    placement.  This test pins what MUST work today: the
    cascade runs on Hunter, commands stay finite, and when the robot tips
    the safety stop engages and commands damping-only."""
    pytest.importorskip("mujoco")
    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.runtime.controller import BipedalController
    from bipedal_control_tpu.sim.mujoco_backend import MujocoSimBackend, MujocoSimConfig
    from bipedal_control_tpu.sim.urdf_mjcf import build_mjcf_scene_from_urdf

    iface = make_interface_for("hunter")
    scene = build_mjcf_scene_from_urdf(
        URDF, list(iface.task.joint_names), out_path=str(tmp_path / "hunter_scene.xml")
    )
    sim = MujocoSimBackend(scene, list(iface.task.joint_names), MujocoSimConfig())
    x0 = iface.initial_state
    sim.reset(
        base_pos=x0[6:9] + np.array([0.0, 0.0, 0.006]),
        base_quat_wxyz=np.array([1.0, 0, 0, 0]),
        joint_pos=x0[12:],
    )
    ctrl = BipedalController(iface)
    ctrl.starting(sim.time, sim.rbd_state())
    control_dt = 1.0 / 500.0
    substeps = max(1, int(round(control_dt / sim.timestep)))
    ticks_ok = 0
    for _ in range(int(3.0 / control_dt)):
        rbd = sim.rbd_state(last_yaw=ctrl.last_yaw)
        cmd = ctrl.update(sim.time, rbd)
        assert np.all(np.isfinite(cmd.tau_ff))
        if ctrl.safe:
            ticks_ok += 1
        else:
            # safety stop: damping-only command (zero stiffness/feedforward)
            assert np.all(cmd.tau_ff == 0.0) and np.all(cmd.kp == 0.0)
            assert np.all(cmd.kd > 0.0)
            break
        sim.apply_command(cmd)
        sim.step(substeps)
    # the loop genuinely ran before any stop (>= 0.3 s of control)
    assert ticks_ok >= int(0.3 / control_dt), ticks_ok
