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
