"""OpenLoong full-cascade closed loop in MuJoCo physics (VERDICT r1 item #4).

The reference ships a ready MJCF scene for OpenLoong
(openloong_description/mjcf/scene.xml) that round 1 never registered; this
closes the MPC -> policy -> WBC -> hybrid-PD loop on it in real physics.
Bringup mirrors the reference procedure (restart scripts + initial-pose
controller): hold the default pose under joint PD while the robot settles
onto the ground, then hand over to the full controller.
"""
import os

import numpy as np
import pytest

from conftest import REFERENCE_ASSETS

MJCF = os.path.join(
    REFERENCE_ASSETS, "bipedal_robot_example/openloong_description/mjcf/scene.xml"
)
pytestmark = pytest.mark.skipif(not os.path.exists(MJCF), reason="OpenLoong MJCF unavailable")


def test_openloong_stance_balance():
    pytest.importorskip("mujoco")
    from bipedal_control_tpu.interface import make_interface_for
    from bipedal_control_tpu.runtime.controller import BipedalController, JointCommand
    from bipedal_control_tpu.sim.mujoco_backend import MujocoSimBackend, MujocoSimConfig

    iface = make_interface_for("openloong")
    sim = MujocoSimBackend(MJCF, list(iface.task.joint_names), MujocoSimConfig())
    x0 = iface.initial_state
    nj = iface.info.nj
    upper = {}
    if iface.task.upper_joint_names and iface.task.default_upper_joint_state is not None:
        upper = dict(zip(iface.task.upper_joint_names, iface.task.default_upper_joint_state))
    sim.reset(
        base_pos=x0[6:9],
        base_quat_wxyz=np.array([1.0, 0, 0, 0]),
        joint_pos=x0[12:],
        upper_joint_targets=upper,
    )
    # initial-pose hold (InitialJointPositionController semantics) while the
    # robot settles onto the ground from the config-file pose
    hold = JointCommand(
        pos_des=np.asarray(x0[12:]),
        vel_des=np.zeros(nj),
        kp=np.full(nj, 300.0),
        kd=np.full(nj, 10.0),
        tau_ff=np.zeros(nj),
    )
    sim.apply_command(hold)
    sim.step(int(0.5 / sim.timestep))
    settle_z = sim.ground_truth()[0][2]
    assert settle_z > 0.9, f"settle failed at z={settle_z}"

    ctrl = BipedalController(iface)
    ctrl.starting(sim.time, sim.rbd_state())
    control_dt = 1.0 / 500.0
    substeps = max(1, int(round(control_dt / sim.timestep)))
    for _ in range(int(1.5 / control_dt)):
        rbd = sim.rbd_state(last_yaw=ctrl.last_yaw)
        cmd = ctrl.update(sim.time, rbd)
        assert np.all(np.isfinite(cmd.tau_ff))
        sim.apply_command(cmd)
        sim.step(substeps)
        if not ctrl.safe:
            break
    pos = sim.ground_truth()[0]
    assert ctrl.safe, f"safety stop, base at {pos}"
    assert pos[2] > settle_z - 0.1, pos
    assert abs(pos[0] - x0[6]) < 0.3 and abs(pos[1] - x0[7]) < 0.3, pos
