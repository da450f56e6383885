"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Multi-chip sharding paths are validated on this virtual mesh (the driver
separately dry-runs them via __graft_entry__.dryrun_multichip); numeric
golden tests want float64.
"""
import os

_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (_xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS from the environment; force
# the CPU backend through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ASSETS = os.environ.get("BIPEDAL_REFERENCE_ASSETS", "/root/reference")
H1_URDF = os.path.join(
    REFERENCE_ASSETS,
    "bipedal_robot_example/unitree_h1/h1_description/urdf/h1_with_sole.urdf",
)

H1_LEG_JOINTS = [
    "left_hip_yaw_joint",
    "left_hip_roll_joint",
    "left_hip_pitch_joint",
    "left_knee_joint",
    "left_ankle_joint",
    "right_hip_yaw_joint",
    "right_hip_roll_joint",
    "right_hip_pitch_joint",
    "right_knee_joint",
    "right_ankle_joint",
]
H1_CONTACTS = ["left_sole_1_link", "left_sole_2_link", "right_sole_1_link", "right_sole_2_link"]


def _require_h1():
    if not os.path.exists(H1_URDF):
        pytest.skip("H1 reference assets not available (set BIPEDAL_REFERENCE_ASSETS)")


@pytest.fixture(scope="session")
def h1_model():
    """Reduced H1 model (10 leg joints, upper body welded at zero)."""
    _require_h1()
    from bipedal_control_tpu.model import from_description, load_urdf

    desc = load_urdf(H1_URDF, H1_LEG_JOINTS)
    return from_description(desc)


@pytest.fixture(scope="session")
def h1_info(h1_model):
    from bipedal_control_tpu.model import make_info

    return make_info(h1_model, H1_CONTACTS)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
