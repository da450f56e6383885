"""Safety checker (bipedal_controllers SafetyChecker.h:23-52): stop when the
base tilts beyond +-pi/3 in roll or pitch."""
from __future__ import annotations

import jax.numpy as jnp

TILT_LIMIT = jnp.pi / 3


def check_orientation(rbd_state, limit: float = float(TILT_LIMIT)):
    """rbdState leads with [yaw, pitch, roll]; returns True when safe."""
    pitch, roll = rbd_state[1], rbd_state[2]
    return jnp.logical_and(jnp.abs(pitch) < limit, jnp.abs(roll) < limit)
