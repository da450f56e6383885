"""State estimation tests: cheater rbdState round-trip + contact LKF convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from bipedal_control_tpu.estim import (
    KalmanConfig,
    kalman_init,
    kalman_update,
    rbd_state_from_ground_truth,
)
from bipedal_control_tpu.model.centroidal import (
    centroidal_state_from_rbd,
    contact_positions,
    rbd_state_from_centroidal,
)
from bipedal_control_tpu.ocp.problem import weight_compensating_input
from bipedal_control_tpu.utils.rotations import rotmat_from_zyx


def test_cheater_rbd_roundtrip(h1_model, h1_info, rng):
    """centroidal -> rbd -> centroidal is the identity."""
    x = jnp.asarray(
        np.concatenate([rng.uniform(-0.3, 0.3, 6), rng.uniform(-0.5, 0.5, 6), rng.uniform(-0.5, 0.5, 10)])
    )
    u = jnp.asarray(rng.uniform(-20, 20, h1_info.input_dim))
    rbd = rbd_state_from_centroidal(h1_model, h1_info, x, u)
    x2 = centroidal_state_from_rbd(h1_model, h1_info, rbd)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)


def test_cheater_from_ground_truth(h1_model, h1_info, rng):
    from scipy.spatial.transform import Rotation

    euler = rng.uniform(-0.5, 0.5, 3)
    R = Rotation.from_euler("ZYX", euler).as_matrix()
    q_xyzw = Rotation.from_matrix(R).as_quat()
    quat = np.array([q_xyzw[3], *q_xyzw[:3]])
    rbd = rbd_state_from_ground_truth(
        np.array([1.0, 2, 0.9]), quat, np.array([0.1, 0, 0]), np.array([0, 0, 0.2]),
        np.zeros(10), np.zeros(10),
    )
    np.testing.assert_allclose(np.asarray(rbd[0:3]), euler, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rbd[3:6]), [1, 2, 0.9], atol=1e-12)


def test_kalman_converges_standing(h1_model, h1_info):
    """Standing still with biased initial estimate: the contact LKF must pull
    base position/velocity back to the truth using leg kinematics."""
    x_nom = jnp.asarray(
        np.concatenate([np.zeros(6), [0, 0, 0.93, 0, 0, 0], [0, 0, -0.5, 1.0, -0.5] * 2])
    )
    q = x_nom[6:]
    feet = contact_positions(h1_model, h1_info, q)
    # terrain height consistent with the true foot height at this posture
    cfg = KalmanConfig(dt=0.0025, terrain_height=float(np.asarray(feet)[:, 2].mean()))
    # truth: base at (0,0,0.93), zero velocity; init estimate offset by 5 cm
    state = kalman_init(
        jnp.asarray([0.05, -0.03, 0.95]), jnp.asarray([0.1, 0.0, -0.05]), feet
    )
    R_wb = rotmat_from_zyx(jnp.zeros(3))
    accel_imu = jnp.asarray([0.0, 0.0, 9.81])  # proper acceleration at rest
    step = jax.jit(
        lambda s: kalman_update(
            h1_model, h1_info, cfg, s, R_wb, accel_imu, jnp.zeros(3), jnp.zeros(3),
            q[6:], jnp.zeros(10), jnp.ones(4),
        )
    )
    for _ in range(1200):
        state = step(state)
    # absolute xy is a gauge freedom of leg odometry; observable quantities:
    # base-to-foot relatives, absolute height (terrain pseudo-measurement),
    # and velocity.
    rel_est = np.asarray(state.z[6:]).reshape(4, 3) - np.asarray(state.z[0:3])
    rel_true = np.asarray(feet) - np.array([0.0, 0.0, 0.93])
    np.testing.assert_allclose(rel_est, rel_true, atol=5e-3)
    np.testing.assert_allclose(float(state.z[2]), 0.93, atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.z[3:6]), 0, atol=1e-2)


def test_weight_compensating_input(h1_info):
    u = weight_compensating_input(h1_info, jnp.asarray([1.0, 1, 0, 0]), h1_info.input_dim)
    f = np.asarray(u[:12]).reshape(4, 3)
    mg = h1_info.robot_mass * 9.81
    np.testing.assert_allclose(f[:2, 2], mg / 2, rtol=1e-12)
    np.testing.assert_allclose(f[2:], 0, atol=1e-12)
