"""Lane-layout model-evaluation kernels vs the reference JAX implementations.

The building blocks in ops/pallas_linearize.py are pure jnp functions over
(S, L) lane-stacked arrays, so each stage is validated directly (no Pallas
interpreter needed) against the per-instance model code under vmap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipedal_control_tpu.interface import make_interface_for
from bipedal_control_tpu.model.kinematics import forward_kinematics
from bipedal_control_tpu.ops import pallas_linearize as PL

L = 4  # instances on lanes for the unit tests


@pytest.fixture(scope="module")
def h1():
    return make_interface_for("h1")


@pytest.fixture(scope="module")
def sm(h1):
    return PL.make_static_model(h1.model, h1.info.contact_frame_ids)


def _rand_q(h1, rng):
    nq = h1.model.nq
    q = rng.normal(size=(L, nq)) * 0.3
    q[:, 2] += 1.0
    return jnp.asarray(q)


def _lanes_from_q(q):
    """(L, nq) -> (p_b triple, theta triple, q_j (nj, L)) in lane layout."""
    qT = q.T  # (nq, L)
    p_b = tuple(qT[i : i + 1, :] for i in range(3))
    theta = tuple(qT[3 + i : 4 + i, :] for i in range(3))
    q_j = qT[6:, :]
    return p_b, theta, q_j


def test_fk_lanes_matches_reference(h1, sm):
    rng = np.random.default_rng(0)
    q = _rand_q(h1, rng)
    kin_ref = jax.vmap(lambda qq: forward_kinematics(h1.model, qq))(q)

    p_b, theta, q_j = _lanes_from_q(q)
    kin = PL.fk_lanes(sm, p_b, theta, q_j)
    for b in range(sm.nb):
        R = np.stack([np.asarray(kin.R[b][3 * i + j])[0] for i in range(3) for j in range(3)], 0)
        R = R.reshape(3, 3, L).transpose(2, 0, 1)
        np.testing.assert_allclose(R, np.asarray(kin_ref.R[:, b]), atol=1e-12)
        p = np.stack([np.asarray(kin.p[b][i])[0] for i in range(3)], 1)
        np.testing.assert_allclose(p, np.asarray(kin_ref.p[:, b]), atol=1e-12)
    E = np.stack([np.asarray(kin.E[3 * i + j])[0] for i in range(3) for j in range(3)], 0)
    E = E.reshape(3, 3, L).transpose(2, 0, 1)
    np.testing.assert_allclose(E, np.asarray(kin_ref.E), atol=1e-12)


def test_coms_contacts_inertia_lanes(h1, sm):
    from bipedal_control_tpu.model.centroidal import rotate_inertia
    from bipedal_control_tpu.model.kinematics import body_com_positions, frame_position

    rng = np.random.default_rng(1)
    q = _rand_q(h1, rng)
    p_b, theta, q_j = _lanes_from_q(q)
    kin = PL.fk_lanes(sm, p_b, theta, q_j)

    coms, com = PL.body_coms_lanes(sm, kin)
    kin_ref = jax.vmap(lambda qq: forward_kinematics(h1.model, qq))(q)
    coms_ref = jax.vmap(lambda R, p: body_com_positions(h1.model, type(kin_ref)(R=R, p=p, E=kin_ref.E[0])))(
        kin_ref.R, kin_ref.p
    )
    for b in range(sm.nb):
        got = np.stack([np.asarray(coms[b][i])[0] for i in range(3)], 1)
        np.testing.assert_allclose(got, np.asarray(coms_ref[:, b]), atol=1e-12)
    com_ref = np.sum(np.asarray(h1.model.body_mass)[None, :, None] * np.asarray(coms_ref), axis=1) / float(
        h1.model.total_mass
    )
    got_com = np.stack([np.asarray(com[i])[0] for i in range(3)], 1)
    np.testing.assert_allclose(got_com, com_ref, atol=1e-12)

    pes = PL.contact_positions_lanes(sm, kin)
    for i, fid in enumerate(h1.info.contact_frame_ids):
        ref = jax.vmap(
            lambda qq: frame_position(h1.model, forward_kinematics(h1.model, qq), fid)
        )(q)
        got = np.stack([np.asarray(pes[i][c])[0] for c in range(3)], 1)
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-12)

    Iw = PL.rotate_inertia_lanes(sm, kin)
    Iw_ref = jax.vmap(lambda R: rotate_inertia(R, h1.model.body_inertia))(kin_ref.R)
    for b in range(sm.nb):
        got = np.stack([np.asarray(Iw[b][3 * i + j])[0] for i in range(3) for j in range(3)], 0)
        got = got.reshape(3, 3, L).transpose(2, 0, 1)
        np.testing.assert_allclose(got, np.asarray(Iw_ref[:, b]), atol=1e-11)
