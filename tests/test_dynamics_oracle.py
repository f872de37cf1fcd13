"""Oracle tests: TPU engine vs CPU MuJoCo on smooth (contact-free) systems.

The TPU analogue of the reference's Derivs_Test oracle strategy
(`/root/reference/src/tests/Derivs_Test.cpp:12-122`): trust MuJoCo as ground
truth and require element-wise agreement.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from trajoptkp_tpu.dynamics import (Data, forward, load_mjcf_string, make_data,
                                    step)
from trajoptkp_tpu.dynamics.fk import forward_kinematics

from fixtures import ALL

SMOOTH_MODELS = ["pendulum", "acrobot", "mixed", "free_body", "ball_pendulum"]


def _mj_setup(name):
    mjm = mujoco.MjModel.from_xml_string(ALL[name])
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(ALL[name])
    return mjm, mjd, model


def _random_state(mjm, seed):
    rng = np.random.default_rng(seed)
    qpos = mjm.qpos0 + 0.3 * rng.standard_normal(mjm.nq)
    # keep quaternions valid
    for j in range(mjm.njnt):
        t = mjm.jnt_type[j]
        adr = mjm.jnt_qposadr[j]
        if t == mujoco.mjtJoint.mjJNT_BALL:
            q = rng.standard_normal(4)
            qpos[adr : adr + 4] = q / np.linalg.norm(q)
        elif t == mujoco.mjtJoint.mjJNT_FREE:
            q = rng.standard_normal(4)
            qpos[adr + 3 : adr + 7] = q / np.linalg.norm(q)
    qvel = 0.5 * rng.standard_normal(mjm.nv)
    ctrl = 0.8 * rng.standard_normal(mjm.nu)
    return qpos, qvel, ctrl


@pytest.mark.parametrize("name", SMOOTH_MODELS)
def test_forward_kinematics_matches(name):
    mjm, mjd, model = _mj_setup(name)
    qpos, qvel, ctrl = _random_state(mjm, 1)
    mjd.qpos[:] = qpos
    mujoco.mj_forward(mjm, mjd)
    data = make_data(model).replace(qpos=jnp.array(qpos))
    data = forward_kinematics(model, data)
    np.testing.assert_allclose(np.array(data.xpos), mjd.xpos, atol=1e-9)
    # quaternions up to sign
    for b in range(mjm.nbody):
        q_mine, q_mj = np.array(data.xquat[b]), mjd.xquat[b]
        if np.dot(q_mine, q_mj) < 0:
            q_mine = -q_mine
        np.testing.assert_allclose(q_mine, q_mj, atol=1e-9)
    if mjm.nsite:
        np.testing.assert_allclose(
            np.array(data.site_xpos), mjd.site_xpos, atol=1e-9
        )


@pytest.mark.parametrize("name", SMOOTH_MODELS)
def test_forward_dynamics_matches(name):
    mjm, mjd, model = _mj_setup(name)
    qpos, qvel, ctrl = _random_state(mjm, 2)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mjd.ctrl[:] = ctrl
    mujoco.mj_forward(mjm, mjd)
    data = make_data(model).replace(
        qpos=jnp.array(qpos), qvel=jnp.array(qvel), ctrl=jnp.array(ctrl)
    )
    data = forward(model, data)
    M = np.zeros((mjm.nv, mjm.nv))
    mujoco.mj_fullM(mjm, mjd, M)
    np.testing.assert_allclose(np.array(data.qM), M, atol=1e-10)
    np.testing.assert_allclose(
        np.array(data.qfrc_bias), mjd.qfrc_bias, atol=1e-10
    )
    np.testing.assert_allclose(np.array(data.qacc), mjd.qacc, atol=1e-8)


@pytest.mark.parametrize("name", SMOOTH_MODELS)
def test_rollout_matches(name):
    """Golden-trajectory equivalence: 300 steps of mj_step vs our step."""
    mjm, mjd, model = _mj_setup(name)
    qpos, qvel, ctrl = _random_state(mjm, 3)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mjd.ctrl[:] = ctrl
    data = make_data(model).replace(
        qpos=jnp.array(qpos), qvel=jnp.array(qvel), ctrl=jnp.array(ctrl)
    )
    stepj = jax.jit(lambda d: step(model, d))
    for _ in range(300):
        mujoco.mj_step(mjm, mjd)
        data = stepj(data)
    np.testing.assert_allclose(np.array(data.qpos), mjd.qpos, atol=1e-10)
    np.testing.assert_allclose(np.array(data.qvel), mjd.qvel, atol=1e-9)


def test_vmap_step_consistency():
    """vmapped step == python-loop step (the FD batching correctness basis)."""
    _, _, model = _mj_setup("acrobot")
    B = 16
    key = jax.random.PRNGKey(0)
    qpos = 0.3 * jax.random.normal(key, (B, model.nq))
    qvel = 0.2 * jax.random.normal(jax.random.fold_in(key, 1), (B, model.nv))
    ctrl = jax.random.normal(jax.random.fold_in(key, 2), (B, model.nu))

    def one(qp, qv, ct):
        d = Data(qpos=qp, qvel=qv, ctrl=ct, time=jnp.zeros(()))
        out = step(model, d)
        return out.qpos, out.qvel

    batched = jax.jit(jax.vmap(one))(qpos, qvel, ctrl)
    for i in range(B):
        qp, qv = one(qpos[i], qvel[i], ctrl[i])
        np.testing.assert_allclose(np.array(batched[0][i]), np.array(qp), atol=1e-12)
        np.testing.assert_allclose(np.array(batched[1][i]), np.array(qv), atol=1e-12)
