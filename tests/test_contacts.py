"""Contact + joint-limit oracle tests vs CPU MuJoCo.

Covers the constraint stack (collision narrow phase, soft-constraint rows,
projected-Newton solver) that the contact-rich tasks (PistonBlock →
TwoDPushing → walker) depend on.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from trajoptkp_tpu.dynamics import forward, load_mjcf_string, make_data, step

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)

SPHERE_DROP = """
<mujoco><option timestep="0.002"/><worldbody>
<geom name="floor" type="plane" size="2 2 .1"/>
<body name="ball" pos="0.02 -0.01 0.3"><freejoint/>
<geom type="sphere" size="0.1" mass="0.5"/></body>
</worldbody></mujoco>"""

SLIDING_BOX = """
<mujoco><option timestep="0.002"/><worldbody>
<geom name="floor" type="plane" size="3 3 .1" friction="0.4 0.005 0.0001"/>
<body name="box" pos="0 0 0.05"><freejoint/>
<geom type="box" size="0.06 0.05 0.05" mass="0.8" friction="0.4 0.005 0.0001"/></body>
</worldbody></mujoco>"""

CAPSULE_REST = """
<mujoco><option timestep="0.002"/><worldbody>
<geom name="floor" type="plane" size="2 2 .1"/>
<body name="cap" pos="0 0 0.2"><freejoint/>
<geom type="capsule" fromto="-0.15 0 0 0.15 0 0" size="0.05" mass="0.4"/></body>
</worldbody></mujoco>"""

LIMITED_PENDULUM = """
<mujoco><option timestep="0.002"/><worldbody>
<body name="pole" pos="0 0 1">
<joint name="hinge" type="hinge" axis="0 1 0" range="-0.5 0.5" limited="true" damping="0.01"/>
<geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.03" mass="0.3"/>
</body></worldbody></mujoco>"""

PISTON_BLOCK = """
<mujoco><option timestep="0.004"/><worldbody>
<geom name="floor" type="plane" size="3 3 .1"/>
<body name="piston" pos="-0.2 0 0.06">
  <joint name="slide" type="slide" axis="1 0 0" damping="1"/>
  <geom type="box" size="0.05 0.05 0.05" mass="1"/>
</body>
<body name="block" pos="0 0 0.051"><freejoint/>
  <geom type="box" size="0.05 0.05 0.05" mass="0.2"/>
</body>
</worldbody>
<actuator><motor joint="slide" gear="1"/></actuator></mujoco>"""


def _compare_rollout(xml, steps, qvel0=None, ctrl=None, atol_q=5e-3):
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(xml)
    if qvel0 is not None:
        mjd.qvel[: len(qvel0)] = qvel0
    if ctrl is not None:
        mjd.ctrl[:] = ctrl
    data = make_data(model).replace(
        qpos=jnp.array(mjd.qpos),
        qvel=jnp.array(mjd.qvel),
        ctrl=jnp.array(mjd.ctrl),
    )
    stepj = jax.jit(lambda d: step(model, d))
    for _ in range(steps):
        mujoco.mj_step(mjm, mjd)
        data = stepj(data)
    np.testing.assert_allclose(
        np.asarray(data.qpos), mjd.qpos, atol=atol_q,
        err_msg=f"qpos after {steps} steps",
    )
    return model, data, mjd


def test_instant_contact_force_parity():
    """qacc with an active contact matches MuJoCo to high precision."""
    mjm = mujoco.MjModel.from_xml_string(SPHERE_DROP)
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(SPHERE_DROP)
    mjd.qpos[2] = 0.095  # 5mm penetration
    mjd.qvel[0] = 0.3
    mujoco.mj_forward(mjm, mjd)
    data = make_data(model).replace(
        qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel)
    )
    out = forward(model, data)
    np.testing.assert_allclose(
        np.asarray(out.qfrc_constraint), mjd.qfrc_constraint, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out.qacc), mjd.qacc, atol=1e-5)


def test_sphere_drop_and_settle():
    """Ball dropped from 30 cm: bounce + settle matches mujoco closely."""
    model, data, mjd = _compare_rollout(SPHERE_DROP, 600, atol_q=2e-3)
    # settled on the floor at ~radius height
    assert abs(float(data.qpos[2]) - 0.1) < 5e-3


def test_sliding_box_friction():
    """Box sliding with friction 0.4 decelerates identically to mujoco."""
    _compare_rollout(
        SLIDING_BOX, 400, qvel0=np.array([1.5, 0, 0, 0, 0, 0]), atol_q=5e-3
    )


def test_capsule_settles():
    _compare_rollout(CAPSULE_REST, 500, atol_q=5e-3)


def test_joint_limit():
    """Swinging pendulum hits its +-0.5 rad limit like mujoco."""
    model, data, mjd = _compare_rollout(
        LIMITED_PENDULUM, 500, qvel0=np.array([4.0]), atol_q=5e-3
    )
    assert float(jnp.abs(data.qpos[0])) < 0.6


def test_piston_pushes_block():
    """Actuated piston contacts and pushes a free block (the PistonBlock toy,
    `/root/reference/src/ModelTranslator/PistonBlock.cpp`).

    Box-box impact chatter is chaotic (sub-mm manifold differences between
    any two solvers amplify over hundreds of steps), so this asserts
    behavioural parity: block pushed a comparable distance, upright, resting
    at the correct height — not step-wise state equality.
    """
    mjm = mujoco.MjModel.from_xml_string(PISTON_BLOCK)
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(PISTON_BLOCK)
    mjd.ctrl[:] = 4.0
    data = make_data(model).replace(ctrl=jnp.array([4.0]))
    stepj = jax.jit(lambda d: step(model, d))
    for _ in range(400):
        mujoco.mj_step(mjm, mjd)
        data = stepj(data)
    x_mine, x_mj = float(data.qpos[1]), mjd.qpos[1]
    assert x_mine > 0.3, "block was not pushed"
    assert abs(x_mine - x_mj) / x_mj < 0.5, (x_mine, x_mj)
    assert abs(float(data.qpos[3]) - 0.05) < 5e-3, "block not resting on floor"
    assert float(data.qpos[4]) > 0.98, "block tipped over"
