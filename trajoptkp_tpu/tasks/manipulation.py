"""Additional manipulation tasks: box_sweep and place.

  - BoxSweep (`/root/reference/src/ModelTranslator/BoxSweep.cpp:101-139` +
    `TaskConfigs/rigid_body_manipulation/box_sweep.yaml`): sweep a large
    heavy box to a goal; residuals = goal 2-D distance, goal planar speed,
    EE-to-box reach distance.
  - PlaceObject (`PlaceObject.cpp:113-151` + `place_single.yaml`): move a
    held cylinder to a goal pose keeping it upright; residuals = object 2-D
    goal distance, upright-orientation error, object speed, EE reach.

Scenes are assembled around the hand-authored panda arm like pushing.py.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..dynamics.mjcf import load_mjcf_string
from ..keypoints.methods import KeypointConfig
from ..state.statevector import state_vector_from_names
from ..utils import math as tm
from .base import Task
from .pushing import _MODELS_DIR


def _panda_scene(objects_xml: str, timestep=0.008) -> str:
    panda = open(os.path.join(_MODELS_DIR, "panda.xml")).read()
    arm_body = panda[panda.index('<body name="panda_link0"'):panda.index("</worldbody>")]
    actuators = panda[panda.index("<actuator>"):panda.index("</actuator>") + len("</actuator>")]
    arm_body = arm_body.replace(
        '<site name="ee" pos="0 0 0.1" size="0.01"/>',
        '<site name="ee" pos="0 0 0.1" size="0.01"/>\n'
        '  <geom name="pusher" type="cylinder" size="0.012 0.05" pos="0 0 0.1" '
        'mass="0.05" contype="1" conaffinity="1" friction="0.8 0.005 0.0001"/>',
    )
    return f"""
<mujoco model="panda_scene">
  <option timestep="{timestep}" gravity="0 0 -9.81"/>
  <compiler angle="radian"/>
  <default>
    <joint type="hinge" damping="10" armature="0.1"/>
    <geom contype="0" conaffinity="0" density="2700"/>
  </default>
  <worldbody>
    <geom name="table" type="plane" size="3 3 0.1" contype="1" conaffinity="1"
          friction="0.4 0.005 0.0001"/>
    {arm_body}
    {objects_xml}
  </worldbody>
  {actuators}
</mujoco>
"""


def make_box_sweep(dtype=jnp.float64) -> Task:
    objects = (
        '<body name="goal" pos="0.6 0.1 0.06">\n'
        '  <freejoint name="goal"/>\n'
        '  <geom name="goal" type="box" size="0.15 0.1 0.06" mass="2.0" '
        'contype="1" conaffinity="1" friction="0.25 0.005 0.0001" rgba="0 1 0 1"/>\n'
        "</body>"
    )
    model = load_mjcf_string(_panda_scene(objects), dtype=dtype)
    ee_site = model.site_names.index("ee")
    goal_body = model.body_names.index("goal")
    goal_j = model.joint_names.index("goal")
    gd = model.jnt_dofadr[goal_j]

    def residual_fn(m, data, targets):
        goal_pos = data.xpos[goal_body]
        r_goal = jnp.sqrt(jnp.sum((goal_pos[:2] - targets[:2]) ** 2) + 1e-12)
        gvel = data.qvel[gd : gd + 2] - targets[2:4]
        r_vel = jnp.sqrt(jnp.sum(gvel * gvel) + 1e-12)
        ee = data.site_xpos[ee_site]
        r_reach = jnp.sqrt(jnp.sum((ee - goal_pos) ** 2) + 1e-12)
        return jnp.stack([r_goal, r_vel, r_reach])

    def complete_fn(m, data, targets):
        dist = jnp.linalg.norm(data.xpos[goal_body][:2] - targets[:2])
        return dist < 0.05, dist

    names = list(model.joint_names[:7]) + [
        "goal_lin_x", "goal_lin_y", "goal_lin_z",
        "goal_ang_x", "goal_ang_y", "goal_ang_z",
    ]
    sv = state_vector_from_names(model, names, dtype=dtype)
    ndof = sv.ndof
    return Task(
        name="box_sweep",
        residual_names=("goal_pos", "goal_vel", "reach"),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array([0.9, 0.4, 0.0, 0.0], dtype=dtype),
        weights=jnp.array([0.0, 0.1, 0.01], dtype=dtype),
        weights_terminal=jnp.array([1000.0, 10.0, 0.01], dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype)
        .at[:7]
        .set(jnp.array([0, -0.183, 0, -3.1, 0, 1.34, 0], dtype=dtype)),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="adaptive_jerk",
            min_N=1,
            max_N=1000,
            jerk_thresholds=jnp.full((ndof,), 10.0, dtype),
            accel_thresholds=jnp.full((ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((ndof,), 0.1, dtype),
        ),
        openloop_horizon=1500,
        mpc_horizon=50,
    )


def make_place(dtype=jnp.float64) -> Task:
    """Place a held cylinder at a goal keeping it upright
    (PlaceObject.cpp upright residual via the tangent angle of the object's
    z-axis from vertical)."""
    objects = (
        '<body name="goal" pos="0.52 0.02 0.4">\n'
        '  <freejoint name="goal"/>\n'
        '  <geom name="goal" type="cylinder" size="0.03 0.06" mass="0.2" '
        'contype="1" conaffinity="1" friction="0.8 0.005 0.0001" rgba="0 1 0 1"/>\n'
        "</body>"
    )
    model = load_mjcf_string(_panda_scene(objects), dtype=dtype)
    ee_site = model.site_names.index("ee")
    goal_body = model.body_names.index("goal")
    goal_j = model.joint_names.index("goal")
    gd = model.jnt_dofadr[goal_j]

    def residual_fn(m, data, targets):
        goal_pos = data.xpos[goal_body]
        r_goal = jnp.sqrt(jnp.sum((goal_pos[:2] - targets[:2]) ** 2) + 1e-12)
        # upright error: angle between object z-axis and world z
        R = tm.quat_to_mat(data.xquat[goal_body])
        upright = jnp.sqrt(R[0, 2] ** 2 + R[1, 2] ** 2 + 1e-12)
        gvel = data.qvel[gd : gd + 3]
        r_vel = jnp.sqrt(jnp.sum(gvel * gvel) + 1e-12)
        ee = data.site_xpos[ee_site]
        r_reach = jnp.sqrt(jnp.sum((ee - goal_pos) ** 2) + 1e-12)
        return jnp.stack([r_goal, upright, r_vel, r_reach])

    def complete_fn(m, data, targets):
        dist = jnp.linalg.norm(data.xpos[goal_body][:2] - targets[:2])
        return dist < 0.03, dist

    names = list(model.joint_names[:7]) + [
        "goal_lin_x", "goal_lin_y", "goal_lin_z",
        "goal_ang_x", "goal_ang_y", "goal_ang_z",
    ]
    sv = state_vector_from_names(model, names, dtype=dtype)
    ndof = sv.ndof
    return Task(
        name="place",
        residual_names=("goal_pos", "upright", "goal_vel", "reach"),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array([0.7, -0.2], dtype=dtype),
        weights=jnp.array([0.1, 1.0, 0.1, 0.05], dtype=dtype),
        weights_terminal=jnp.array([500.0, 100.0, 10.0, 0.05], dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype)
        .at[:7]
        .set(jnp.array([0, -0.183, 0, -3.1, 0, 1.34, 0], dtype=dtype)),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="velocity_change",
            min_N=2,
            max_N=50,
            jerk_thresholds=jnp.full((ndof,), 10.0, dtype),
            accel_thresholds=jnp.full((ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((ndof,), 0.1, dtype),
        ),
        openloop_horizon=800,
        mpc_horizon=50,
    )
