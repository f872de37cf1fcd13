"""Soft-body manipulation tasks: PushSoft and PushSoftIntoRigid.

Mirrors the reference's PushSoft task
(`/root/reference/src/ModelTranslator/PushSoft.cpp`,
`TaskConfigs/soft_body_manipulation/push_soft{,_into_rigid}.yaml`):

  - ``push_soft``: Panda pushes a 36-vertex soft "jelly" block so its
    vertices reach a planar goal.  The reference expresses the cost through
    per-vertex state-vector weights (linearPosCost 0.1 / terminal 10 on x,y;
    linearVelCost 0.1) — reproduced here as per-vertex residuals with the
    same weights, plus the panda joint-6 velocity regulariser
    (`push_soft.yaml:25,31-48`).
  - ``push_soft_rigid``: a rigid cylinder ("goal") must be pushed to a target
    *through* a 48-vertex jelly obstacle; cost is on the rigid body only
    (linearPosCost 100 running, vel 0.1 — `push_soft_into_rigid.yaml:28-48`),
    the jelly is an unweighted deformable obstacle (but its vertices are in
    the optimisation state, `soft_bodies.activeLinearDOF`).

The soft body itself is this engine's flex particle lattice
(`dynamics/flex.py`) — the TPU-native stand-in for MuJoCo's flex plugin
objects, which the reference loads at runtime
(`src/ModelTranslator/ModelTranslator.cpp:80-86`).

Init controls reuse the PushBaseClass EE-waypoint + Jacobian-servo machinery
from `tasks/pushing.py` (the reference's PushSoft does the same through
EEWayPointsPush, `PushSoft.cpp:157-201`).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..dynamics.flex import attach_flex, soft_body_xml
from ..dynamics.mjcf import load_mjcf_string
from ..keypoints.methods import KeypointConfig
from ..state.statevector import state_vector_from_names
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")

_JELLY_SHAPE = (4, 3, 3)        # 36 vertices (push_soft.yaml num_vertices)
_JELLY_RIGID_SHAPE = (4, 4, 3)  # 48 vertices (push_soft_into_rigid.yaml)
_SPACING = 0.03
_RADIUS = 0.014


def build_push_soft_scene_xml(into_rigid: bool) -> str:
    """Panda + pusher rod + table + jelly (+ rigid goal cylinder)."""
    panda = open(os.path.join(_MODELS_DIR, "panda.xml")).read()
    arm_body = panda[
        panda.index('<body name="panda_link0"'):panda.index("</worldbody>")
    ]
    actuators = panda[
        panda.index("<actuator>"):panda.index("</actuator>") + len("</actuator>")
    ]
    arm_body = arm_body.replace(
        '<site name="ee" pos="0 0 0.1" size="0.01"/>',
        '<site name="ee" pos="0 0 0.1" size="0.01"/>\n'
        '  <geom name="pusher" type="cylinder" size="0.01 0.05" pos="0 0 0.1" '
        'mass="0.05" contype="1" conaffinity="3" friction="0.6 0.005 0.0001"/>',
    )
    shape = _JELLY_RIGID_SHAPE if into_rigid else _JELLY_SHAPE
    # lattice base corner so the jelly is centred at x=0.5 (start pose of the
    # pushed object in both reference configs), resting on the table
    cx = 0.5 - (shape[0] - 1) * _SPACING / 2.0
    cy = 0.0 - (shape[1] - 1) * _SPACING / 2.0
    jelly = soft_body_xml(
        "jelly", (cx, cy, _RADIUS), shape=shape,
        spacing=_SPACING, radius=_RADIUS, total_mass=0.1, damping=0.05,
    )
    rigid = ""
    if into_rigid:
        # rigid goal cylinder behind the jelly on the push line
        rigid = (
            '<body name="goal" pos="0.62 0 0.032">\n'
            '  <freejoint name="goal"/>\n'
            '  <geom name="goal" type="cylinder" size="0.05 0.03" mass="0.1" '
            'contype="1" conaffinity="3" friction="0.3 0.005 0.0001" '
            'rgba="0 1 0 1"/>\n'
            "</body>"
        )
    return f"""
<mujoco model="push_soft_scene">
  <option timestep="0.004" gravity="0 0 -9.81"/>
  <compiler angle="radian"/>
  <default>
    <joint type="hinge" damping="10" armature="0.1"/>
    <geom contype="0" conaffinity="0" density="2700"/>
  </default>
  <worldbody>
    <geom name="table" type="plane" size="3 3 0.1" contype="1" conaffinity="3"
          friction="0.5 0.005 0.0001"/>
    {arm_body}
    {jelly}
    {rigid}
  </worldbody>
  {actuators}
</mujoco>
"""


def _ee_init_controls(task, H, qpos0=None, qvel0=None, targets=None):
    """CreateInitOptimisationControls hook: PushBaseClass EE-waypoint
    servo (`/root/reference/src/ModelTranslator/PushBaseClass.cpp:139-248`;
    the sweep/place tasks inherit it, `BoxSweep.h:13`, `SweepMultiple.h:12`,
    `PlaceObject.h:22`)."""
    from .pushing import jacobian_ee_init_controls

    return jacobian_ee_init_controls(task, H, qpos0, qvel0, targets)


def make_push_soft(into_rigid: bool = False, dtype=jnp.float64) -> Task:
    shape = _JELLY_RIGID_SHAPE if into_rigid else _JELLY_SHAPE
    nvert = shape[0] * shape[1] * shape[2]
    xml = build_push_soft_scene_xml(into_rigid)
    model = load_mjcf_string(xml, dtype=dtype)
    model = attach_flex(model, "jelly", shape, stiffness=25.0, damping=0.5)

    vert_bodies = np.array(model.flex_vertbodyid)
    joint5_dadr = 5  # panda joint indices 0..6 lead the dof vector
    # vertex slide-dof addresses: (nvert, 3) into qvel
    vert_dadr = np.array(
        [
            [
                model.jnt_dofadr[model.joint_names.index(f"jelly_v{n}_{ax}")]
                for ax in ("x", "y", "z")
            ]
            for n in range(nvert)
        ]
    )

    if into_rigid:
        goal_body = model.body_names.index("goal")
        goal_jnt = model.joint_names.index("goal")
        goal_dadr = model.jnt_dofadr[goal_jnt]

        def residual_fn(dyn_model, data, targets):
            # rigid-body planar error + speed (push_soft_into_rigid.yaml:36-40)
            gp = data.xpos[goal_body]
            gv = data.qvel[goal_dadr : goal_dadr + 2]
            return jnp.concatenate(
                [gp[:2] - targets[:2], gv, data.qvel[joint5_dadr][None]]
            )

        def complete_fn(dyn_model, data, targets):
            dist = jnp.linalg.norm(data.xpos[goal_body][:2] - targets[:2])
            return dist < 0.03, dist

        residual_names = ("goal_x", "goal_y", "goal_vx", "goal_vy",
                          "joint_6_velocity")
        w = [100.0, 100.0, 0.1, 0.1, 0.1]
        wt = [100.0, 100.0, 0.0, 0.0, 0.0]
        target = jnp.array([0.75, 0.1], dtype=dtype)
        name = "push_soft_rigid"
        push_body = "goal"
    else:

        def residual_fn(dyn_model, data, targets):
            # per-vertex planar error + velocity (push_soft.yaml:38-41) and
            # the panda joint-6 velocity regulariser (:25)
            x = data.xipos[vert_bodies]          # (nvert, 3)
            pos = (x[:, :2] - targets[None, :2]).reshape(-1)
            vel = data.qvel[vert_dadr[:, :2].reshape(-1)]
            return jnp.concatenate([pos, vel, data.qvel[joint5_dadr][None]])

        def complete_fn(dyn_model, data, targets):
            centroid = jnp.mean(data.xipos[vert_bodies][:, :2], axis=0)
            dist = jnp.linalg.norm(centroid - targets[:2])
            return dist < 0.03, dist

        residual_names = tuple(
            f"jelly_v{n}_{c}" for n in range(nvert) for c in ("x", "y")
        ) + tuple(
            f"jelly_v{n}_v{c}" for n in range(nvert) for c in ("x", "y")
        ) + ("joint_6_velocity",)
        w = [0.1] * (2 * nvert) + [0.1] * (2 * nvert) + [0.1]
        wt = [10.0] * (2 * nvert) + [0.0] * (2 * nvert) + [0.1]
        target = jnp.array([0.65, 0.1], dtype=dtype)
        name = "push_soft"
        # push toward a central jelly vertex
        push_body = f"jelly_v{nvert // 2}"

    # state vector: panda joints + (rigid goal lin dofs) + all vertex dofs
    names = list(model.joint_names[:7])
    if into_rigid:
        names += ["goal_lin_x", "goal_lin_y", "goal_lin_z"]
    for n in range(nvert):
        names += [f"jelly_v{n}_{ax}" for ax in ("x", "y", "z")]
    sv = state_vector_from_names(model, names, dtype=dtype)
    ndof = sv.ndof

    return Task(
        init_controls_fn=_ee_init_controls,
        name=name,
        residual_names=residual_names,
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        push_object_body=push_body,
        model=model,
        sv=sv,
        residual_targets=target,
        weights=jnp.array(w, dtype=dtype),
        weights_terminal=jnp.array(wt, dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype)
        .at[:7]
        .set(jnp.array([0, 0.1, 0, -3, 0, 1.34, 0], dtype=dtype)),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=10,
            jerk_thresholds=jnp.concatenate(
                [jnp.full((7,), 0.002, dtype),
                 jnp.full((ndof - 7,), 0.0005, dtype)]
            ),
            accel_thresholds=jnp.full((ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((ndof,), 0.1, dtype),
        ),
        openloop_horizon=2000,
        mpc_horizon=100,
    )
