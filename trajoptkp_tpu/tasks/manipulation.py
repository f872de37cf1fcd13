"""Additional manipulation tasks: box_sweep, place, threeD_push,
sweep_multiple.

  - BoxSweep (`/root/reference/src/ModelTranslator/BoxSweep.cpp:101-139` +
    `TaskConfigs/rigid_body_manipulation/box_sweep.yaml`): sweep a large
    heavy box to a goal; residuals = goal 2-D distance, goal planar speed,
    EE-to-box reach distance.
  - PlaceObject (`PlaceObject.cpp:113-151` + `place_single.yaml`): move a
    held cylinder to a goal pose keeping it upright; residuals = object 2-D
    goal distance, upright-orientation error, object speed, EE reach.
  - ThreeDPushing (`ThreeDPushing.cpp` + `threeD_push.yaml`): push a box
    that can topple; the goal body has all six DoFs active; cost = terminal
    planar position (100), running planar velocity (0.1) and running x/y
    angular position (1) per the yaml's per-DoF weights.
  - SweepMultiple (`SweepMultiple.cpp` + `Sweep_multiple.yaml`): sweep a
    scoop plus several objects toward a goal *line* x = 0.8; cost = terminal
    x-distance per object (scoop 10, obstacles 1000) + panda joint-velocity
    regularisers [0.1, 0.1, 0.1, 0.01, 0, 0.1, 0].

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


def _ee_init_controls(task, H, qpos0=None, qvel0=None, targets=None):
    """CreateInitOptimisationControls hook: PushBaseClass EE-waypoint
    servo (`/root/reference/src/ModelTranslator/PushBaseClass.cpp:139-248`;
    the sweep/place tasks inherit it, `BoxSweep.h:13`, `SweepMultiple.h:12`,
    `PlaceObject.h:22`)."""
    from .pushing import jacobian_ee_init_controls

    return jacobian_ee_init_controls(task, H, qpos0, qvel0, targets)


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
        # axis=0 reductions keep this lane-safe (solver/lanes.py residual
        # evaluation feeds (3, ...L) vectors; axis 0 is the spatial axis in
        # both the generic (3,) and lane (3, L) layouts)
        goal_pos = data.xpos[goal_body]
        r_goal = jnp.sqrt(
            jnp.sum((goal_pos[:2] - targets[:2]) ** 2, axis=0) + 1e-12
        )
        gvel = data.qvel[gd : gd + 2] - targets[2:4]
        r_vel = jnp.sqrt(jnp.sum(gvel * gvel, axis=0) + 1e-12)
        ee = data.site_xpos[ee_site]
        r_reach = jnp.sqrt(jnp.sum((ee - goal_pos) ** 2, axis=0) + 1e-12)
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
        init_controls_fn=_ee_init_controls,
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
        init_controls_fn=_ee_init_controls,
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


def make_threed_push(dtype=jnp.float64) -> Task:
    """3-D pushing with toppling (ThreeDPushing.cpp + threeD_push.yaml):
    the pushed body is a box whose angular DoFs are in the optimisation
    state; running cost penalises planar tilt (angularPosCost [1,1,0]) so
    the optimiser avoids toppling while pushing."""
    objects = (
        '<body name="goal" pos="0.5 0.1 0.051">\n'
        '  <freejoint name="goal"/>\n'
        '  <geom name="goal" type="box" size="0.03 0.03 0.05" mass="0.2" '
        'contype="1" conaffinity="1" friction="0.4 0.005 0.0001" rgba="0 1 0 1"/>\n'
        "</body>"
    )
    model = load_mjcf_string(_panda_scene(objects, timestep=0.004), dtype=dtype)
    ee_site = model.site_names.index("ee")
    goal_body = model.body_names.index("goal")
    goal_j = model.joint_names.index("goal")
    gd = model.jnt_dofadr[goal_j]

    def residual_fn(m, data, targets):
        # lane-safe: spatial indexing/reductions on axis 0 (see box_sweep)
        goal_pos = data.xpos[goal_body]
        r_pos = goal_pos[:2] - targets[:2]
        gvel = data.qvel[gd : gd + 2]
        # planar tilt: x/y components of the box z-axis (angularPosCost
        # [1,1,0]) — R[:2, 2] written out from quat components so the
        # quaternion axis stays axis 0 in both layouts
        q = data.xquat[goal_body]
        w, x, y, z = q[0], q[1], q[2], q[3]
        tilt = jnp.stack([2 * (x * z + w * y), 2 * (y * z - w * x)])
        ee = data.site_xpos[ee_site]
        r_reach = jnp.sqrt(jnp.sum((ee - goal_pos) ** 2, axis=0) + 1e-12)
        return jnp.concatenate([r_pos, gvel, tilt, r_reach[None]])

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
        init_controls_fn=_ee_init_controls,
        name="threeD_push",
        residual_names=("goal_x", "goal_y", "goal_vx", "goal_vy",
                        "tilt_x", "tilt_y", "reach"),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array([0.7, 0.0], dtype=dtype),
        # threeD_push.yaml: terminalLinearPosCost 100, linearVelCost 0.1,
        # angularPosCost 1 running; small reach shaping as in pushing
        weights=jnp.array([0.0, 0.0, 0.1, 0.1, 1.0, 1.0, 0.01], dtype=dtype),
        weights_terminal=jnp.array(
            [100.0, 100.0, 0.0, 0.0, 0.0, 0.0, 0.01], dtype=dtype
        ),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype)
        .at[:7]
        .set(jnp.array([0, -0.183, 0, -3.1, 0, 1.34, 0], dtype=dtype)),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=20,
            jerk_thresholds=jnp.concatenate(
                [jnp.full((7,), 0.002, dtype), jnp.full((ndof - 7,), 0.0005, dtype)]
            ),
            accel_thresholds=jnp.full((ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((ndof,), 0.1, dtype),
        ),
        openloop_horizon=1000,
        mpc_horizon=100,
    )


_SWEEP_OBJECTS = [  # Sweep_multiple.yaml bodies: startLinearPos x, y
    ("scoop", 0.45, 0.0),
    ("obstacle_1", 0.5, 0.0),
    ("obstacle_2", 0.55, 0.05),
    ("obstacle_3", 0.65, 0.01),
    ("obstacle_4", 0.5, 0.1),
    ("obstacle_5", 0.55, -0.05),
]


def _ee_setup_controls(task, H=1000, qpos0=None, qvel0=None, targets=None):
    """CreateInitSetupControls for the sweep family (`SweepMultiple.cpp:188`
    mirrors TwoDPushing's EE setup servo; BoxSweep/PlaceObject keep the empty
    base-class tape)."""
    from .pushing import create_init_setup_controls

    return create_init_setup_controls(task, H, qpos0, qvel0, targets)


def make_sweep_multiple(dtype=jnp.float64) -> Task:
    """Multi-object sweeping (SweepMultiple.cpp + Sweep_multiple.yaml):
    sweep the scoop and five cylinders past the goal line x = 0.8; cost is
    terminal x-distance per object (scoop weight 10, obstacles 1000 each)
    plus running panda joint-velocity regularisers."""
    objs = []
    for name, x, y in _SWEEP_OBJECTS:
        color = "0 1 0 1" if name == "scoop" else "1 0 0 1"
        objs.append(
            f'<body name="{name}" pos="{x} {y} 0.032">\n'
            f'  <freejoint name="{name}"/>\n'
            f'  <geom name="{name}" type="cylinder" size="0.03 0.03" mass="0.1" '
            f'contype="1" conaffinity="1" friction="0.3 0.005 0.0001" '
            f'rgba="{color}"/>\n'
            "</body>"
        )
    model = load_mjcf_string(
        _panda_scene("\n".join(objs), timestep=0.006), dtype=dtype
    )
    bodies = [model.body_names.index(n) for n, _, _ in _SWEEP_OBJECTS]
    nobj = len(bodies)

    def residual_fn(m, data, targets):
        # x-distance of each object to the goal line (targets[0] = 0.8)
        r_obj = jnp.stack([data.xpos[b][0] - targets[0] for b in bodies])
        return jnp.concatenate([r_obj, data.qvel[:7]])

    def complete_fn(m, data, targets):
        xs = jnp.stack([data.xpos[b][0] for b in bodies])
        dist = jnp.sum(jnp.abs(xs - targets[0]))
        return dist < 0.05 * nobj, dist

    names = list(model.joint_names[:7])
    for n, _, _ in _SWEEP_OBJECTS:
        names += [f"{n}_lin_x", f"{n}_lin_y", f"{n}_lin_z"]
    sv = state_vector_from_names(model, names, dtype=dtype)
    ndof = sv.ndof
    jvel_w = [0.1, 0.1, 0.1, 0.01, 0.0, 0.1, 0.0]
    return Task(
        init_controls_fn=_ee_init_controls,
        setup_controls_fn=_ee_setup_controls,

        name="sweep_multiple",
        residual_names=tuple(f"{n}_x" for n, _, _ in _SWEEP_OBJECTS)
        + tuple(f"joint_{i}_vel" for i in range(7)),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        push_object_body="scoop",
        model=model,
        sv=sv,
        residual_targets=jnp.array([0.8, 0.0], dtype=dtype),
        weights=jnp.array([0.0] * nobj + jvel_w, dtype=dtype),
        weights_terminal=jnp.array(
            [10.0] + [1000.0] * (nobj - 1) + [0.0] * 7, dtype=dtype
        ),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype)
        .at[:7]
        .set(jnp.array([0, -0.183, 0, -3.1, 0, 1.34, 0], dtype=dtype)),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=50,
            jerk_thresholds=jnp.full((ndof,), 1e-15, dtype),
            accel_thresholds=jnp.full((ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((ndof,), 0.1, dtype),
        ),
        openloop_horizon=2000,
        mpc_horizon=60,
    )
