"""Non-prehensile pushing tasks: Panda pushes a cylinder to a goal among
0/3/7 cylinder obstacles.

Mirrors TwoDPushing (`/root/reference/src/ModelTranslator/TwoDPushing.cpp`)
and `TaskConfigs/rigid_body_manipulation/twoD_push_{no,light,heavy}_clutter
.yaml`:
  - residuals: goal 2-D distance (0 / 1000), goal planar speed (0.2 / 10),
    per-obstacle displacement from start, panda joint-5 velocity (0.1 / 0.1),
    EE-to-goal-object reach distance (0.01 / 0.01)
    (`TwoDPushing.cpp:291-356`)
  - state vector: 7 panda joints + goal (and obstacle) linear DoFs only —
    angular DoFs excluded (yaml activeLinearDOF / activeAngularDOF)
  - init controls: end-effector waypoints toward the object + push segment,
    followed with a Jacobian-pseudoinverse servo with gravity compensation
    (`PushBaseClass.cpp:8-248`)

The reference's scene XMLs live in an unvendored submodule; the scene here is
assembled around our panda.xml with an active-collision pusher rod, a table
plane, and cylinder objects (sizes chosen to match the task semantics:
pusher-rod radius 0.01 as hardcoded in `PushBaseClass.cpp:70`).
"""

from __future__ import annotations

import os
import re
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.mjcf import load_mjcf_string
from ..dynamics.model import Data
from ..dynamics.step import forward, step
from ..keypoints.methods import KeypointConfig
from ..state.statevector import dof_names, state_vector_from_names
from ..utils import math as tm
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")

_OBSTACLE_LAYOUTS = {
    0: [],
    3: [(0.55, 0.12), (0.62, -0.05), (0.48, -0.12)],
    7: [
        (0.55, 0.12), (0.62, -0.05), (0.48, -0.12), (0.58, 0.20),
        (0.70, 0.08), (0.42, 0.15), (0.65, -0.18),
    ],
    # constrained corridor (twoD_push_constrained_clutter.yaml bodies:
    # obstacles at (0.48, 0.3), (0.6, 0.4), (0.7, 0.3))
    "constrained": [(0.48, 0.3), (0.6, 0.4), (0.7, 0.3)],
}


def build_push_scene_xml(num_obstacles, goal_start=(0.5, 0.1)) -> str:
    """Assemble the pushing scene: panda arm + pusher rod + table + objects.

    `num_obstacles` is a key of _OBSTACLE_LAYOUTS (0/3/7 or "constrained")."""
    panda = open(os.path.join(_MODELS_DIR, "panda.xml")).read()
    arm_body = panda[panda.index('<body name="panda_link0"'):panda.index("</worldbody>")]
    actuators = panda[panda.index("<actuator>"):panda.index("</actuator>") + len("</actuator>")]
    # attach an active-collision pusher rod to the hand.  The servo targets
    # the EE site at z = 0.28 with the hand z-axis pointing DOWN
    # (`PushBaseClass.cpp:38,108,139-167`), so the rod must span from just
    # above the table (world z ~0.01) up to the hand for its side to contact
    # the 0.03-half-height object cylinders: local z 0.11..0.37 beyond the
    # site maps to world z 0.27..0.01 at the servo height.
    arm_body = arm_body.replace(
        '<site name="ee" pos="0 0 0.1" size="0.01"/>',
        '<site name="ee" pos="0 0 0.1" size="0.01"/>\n'
        '  <geom name="pusher" type="cylinder" size="0.01 0.13" pos="0 0 0.24" '
        'mass="0.05" contype="1" conaffinity="1" friction="0.6 0.005 0.0001"/>',
    )
    objs = [
        f'<body name="goal" pos="{goal_start[0]} {goal_start[1]} 0.032">\n'
        '  <freejoint name="goal"/>\n'
        '  <geom name="goal" type="cylinder" size="0.05 0.03" mass="0.1" '
        'contype="1" conaffinity="1" friction="0.3 0.005 0.0001" rgba="0 1 0 1"/>\n'
        "</body>"
    ]
    for i, (x, y) in enumerate(_OBSTACLE_LAYOUTS[num_obstacles]):
        objs.append(
            f'<body name="obstacle_{i+1}" pos="{x} {y} 0.032">\n'
            f'  <freejoint name="obstacle_{i+1}"/>\n'
            f'  <geom name="obstacle_{i+1}" type="cylinder" size="0.05 0.03" '
            'mass="0.1" contype="1" conaffinity="1" '
            'friction="0.3 0.005 0.0001" rgba="1 0 0 1"/>\n'
            "</body>"
        )
    objects_xml = "\n".join(objs)
    return f"""
<mujoco model="push_scene">
  <option timestep="0.008" gravity="0 0 -9.81"/>
  <compiler angle="radian"/>
  <default>
    <joint type="hinge" damping="10" armature="0.1"/>
    <geom contype="0" conaffinity="0" density="2700"/>
  </default>
  <worldbody>
    <geom name="table" type="plane" size="3 3 0.1" contype="1" conaffinity="1"
          friction="0.3 0.005 0.0001"/>
    {arm_body}
    {objects_xml}
  </worldbody>
  {actuators}
</mujoco>
"""


def _make_push_scene_generator(constrained: bool, n_obstacles: int):
    """Collision-free rejection-sampled clutter scenes
    (TwoDPushing::ReturnRandomStartState,
    `/root/reference/src/ModelTranslator/TwoDPushing.cpp:29-188`).

    The reference samples obstacle xy in a window that GROWS each rejection
    and re-checks MuJoCo collisions; our objects are r=0.05 cylinders on a
    table, so the collision check is a circle-overlap test against every
    already-placed object (plus the pushed object's start)."""
    R = 0.05            # object cylinder radius (build_push_scene_xml)

    def gen(task, rng):
        if constrained:
            start_x = rng.uniform(0.45, 0.46)
            start_y = rng.uniform(-0.05, 0.05)
            goal_x = rng.uniform(0.6, 0.65)
            goal_y = rng.uniform(-0.2, 0.2)
        else:
            start_x = 0.42
            start_y = rng.uniform(-0.05, 0.05)
            ang = rng.uniform(-np.pi / 4, np.pi / 4)
            dist = rng.uniform(0.28, 0.3)
            goal_x = start_x + dist * np.cos(ang)
            goal_y = start_y + dist * np.sin(ang)
        placed = [(start_x, start_y)]
        bodies = [np.array([start_x, start_y, 0.032, 0.0, 0.0, 0.0])]
        heavy = n_obstacles >= 7
        for _ in range(n_obstacles):
            if heavy:
                sx, sy, gx, gy = 0.08, 0.04, 0.001, 0.0005
            else:
                sx, sy, gx, gy = 0.01, 0.05, 0.0005, 0.0001
            while True:
                sx += gx
                sy += gy
                if constrained:
                    x = rng.uniform(start_x, goal_x + 0.1)
                    y = rng.uniform(goal_y - sy, goal_y + sy)
                elif heavy:
                    x = rng.uniform(goal_x - sx, goal_x + 0.5 * sx)
                    y = rng.uniform(goal_y - sy, goal_y + sy)
                else:
                    x = rng.uniform(goal_x - sx, goal_x)
                    y = rng.uniform(goal_y - sy, goal_y + sy)
                if all(np.hypot(x - px, y - py) > 2 * R
                       for px, py in placed):
                    break
            placed.append((x, y))
            bodies.append(np.array([x, y, 0.032, 0.0, 0.0, 0.0]))
        robot_start = np.asarray(task.qpos_start[:7], dtype=np.float64)
        targets = np.array([goal_x, goal_y], dtype=np.float64)
        return robot_start, bodies, targets

    return gen


def make_pushing(num_obstacles=0, dtype=jnp.float64) -> Task:
    """num_obstacles: 0 / 3 / 7 or "constrained" (TwoDPushing clutter levels
    noClutter / lowClutter / heavyClutter / constrainedClutter,
    `src/main.cpp:760-778`)."""
    constrained = num_obstacles == "constrained"
    layout = _OBSTACLE_LAYOUTS[num_obstacles]
    goal_start = (0.4, 0.2) if constrained else (0.5, 0.1)
    target_xy = (0.6, 0.4) if constrained else (0.7, -0.1)
    xml = build_push_scene_xml(num_obstacles, goal_start=goal_start)
    model = load_mjcf_string(xml, dtype=dtype)
    num_obstacles = len(layout)

    ee_site = model.site_names.index("ee")
    goal_body = model.body_names.index("goal")
    obstacle_bodies = tuple(
        model.body_names.index(f"obstacle_{i+1}") for i in range(num_obstacles)
    )
    # goal free-joint velocity dof address
    goal_jnt = model.joint_names.index("goal")
    goal_dadr = model.jnt_dofadr[goal_jnt]
    joint5_dadr = 5  # panda joint indices 0..6 lead the dof vector

    obstacle_starts = jnp.asarray(
        np.array(layout, dtype=np.float64).reshape(num_obstacles, 2),
        dtype=dtype,
    )

    def residual_fn(dyn_model, data, targets):
        # axis=0 reductions keep this lane-safe: arrays may carry trailing
        # lane dims (solver/lanes.py evaluates residuals on (dim, ...L)
        # registers); for unbatched (dim,) inputs the results are identical
        extra = data.qpos.ndim - 1
        goal_pos = data.xpos[goal_body]
        r_goal = jnp.sqrt(
            jnp.sum((goal_pos[:2] - targets[:2]) ** 2, axis=0) + 1e-12
        )
        gvel = data.qvel[goal_dadr : goal_dadr + 2]
        r_vel = jnp.sqrt(jnp.sum(gvel * gvel, axis=0) + 1e-12)
        r_obs = [
            jnp.sqrt(
                jnp.sum(
                    (
                        data.xpos[b][:2]
                        - obstacle_starts[i].reshape((2,) + (1,) * extra)
                    ) ** 2,
                    axis=0,
                ) + 1e-12
            )
            for i, b in enumerate(obstacle_bodies)
        ]
        r_j5 = data.qvel[joint5_dadr]
        ee = data.site_xpos[ee_site]
        r_reach = jnp.sqrt(jnp.sum((ee - goal_pos) ** 2, axis=0) + 1e-12)
        return jnp.stack([r_goal, r_vel, *r_obs, r_j5, r_reach])

    def complete_fn(dyn_model, data, targets):
        dist = jnp.linalg.norm(data.xpos[goal_body][:2] - targets[:2])
        return dist < 0.025, dist

    # state vector: panda joints + goal/obstacle linear dofs (yaml bodies:)
    names = list(model.joint_names[:7])
    for body in ["goal"] + [f"obstacle_{i+1}" for i in range(num_obstacles)]:
        names += [f"{body}_lin_x", f"{body}_lin_y", f"{body}_lin_z"]
    sv = state_vector_from_names(model, names, dtype=dtype)

    ndof = sv.ndof
    nres = 2 + num_obstacles + 2
    level = "ccl" if constrained else {0: "ncl", 3: "lcl", 7: "mcl"}[num_obstacles]
    w = [0.0, 0.2] + [0.1] * num_obstacles + [0.1, 0.01]
    wt = [1000.0, 10.0] + [10.0] * num_obstacles + [0.1, 0.01]
    return Task(
        init_controls_fn=jacobian_ee_init_controls,
        setup_controls_fn=create_init_setup_controls,
        name=f"push_{level}",
        residual_names=(
            "goal_pos", "goal_vel",
            *(f"obstacle_{i+1}_pos" for i in range(num_obstacles)),
            "joint_5_velocity", "reach",
        ),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.array(list(target_xy), dtype=dtype),
        weights=jnp.array(w, dtype=dtype),
        weights_terminal=jnp.array(wt, dtype=dtype),
        # push-ready pose for OUR hand-authored panda kinematics: EE at
        # (0.353, 0, 0.30) with the hand z-axis pointing straight down, so
        # the table-length pusher rod starts clear of table and objects and
        # the straight-line setup approach (EEWayPointsSetup,
        # `PushBaseClass.cpp:8-44`) comes in from the base side.  The
        # reference's startPos [0,-0.183,0,-3.1,0,1.34,0] encodes the same
        # intent for ITS Franka scene XML (unvendored submodule).
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype)
        .at[:7]
        .set(jnp.array([0, -0.5763, 0, -2.7099, 0, 2.1309, 0], dtype=dtype)),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="adaptive_jerk",
            min_N=1,
            max_N=100,
            jerk_thresholds=jnp.concatenate(
                [jnp.full((7,), 10.0, dtype), jnp.ones((ndof - 7,), dtype)]
            ),
            accel_thresholds=jnp.full((ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((ndof,), 0.1, dtype),
        ),
        openloop_horizon=1000,
        mpc_horizon=50,
        scene_robot_start="task",
        scene_generator_fn=_make_push_scene_generator(
            constrained, num_obstacles if not constrained else 3
        ),
    )


# ---------------------------------------------------------------------------
# init controls: EE waypoints + Jacobian-pseudoinverse servo
# ---------------------------------------------------------------------------


def ee_waypoint_path(task: Task, horizon: int, data: Data) -> jnp.ndarray:
    """EEWayPointsPush + CreateAllEETransitPoints (`PushBaseClass.cpp:46-140`):
    straight-line EE path from the current EE position to a point behind the
    goal-object's push line, capped by a max travel speed of 0.1 m/s over
    5/6 of the horizon."""
    model = task.model
    ee_site = model.site_names.index("ee")
    goal_body = model.body_names.index(task.push_object_body)
    ee_start = data.site_xpos[ee_site]
    goal_start = data.xpos[goal_body]
    target = task.residual_targets[:2]

    diff = target - goal_start[:2]
    angle = jnp.arctan2(diff[1], diff[0])
    cyl_r = 0.01
    desired_end_x = target[0] - cyl_r * jnp.cos(angle)
    desired_end_y = jnp.where(
        diff[1] > 0,
        target[1] + cyl_r * jnp.sin(angle),
        target[1] - cyl_r * jnp.sin(angle),
    )
    inter = goal_start[:2]
    max_dist = 0.1 * (5.0 / 6.0) * horizon * model.timestep
    desired = jnp.sqrt(
        (desired_end_x - inter[0]) ** 2 + (desired_end_y - inter[1]) ** 2
    )
    prop = jnp.minimum(max_dist / jnp.maximum(desired, 1e-9), 1.0)
    end_x = inter[0] + (desired_end_x - inter[0]) * prop
    end_y = inter[1] + (desired_end_y - inter[1]) * prop
    end = jnp.array([end_x, end_y, 0.28], dtype=ee_start.dtype)

    # linear interpolation over the horizon (CreateAllEETransitPoints)
    ts = jnp.arange(horizon + 1, dtype=ee_start.dtype)[:, None] / horizon
    return ee_start[None, :] + ts * (end - ee_start)[None, :], angle


def jacobian_ee_init_controls(task: Task, horizon: int,
                              qpos0=None, qvel0=None, targets=None):
    """JacobianEEControl (`PushBaseClass.cpp:139-248`): servo the EE along
    the waypoint path with J^+ forces + gravity compensation, stepping the
    simulator; returns the (H, nu) control tape.  Fully jittable scan; the
    optional (qpos0, qvel0, targets) overrides let campaigns vmap this over
    per-scene starts (the reference builds init controls per trial,
    `GenTestingData.cpp:169-196`)."""
    model = task.model
    if qpos0 is None:
        qpos0 = task.qpos_start
    if qvel0 is None:
        qvel0 = task.qvel_start
    if targets is not None:
        task = task.replace(residual_targets=targets)
    task = task.replace(qpos_start=qpos0, qvel_start=qvel0)
    dtype = model.dtype

    data0 = Data(
        qpos=task.qpos_start,
        qvel=task.qvel_start,
        ctrl=jnp.zeros((model.nu,), dtype),
        time=jnp.zeros((), dtype),
    )
    from ..dynamics.fk import forward_kinematics

    d0 = forward_kinematics(model, data0)
    path, angle = ee_waypoint_path(task, horizon, d0)
    U, _, _ = _servo_along_path(task, path[:horizon], angle, qpos0, qvel0)
    return U


def create_init_setup_controls(task: Task, horizon: int = 1000,
                               qpos0=None, qvel0=None, targets=None):
    """CreateInitSetupControls (`TwoDPushing.cpp:225-258`,
    `SweepMultiple.cpp:188`): servo the EE to a point 0.05 m BEHIND the
    object along the push line at z=0.28 (EEWayPointsSetup,
    `PushBaseClass.cpp:8-44`) over `horizon` steps; the resulting state is
    the optimisation start (the reference copies the post-setup main_data
    into master_reset_data, `main.cpp:360-363`, and the campaigns re-run it
    per loaded scene, `GenTestingData.cpp:200`).

    Returns (U_setup (H, nu), qpos_end, qvel_end)."""
    model = task.model
    if qpos0 is None:
        qpos0 = task.qpos_start
    if qvel0 is None:
        qvel0 = task.qvel_start
    if targets is not None:
        task = task.replace(residual_targets=targets)
    task = task.replace(qpos_start=qpos0, qvel_start=qvel0)
    ee_site = model.site_names.index("ee")
    dtype = model.dtype

    data0 = Data(
        qpos=qpos0, qvel=qvel0, ctrl=jnp.zeros((model.nu,), dtype),
        time=jnp.zeros((), dtype),
    )
    from ..dynamics.fk import forward_kinematics

    d0 = forward_kinematics(model, data0)
    goal_body = model.body_names.index(task.push_object_body)
    ee_start = d0.site_xpos[ee_site]
    obj = d0.xpos[goal_body]
    target = task.residual_targets[:2]
    angle = jnp.arctan2(target[1] - obj[1], target[0] - obj[0])
    end = jnp.stack([
        obj[0] - 0.05 * jnp.cos(angle),
        obj[1] - 0.05 * jnp.sin(angle),
        jnp.asarray(0.28, dtype),
    ])
    ts = jnp.arange(horizon + 1, dtype=dtype)[:, None] / horizon
    path = ee_start[None, :] + ts * (end - ee_start)[None, :]
    return _servo_along_path(task, path[:horizon], angle, qpos0, qvel0)


def _servo_along_path(task: Task, path, angle, qpos0, qvel0):
    """JacobianEEControl core shared by init and setup phases; returns
    (U, qpos_end, qvel_end)."""
    model = task.model
    dtype = model.dtype
    ee_site = model.site_names.index("ee")
    site_body = model.site_bodyid[ee_site]
    gains = jnp.array([100.0, 100.0, 200.0, 80.0, 80.0, 80.0], dtype=dtype)
    a = angle - jnp.pi / 4
    a = jnp.where(a < -jnp.pi / 2, 2 * jnp.pi + a, a)
    x_axis = jnp.stack([jnp.cos(a), jnp.sin(a), jnp.zeros((), dtype)])
    z_axis = jnp.array([0.0, 0.0, -1.0], dtype=dtype)
    y_axis = jnp.cross(z_axis, x_axis)
    desired_quat = tm.mat_to_quat(jnp.stack([x_axis, y_axis, z_axis], axis=1))

    def body(carry, target_point):
        qpos, qvel, dq = carry
        data = Data(
            qpos=qpos, qvel=qvel, ctrl=jnp.zeros((model.nu,), dtype),
            time=jnp.zeros((), dtype),
        )
        data = forward(model, data)
        ee_pos = data.site_xpos[ee_site]
        ee_quat = tm.mat_to_quat(data.site_xmat[ee_site])
        dqs = jnp.where(jnp.dot(ee_quat, dq) < 0, -dq, dq)
        err = jnp.concatenate([
            target_point - ee_pos,
            tm.quat_log(tm.quat_mul(dqs, tm.quat_conj(ee_quat))),
        ])
        mask = model.ancestor_mask[site_body]
        w = data.cdof[:, :3]
        v = data.cdof[:, 3:]
        jacp = (
            v + jnp.cross(w, jnp.broadcast_to(ee_pos, w.shape))
        ) * mask[:, None]
        jac = jnp.concatenate([jacp.T, (w * mask[:, None]).T], axis=0)
        jac_inv = jnp.linalg.pinv(jac[:, :7])
        u = jac_inv @ (gains * err)
        u = u + data.qfrc_bias[:7] / model.actuator_gear[:, 0]
        from ..dynamics.step import advance

        data = advance(model, forward(model, data.replace(ctrl=u)))
        return (data.qpos, data.qvel, dqs), u

    (qp_end, qv_end, _), U = jax.lax.scan(
        body, (qpos0, qvel0, desired_quat), path
    )
    return U, qp_end, qv_end
