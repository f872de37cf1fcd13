"""Soft-body (flex particle lattice) tests.

Covers the TPU-native stand-in for the reference's MuJoCo flex soft bodies
(`/root/reference/TaskConfigs/soft_body_manipulation/push_soft.yaml`,
vertex accessors `src/PhysicsSimulators/MuJoCoHelper.cpp:443-557`):
spring-force algebra, momentum conservation, implicit-damping stability,
contact settling, and a full optimiser pass on a small pushing scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.dynamics.fk import forward_kinematics
from trajoptkp_tpu.dynamics.flex import (attach_flex, flex_centroid,
                                         flex_passive_force,
                                         flex_vertex_positions,
                                         flex_vertex_velocities,
                                         lattice_topology, soft_body_xml)
from trajoptkp_tpu.dynamics.mjcf import load_mjcf_string
from trajoptkp_tpu.dynamics.model import Data, make_data
from trajoptkp_tpu.dynamics.step import step
from trajoptkp_tpu.keypoints.methods import KeypointConfig
from trajoptkp_tpu.state.statevector import state_vector_from_names
from trajoptkp_tpu.tasks.base import Task

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)

SHAPE = (2, 2, 2)


def _jelly_model(stiffness=40.0, damping=0.6, with_pusher=False):
    pusher = ""
    if with_pusher:
        pusher = (
            '<body name="piston" pos="-0.08 0.015 0.03">\n'
            '  <joint name="piston" type="slide" axis="1 0 0" damping="2"/>\n'
            '  <geom name="piston" type="box" size="0.02 0.03 0.03" mass="0.5"'
            ' contype="1" conaffinity="3" friction="0.4 0.005 0.0001"/>\n'
            "</body>\n"
            '<actuator><motor name="piston" joint="piston" gear="1"/></actuator>'
        )
        act = pusher[pusher.index("<actuator>"):]
        pusher = pusher[: pusher.index("<actuator>")]
    xml = f"""
<mujoco>
  <option timestep="0.004" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1" contype="1" conaffinity="3"
          friction="0.5 0.005 0.0001"/>
    {soft_body_xml("jelly", (0.0, 0.0, 0.05), shape=SHAPE, spacing=0.03,
                   radius=0.014, total_mass=0.1, damping=0.05)}
    {pusher}
  </worldbody>
  {act if with_pusher else ""}
</mujoco>"""
    model = load_mjcf_string(xml)
    return attach_flex(model, "jelly", SHAPE, stiffness=stiffness,
                       damping=damping)


@pytest.fixture(scope="module")
def jelly():
    return _jelly_model()


def test_lattice_topology_counts():
    coords, edges = lattice_topology((2, 2, 2))
    assert len(coords) == 8
    # cube: 12 axis edges + 12 face diagonals + 4 cube diagonals
    assert len(edges) == 28
    coords, edges = lattice_topology((4, 3, 3))
    assert len(coords) == 36  # push_soft.yaml num_vertices


def test_rest_state_has_zero_spring_force(jelly):
    d = forward_kinematics(jelly, make_data(jelly))
    f = flex_passive_force(jelly, d)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-8)


def test_internal_forces_conserve_momentum(jelly):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    d = make_data(jelly)
    d = d.replace(
        qpos=d.qpos + 0.01 * jax.random.normal(k1, (jelly.nq,)),
        qvel=0.2 * jax.random.normal(k2, (jelly.nv,)),
    )
    d = forward_kinematics(jelly, d)
    f = flex_passive_force(jelly, d)
    # vertices are world-aligned slides: per-axis dof sums = net world force
    for ax in range(3):
        assert abs(float(f[ax::3].sum())) < 1e-10


def test_spring_force_matches_hand_computation():
    # two-vertex chain: stretch one edge by a known amount
    model = _jelly_model(stiffness=40.0, damping=0.0)
    d = make_data(model)
    # move vertex 0 along -x by 5 mm: its x slide is dof of joint jelly_v0_x
    j = model.joint_names.index("jelly_v0_x")
    adr = model.jnt_dofadr[j]
    d = d.replace(qpos=d.qpos.at[model.jnt_qposadr[j]].add(-0.005))
    d = forward_kinematics(model, d)
    f = flex_passive_force(model, d)
    x = flex_vertex_positions(model, d)
    e = np.array(model.flex_edges)
    L0 = np.asarray(model.flex_edge_length0)
    expected = np.zeros((len(x), 3))
    for n, (a, b) in enumerate(e):
        dvec = np.asarray(x[b] - x[a])
        L = np.linalg.norm(dvec)
        mag = 40.0 * (L - L0[n])
        expected[a] += mag * dvec / L
        expected[b] -= mag * dvec / L
    # atol covers the 1e-12 softening inside the engine's edge-length norm
    np.testing.assert_allclose(
        np.asarray(f).reshape(-1, 3), expected, atol=1e-7
    )


def test_implicit_damping_stable_when_explicit_would_explode():
    # c*dt/m >> 2 per vertex: explicit integration of these dampers diverges;
    # the linearly-implicit diagonal treatment must stay bounded
    model = _jelly_model(stiffness=40.0, damping=5.0)
    d = make_data(model)
    stepj = jax.jit(step)
    for _ in range(200):
        d = stepj(model, d)
    assert bool(jnp.all(jnp.isfinite(d.qpos)))
    assert float(jnp.max(jnp.abs(d.qvel))) < 1.0


def test_jelly_settles_on_floor(jelly):
    d = make_data(jelly)
    stepj = jax.jit(step)
    for _ in range(400):
        d = stepj(jelly, d)
    d = forward_kinematics(jelly, d)
    x = np.asarray(flex_vertex_positions(jelly, d))
    v = np.asarray(flex_vertex_velocities(jelly, d))
    assert x[:, 2].min() > 0.012           # resting on sphere radius, no sink
    assert np.abs(v).max() < 1e-3          # at rest
    # lattice keeps its shape: edge lengths near rest
    e = np.array(jelly.flex_edges)
    L = np.linalg.norm(x[e[:, 1]] - x[e[:, 0]], axis=1)
    np.testing.assert_allclose(L, np.asarray(jelly.flex_edge_length0),
                               rtol=0.15)


def _piston_push_soft_task():
    """Tiny PushSoft analogue: piston pushes the jelly along +x."""
    model = _jelly_model(stiffness=40.0, damping=0.6, with_pusher=True)
    vert_bodies = np.array(model.flex_vertbodyid)
    dtype = model.dtype
    target = jnp.array([0.06, 0.015], dtype=dtype)

    def residual_fn(dyn_model, data, targets):
        c = jnp.mean(data.xipos[vert_bodies][:, :2], axis=0)
        return jnp.concatenate([c - targets[:2], data.qvel[:1]])

    names = ["piston"] + [
        f"jelly_v{n}_{ax}" for n in range(len(vert_bodies))
        for ax in ("x", "y", "z")
    ]
    sv = state_vector_from_names(model, names, dtype=dtype)
    return Task(
        name="piston_push_soft",
        residual_names=("cx", "cy", "piston_vel"),
        residual_fn=residual_fn,
        model=model,
        sv=sv,
        residual_targets=target,
        weights=jnp.array([1.0, 1.0, 0.001], dtype=dtype),
        weights_terminal=jnp.array([100.0, 100.0, 0.0], dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval", min_N=5, max_N=5,
            jerk_thresholds=jnp.full((sv.ndof,), 0.01, dtype),
            accel_thresholds=jnp.full((sv.ndof,), 10.0, dtype),
            velocity_change_thresholds=jnp.full((sv.ndof,), 0.1, dtype),
        ),
        openloop_horizon=60,
        mpc_horizon=20,
    )


def test_ilqr_pushes_soft_body():
    from trajoptkp_tpu.solver import ilqr as il

    task = _piston_push_soft_task()
    H = 60
    # contact-making init controls (the reference seeds pushing tasks the same
    # way via the Jacobian EE servo — with a no-contact nominal, FD dynamics
    # carry no object coupling and iLQR has no gradient to follow)
    U0 = jnp.full((H, task.model.nu), 1.5, task.model.dtype)
    cfg = il.ILQRConfig(max_iterations=8, min_iterations=2)
    traj, stats = il.optimise(task, task.qpos_start, task.qvel_start, U0, cfg)
    assert stats.final_cost < 0.6 * stats.initial_cost
    # jelly actually moved toward the target
    d = Data(
        qpos=traj.qpos[-1],
        qvel=traj.qvel[-1],
        ctrl=jnp.zeros((task.model.nu,), task.model.dtype),
        time=jnp.zeros((), task.model.dtype),
    )
    d = forward_kinematics(task.model, d)
    c_end = float(flex_centroid(task.model, d)[0])
    assert c_end > 0.02  # started at 0.015


def test_push_soft_scene_builds():
    """Full panda push_soft scene constructs with correct inventory
    (36 vertices per push_soft.yaml; 48 for the into_rigid variant)."""
    from trajoptkp_tpu.tasks.soft import make_push_soft

    task = make_push_soft(into_rigid=False)
    assert len(task.model.flex_vertbodyid) == 36
    assert task.sv.ndof == 7 + 36 * 3
    r = task.residual_fn(
        task.model,
        forward_kinematics(
            task.model,
            Data(
                qpos=task.qpos_start, qvel=task.qvel_start,
                ctrl=jnp.zeros((task.model.nu,), task.model.dtype),
                time=jnp.zeros((), task.model.dtype),
            ),
        ),
        task.residual_targets,
    )
    assert r.shape == (task.nres,)
    assert bool(jnp.all(jnp.isfinite(r)))
