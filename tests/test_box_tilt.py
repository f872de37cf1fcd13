"""Tilted-box contact oracles vs MuJoCo (VERDICT round-2 ask #6).

The threeD_push / box-toppling regime lives on tilted box-plane and box-box
edge contacts; these tests pin the fixed SAT+clipping manifold
(dynamics/box_collision.py) and the full constraint pipeline against MuJoCo
at tilted states, plus a long toppling rollout parity check.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from trajoptkp_tpu.dynamics import (forward, load_mjcf_string, make_data)
from trajoptkp_tpu.dynamics.fk import forward_kinematics
from trajoptkp_tpu.dynamics.step import step

pytestmark = pytest.mark.slow

TILT_XML = """
<mujoco><option timestep="0.004"/><worldbody>
<geom name="floor" type="plane" size="3 3 .1"/>
<body name="box" pos="0 0 0.3"><freejoint/>
  <geom type="box" size="0.1 0.08 0.06" mass="0.5"/>
</body>
</worldbody></mujoco>"""

STACK_XML = """
<mujoco><option timestep="0.004"/><worldbody>
<geom name="floor" type="plane" size="3 3 .1"/>
<body name="base" pos="0 0 0.1"><freejoint/>
  <geom type="box" size="0.15 0.15 0.1" mass="2.0"/>
</body>
<body name="top" pos="0 0 0.35"><freejoint/>
  <geom type="box" size="0.06 0.06 0.06" mass="0.2"/>
</body>
</worldbody></mujoco>"""


def _euler_quat(roll, pitch, yaw):
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.array([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ])


def _active_contacts_ours(model, qpos):
    """(dist, pos, normal) rows for penetrating slots at a state."""
    data = make_data(model).replace(qpos=jnp.asarray(qpos))
    data = forward_kinematics(model, data)
    from trajoptkp_tpu.dynamics.collision import pair_contacts
    from trajoptkp_tpu.dynamics.contact import _combine

    rows = []
    for (g1, g2) in model.contact_pairs:
        t1, t2 = model.geom_type[g1], model.geom_type[g2]
        _, _, _, margin = _combine(model, g1, g2)
        dd, pp, ff = pair_contacts(
            t1, t2,
            data.geom_xpos[g1], data.geom_xmat[g1], model.geom_size[g1],
            data.geom_xpos[g2], data.geom_xmat[g2], model.geom_size[g2],
        )
        for k in range(dd.shape[0]):
            if float(dd[k]) < float(margin):
                rows.append((float(dd[k]), np.asarray(pp[k]),
                             np.asarray(ff[k, 0])))
    return rows


def _active_contacts_mj(mjm, mjd, qpos):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos
    mujoco.mj_forward(mjm, mjd)
    return [
        (float(mjd.contact[i].dist), np.array(mjd.contact[i].pos),
         np.array(mjd.contact[i].frame[:3]))
        for i in range(mjd.ncon)
    ]


def _match(ours, mjs, pos_tol, dist_tol):
    """Greedy nearest-position matching; every MuJoCo contact must have a
    counterpart with agreeing position, depth and normal."""
    assert len(ours) >= len(mjs), (len(ours), len(mjs))
    used = set()
    for (dm, pm, nm) in mjs:
        best, bi = None, None
        for i, (do, po, no) in enumerate(ours):
            if i in used:
                continue
            d = np.linalg.norm(po - pm)
            if best is None or d < best:
                best, bi = d, i
        assert best is not None and best < pos_tol, (best, pm)
        used.add(bi)
        do, po, no = ours[bi]
        assert abs(do - dm) < dist_tol, (do, dm)
        assert np.dot(no, nm) > 0.99, (no, nm)


@pytest.mark.parametrize("pitch_deg", [15.0, 30.0, 45.0])
def test_tilted_box_plane_manifold(pitch_deg):
    """Box resting tilted on the plane: the penetrating corner set must
    match MuJoCo's (position/depth/normal)."""
    mjm = mujoco.MjModel.from_xml_string(TILT_XML)
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(TILT_XML)
    pitch = np.deg2rad(pitch_deg)
    # drop the tilted box until first penetration: place the low corner
    # slightly below the floor
    corners = np.array([
        [sx, sy, sz] for sx in (-0.1, 0.1) for sy in (-0.08, 0.08)
        for sz in (-0.06, 0.06)
    ])
    quat = _euler_quat(0.0, pitch, 0.2)
    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, quat)
    R = R.reshape(3, 3)
    zmin = np.min((corners @ R.T)[:, 2])
    qpos = np.concatenate([[0, 0, -zmin - 5e-4], quat])
    ours = _active_contacts_ours(model, qpos)
    mjs = _active_contacts_mj(mjm, mjd, qpos)
    assert len(mjs) >= 1
    _match(ours, mjs, pos_tol=2e-3, dist_tol=2e-4)


def test_box_box_edge_contact_manifold():
    """Top box yawed 45 deg and pitched onto the base box: edge-face
    contact; manifold must agree with MuJoCo."""
    mjm = mujoco.MjModel.from_xml_string(STACK_XML)
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(STACK_XML)
    base_q = np.concatenate([[0, 0, 0.1], [1, 0, 0, 0]])
    quat = _euler_quat(0.0, np.deg2rad(20.0), np.deg2rad(45.0))
    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, quat)
    R = R.reshape(3, 3)
    corners = np.array([
        [sx, sy, sz] for sx in (-0.06, 0.06) for sy in (-0.06, 0.06)
        for sz in (-0.06, 0.06)
    ])
    zmin = np.min((corners @ R.T)[:, 2])
    top_z = 0.2 - zmin - 5e-4  # base top face at z=0.2, slight penetration
    qpos = np.concatenate([base_q, [0, 0, top_z], quat])
    ours = _active_contacts_ours(model, qpos)
    mjs = _active_contacts_mj(mjm, mjd, qpos)
    # keep only base-top contacts from MuJoCo (drop floor-base rows)
    mjs = [c for c in mjs if c[1][2] > 0.15]
    ours = [c for c in ours if c[1][2] > 0.15]
    assert len(mjs) >= 1
    _match(ours, mjs, pos_tol=5e-3, dist_tol=5e-4)


def test_toppling_rollout_parity():
    """150-step toppling rollout (tilted box + angular velocity) vs MuJoCo:
    pose stays within tolerance through the contact-rich fall."""
    mjm = mujoco.MjModel.from_xml_string(TILT_XML)
    mjd = mujoco.MjData(mjm)
    model = load_mjcf_string(TILT_XML)
    quat = _euler_quat(0.0, np.deg2rad(25.0), 0.0)
    qpos0 = np.concatenate([[0, 0, 0.15], quat])
    qvel0 = np.zeros(6)
    qvel0[4] = 1.5  # pitch rate -> topple

    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos0
    mjd.qvel[:] = qvel0
    data = make_data(model).replace(
        qpos=jnp.asarray(qpos0), qvel=jnp.asarray(qvel0)
    )
    step_j = jax.jit(lambda d: step(model, d))
    errs = []
    for t in range(150):
        mujoco.mj_step(mjm, mjd)
        data = step_j(data)
        errs.append(np.max(np.abs(np.asarray(data.qpos) - mjd.qpos)))
    errs = np.array(errs)
    # early horizon tight, full horizon bounded (contact chaos compounds)
    assert errs[:50].max() < 5e-3, errs[:50].max()
    assert errs.max() < 8e-2, errs.max()
    # and the final resting pose agrees
    assert np.max(np.abs(np.asarray(data.qpos)[:3] - mjd.qpos[:3])) < 2e-2
