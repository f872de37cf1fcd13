"""MJCF model loading for the TPU engine.

The reference links against full MuJoCo to parse MJCF and build mjModel
(`/root/reference/src/PhysicsSimulators/MuJoCoHelper.cpp:877-923`).  Here MJCF
parsing is a *host-side setup step only*: we use the installed CPU `mujoco`
wheel purely as a compiler front-end (XML -> mjModel arrays) and translate the
result into our own jnp `Model` pytree; every compute-path operation is our
JAX code.  A pure-python fallback parser can slot in behind the same API if
mujoco is unavailable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .model import (BALL, FREE, GEOM_PLANE, HINGE, SLIDE, Model, _path_dofs,
                    dof_width)

_SUPPORTED_JOINTS = {0: FREE, 1: BALL, 2: SLIDE, 3: HINGE}  # mjtJoint values


def _names(mj, adr_list, count):
    out = []
    for i in range(count):
        adr = adr_list[i]
        end = mj.names.find(b"\x00", adr)
        out.append(mj.names[adr:end].decode())
    return tuple(out)


def _candidate_pairs(mj) -> tuple:
    """Host-side broad phase: enumerate geom pairs MuJoCo would consider.

    Mirrors MuJoCo's default collision filtering: same-body and
    parent-child pairs excluded, contype/conaffinity bitmasks respected.
    """
    pairs = []
    nbody = mj.nbody
    parent = mj.body_parentid
    # weldid-based exclusion: bodies welded together never collide
    for g1 in range(mj.ngeom):
        for g2 in range(g1 + 1, mj.ngeom):
            b1, b2 = mj.geom_bodyid[g1], mj.geom_bodyid[g2]
            if b1 == b2:
                continue
            w1, w2 = mj.body_weldid[b1], mj.body_weldid[b2]
            if w1 == w2:
                continue
            # parent-child filter (applies unless one is world)
            pw1, pw2 = mj.body_weldid[parent[b1]], mj.body_weldid[parent[b2]]
            if (pw1 == w2 and b2 != 0) or (pw2 == w1 and b1 != 0):
                continue
            t1, a1 = mj.geom_contype[g1], mj.geom_conaffinity[g1]
            t2, a2 = mj.geom_contype[g2], mj.geom_conaffinity[g2]
            if not ((t1 & a2) or (t2 & a1)):
                continue
            # order: put plane first for the narrow-phase dispatcher
            if mj.geom_type[g2] == GEOM_PLANE and mj.geom_type[g1] != GEOM_PLANE:
                pairs.append((g2, g1))
            else:
                pairs.append((g1, g2))
    return tuple(pairs)


def from_mj(mj, dtype=jnp.float64) -> Model:
    """Translate a compiled mujoco.MjModel into our Model pytree."""
    njnt = mj.njnt
    jnt_type = tuple(_SUPPORTED_JOINTS[int(t)] for t in mj.jnt_type)

    anc, prefix = _path_dofs(
        tuple(int(b) for b in mj.body_parentid),
        tuple(int(b) for b in mj.jnt_bodyid),
        tuple(int(a) for a in mj.jnt_dofadr),
        jnt_type,
        mj.nbody,
        mj.nv,
    )

    def arr(x):
        return jnp.asarray(np.array(x), dtype=dtype)

    # actuators: joint-transmission motors with full gear rows (a motor on a
    # free/ball joint maps gear components onto the joint's dof span)
    trnid = tuple(int(mj.actuator_trnid[a, 0]) for a in range(mj.nu))
    gear = np.array(mj.actuator_gear)  # (nu, 6)

    return Model(
        nq=mj.nq,
        nv=mj.nv,
        nu=mj.nu,
        nbody=mj.nbody,
        njnt=njnt,
        ngeom=mj.ngeom,
        nsite=mj.nsite,
        body_parent=tuple(int(b) for b in mj.body_parentid),
        jnt_type=jnt_type,
        jnt_bodyid=tuple(int(b) for b in mj.jnt_bodyid),
        jnt_qposadr=tuple(int(a) for a in mj.jnt_qposadr),
        jnt_dofadr=tuple(int(a) for a in mj.jnt_dofadr),
        jnt_limited=tuple(bool(l) for l in mj.jnt_limited),
        actuator_trnid=trnid,
        actuator_ctrllimited=tuple(bool(l) for l in mj.actuator_ctrllimited),
        geom_type=tuple(int(t) for t in mj.geom_type),
        geom_bodyid=tuple(int(b) for b in mj.geom_bodyid),
        site_bodyid=tuple(int(b) for b in mj.site_bodyid),
        contact_pairs=_candidate_pairs(mj),
        joint_names=_names(mj, mj.name_jntadr, njnt),
        body_names=_names(mj, mj.name_bodyadr, mj.nbody),
        actuator_names=_names(mj, mj.name_actuatoradr, mj.nu),
        geom_names=_names(mj, mj.name_geomadr, mj.ngeom),
        site_names=_names(mj, mj.name_siteadr, mj.nsite),
        integrator={0: "euler", 1: "rk4", 2: "implicit", 3: "implicitfast"}[
            int(mj.opt.integrator)
        ],
        qpos0=arr(mj.qpos0),
        qpos_spring=arr(mj.qpos_spring),
        body_pos=arr(mj.body_pos),
        body_quat=arr(mj.body_quat),
        body_ipos=arr(mj.body_ipos),
        body_iquat=arr(mj.body_iquat),
        body_mass=arr(mj.body_mass),
        body_inertia=arr(mj.body_inertia),
        jnt_pos=arr(mj.jnt_pos),
        jnt_axis=arr(mj.jnt_axis),
        jnt_range=arr(mj.jnt_range),
        jnt_stiffness=arr(mj.jnt_stiffness),
        jnt_solref=arr(mj.jnt_solref),
        jnt_solimp=arr(mj.jnt_solimp),
        jnt_margin=arr(mj.jnt_margin),
        dof_damping=arr(mj.dof_damping),
        dof_armature=arr(mj.dof_armature),
        dof_frictionloss=arr(mj.dof_frictionloss),
        dof_invweight0=arr(mj.dof_invweight0),
        body_invweight0=arr(mj.body_invweight0),
        actuator_gear=arr(gear),
        actuator_ctrlrange=arr(mj.actuator_ctrlrange),
        actuator_forcerange=arr(mj.actuator_forcerange),
        geom_pos=arr(mj.geom_pos),
        geom_quat=arr(mj.geom_quat),
        geom_size=arr(mj.geom_size),
        geom_friction=arr(mj.geom_friction),
        geom_solref=arr(mj.geom_solref),
        geom_solimp=arr(mj.geom_solimp),
        geom_margin=arr(mj.geom_margin),
        site_pos=arr(mj.site_pos),
        site_quat=arr(mj.site_quat),
        gravity=arr(mj.opt.gravity),
        timestep=arr(mj.opt.timestep),
        ancestor_mask=arr(anc),
        dof_dot_mask=arr(prefix),
    )


def load_mjcf(path: str, dtype=jnp.float64, timestep: Optional[float] = None) -> Model:
    import mujoco

    mj = mujoco.MjModel.from_xml_path(path)
    if timestep is not None:
        mj.opt.timestep = timestep
    return from_mj(mj, dtype=dtype).replace(
        source_xml=open(path).read()
    )


def load_mjcf_string(xml: str, dtype=jnp.float64) -> Model:
    import mujoco

    mj = mujoco.MjModel.from_xml_string(xml)
    return from_mj(mj, dtype=dtype).replace(source_xml=xml)
