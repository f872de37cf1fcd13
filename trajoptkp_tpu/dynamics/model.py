"""Model / Data containers for the TPU-native rigid-body dynamics engine.

TPU-native replacement for the reference's MuJoCo dependency
(`/root/reference/src/PhysicsSimulators/MuJoCoHelper.cpp`): instead of wrapping
`mjModel`/`mjData`, physics is a pure function of two pytrees:

  - ``Model``: immutable description of the mechanism (masses, joints, geoms,
    actuators).  Structure-defining fields (joint types, addresses, tree
    topology) are *static* Python tuples so they can steer trace-time control
    flow; numeric parameters are traced jnp arrays so one compiled executable
    serves any parameter values of the same topology.
  - ``Data``: the dynamic state (qpos, qvel) plus cached forward-kinematics
    products, replacing the reference's `mjData` snapshot lists
    (`include/MuJoCoHelper.h:118-123`) with ordinary stacked arrays.

Conventions are MuJoCo-compatible (quaternions wxyz, free-joint linear
velocity in world frame, free/ball angular velocity in child-body frame) so
the CPU MuJoCo build acts as a numerical oracle in tests.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# Joint types (match mujoco's mjtJoint for easy translation)
FREE = 0
BALL = 1
SLIDE = 2
HINGE = 3

# Geom types we support for collision (mjtGeom values)
GEOM_PLANE = 0
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_BOX = 6
GEOM_MESH = 7

_QPOS_WIDTH = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
_DOF_WIDTH = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}


def qpos_width(jnt_type: int) -> int:
    return _QPOS_WIDTH[jnt_type]


def dof_width(jnt_type: int) -> int:
    return _DOF_WIDTH[jnt_type]


@struct.dataclass
class Model:
    """Static mechanism description.  See module docstring for conventions."""

    # ---- static structure (hashable tuples; steer trace-time control flow)
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    njnt: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)
    nsite: int = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False)
    # actuator transmission: joint id each actuator drives (motor on joint)
    actuator_trnid: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_ctrllimited: Tuple[bool, ...] = struct.field(pytree_node=False)
    geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
    site_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
    # enabled candidate contact pairs ((geom1, geom2), ...) — precomputed on host
    contact_pairs: Tuple[Tuple[int, int], ...] = struct.field(pytree_node=False)
    # name → index maps (host-side convenience; not traced)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    actuator_names: Tuple[str, ...] = struct.field(pytree_node=False)
    geom_names: Tuple[str, ...] = struct.field(pytree_node=False)
    site_names: Tuple[str, ...] = struct.field(pytree_node=False)
    integrator: str = struct.field(pytree_node=False, default="euler")
    # ---- soft body ("flex") particle lattice — empty when unused.
    # The reference's soft bodies are MuJoCo flex objects
    # (`/root/reference/TaskConfigs/soft_body_manipulation/push_soft.yaml:31-36`,
    # plugin loading `src/ModelTranslator/ModelTranslator.cpp:80-86`).  Here a
    # soft body is a lattice of particle bodies (3 slide dofs each, sphere
    # collision geoms) coupled by edge spring-dampers evaluated in
    # `flex.flex_passive_force` — pure array math, no plugin.
    flex_vertbodyid: Tuple[int, ...] = struct.field(
        pytree_node=False, default=()
    )
    flex_edges: Tuple[Tuple[int, int], ...] = struct.field(
        pytree_node=False, default=()
    )
    # original MJCF source (host-side convenience; lets the replay viewer
    # rebuild a mujoco.MjModel of the same scene, viz/replay.py)
    source_xml: Optional[str] = struct.field(pytree_node=False, default=None)

    # ---- traced numeric parameters
    qpos0: jnp.ndarray = None            # (nq,) reference configuration
    qpos_spring: jnp.ndarray = None      # (nq,) spring reference configuration
    body_pos: jnp.ndarray = None         # (nbody, 3) frame offset from parent
    body_quat: jnp.ndarray = None        # (nbody, 4)
    body_ipos: jnp.ndarray = None        # (nbody, 3) CoM in body frame
    body_iquat: jnp.ndarray = None       # (nbody, 4) principal-axes rotation
    body_mass: jnp.ndarray = None        # (nbody,)
    body_inertia: jnp.ndarray = None     # (nbody, 3) principal moments
    jnt_pos: jnp.ndarray = None          # (njnt, 3) anchor in body frame
    jnt_axis: jnp.ndarray = None         # (njnt, 3)
    jnt_range: jnp.ndarray = None        # (njnt, 2)
    jnt_stiffness: jnp.ndarray = None    # (njnt,)
    jnt_solref: jnp.ndarray = None       # (njnt, 2) limit constraint solref
    jnt_solimp: jnp.ndarray = None       # (njnt, 5)
    jnt_margin: jnp.ndarray = None       # (njnt,)
    dof_damping: jnp.ndarray = None      # (nv,)
    dof_armature: jnp.ndarray = None     # (nv,)
    dof_frictionloss: jnp.ndarray = None # (nv,)
    dof_invweight0: jnp.ndarray = None   # (nv,) diag inverse inertia at qpos0
    body_invweight0: jnp.ndarray = None  # (nbody, 2) translation/rotation inverse weight at qpos0
    actuator_gear: jnp.ndarray = None    # (nu, 6) gear over the joint's dof span
    actuator_ctrlrange: jnp.ndarray = None  # (nu, 2)
    actuator_forcerange: jnp.ndarray = None  # (nu, 2) (+-inf if unlimited)
    geom_pos: jnp.ndarray = None         # (ngeom, 3)
    geom_quat: jnp.ndarray = None        # (ngeom, 4)
    geom_size: jnp.ndarray = None        # (ngeom, 3)
    geom_friction: jnp.ndarray = None    # (ngeom, 3) slide/torsion/roll
    geom_solref: jnp.ndarray = None      # (ngeom, 2)
    geom_solimp: jnp.ndarray = None      # (ngeom, 5)
    geom_margin: jnp.ndarray = None      # (ngeom,)
    site_pos: jnp.ndarray = None         # (nsite, 3)
    site_quat: jnp.ndarray = None        # (nsite, 4)
    gravity: jnp.ndarray = None          # (3,)
    timestep: jnp.ndarray = None         # ()
    # ---- precomputed topology masks (traced floats; used in einsum math)
    ancestor_mask: jnp.ndarray = None    # (nbody, nv) 1.0 if dof on root-path of body
    dof_dot_mask: jnp.ndarray = None  # (nv, nv) [i, j] = 1.0 if dof j strictly precedes dof i
    # ---- soft-body traced parameters (None when flex_vertbodyid is empty)
    flex_edge_length0: jnp.ndarray = None   # (nedge,) rest lengths
    flex_edge_stiffness: jnp.ndarray = None # (nedge,)
    flex_edge_damping: jnp.ndarray = None   # (nedge,)

    @property
    def dtype(self):
        return self.body_pos.dtype


@struct.dataclass
class Data:
    """Dynamic state + forward-kinematics cache (the `mjData` analogue)."""

    qpos: jnp.ndarray                    # (nq,)
    qvel: jnp.ndarray                    # (nv,)
    ctrl: jnp.ndarray                    # (nu,)
    time: jnp.ndarray                    # ()
    # FK products (filled by fk.forward_kinematics)
    xpos: jnp.ndarray = None             # (nbody, 3) body frame origins, world
    xquat: jnp.ndarray = None            # (nbody, 4)
    xipos: jnp.ndarray = None            # (nbody, 3) body CoM, world
    ximat: jnp.ndarray = None            # (nbody, 3, 3) inertial frame rotation
    site_xpos: jnp.ndarray = None        # (nsite, 3)
    site_xmat: jnp.ndarray = None        # (nsite, 3, 3)
    geom_xpos: jnp.ndarray = None        # (ngeom, 3)
    geom_xmat: jnp.ndarray = None        # (ngeom, 3, 3)
    cdof: jnp.ndarray = None             # (nv, 6) world-frame motion subspace
    cinert: jnp.ndarray = None           # (nbody, 6, 6) world spatial inertia about origin
    # dynamics products (filled by forward())
    qfrc_bias: jnp.ndarray = None        # (nv,) coriolis + gravity
    qfrc_passive: jnp.ndarray = None     # (nv,) springs + dampers
    qfrc_actuator: jnp.ndarray = None    # (nv,)
    qfrc_constraint: jnp.ndarray = None  # (nv,) contact + limit forces
    qM: jnp.ndarray = None               # (nv, nv) mass matrix
    qacc: jnp.ndarray = None             # (nv,)
    # constraint-solver warmstart: previous step's (qacc - qacc_smooth) delta
    # (the qacc_warmstart analogue, `MuJoCoHelper.cpp:732-741` copies it per
    # FD data replica).  None = cold start (x0 = qacc_smooth, more Newton
    # iterations); set by the rollout/line-search scans for a ~2x step cost cut.
    warmstart: jnp.ndarray = None        # (nv,)


def make_data(model: Model, dtype=None) -> Data:
    """Fresh Data at the model reference configuration (mj_makeData analogue)."""
    dtype = dtype or model.dtype
    return Data(
        qpos=jnp.asarray(model.qpos0, dtype=dtype),
        qvel=jnp.zeros((model.nv,), dtype=dtype),
        ctrl=jnp.zeros((model.nu,), dtype=dtype),
        time=jnp.zeros((), dtype=dtype),
    )


def _path_dofs(body_parent, jnt_bodyid, jnt_dofadr, jnt_type, nbody, nv):
    """Host-side: ancestor and cdofdot masks for the einsum algorithms.

    ``anc[b, i]``: dof i lies on the root path of body b (its own dofs incl.).

    ``dotmask[i, j]``: dof j's velocity contributes to d/dt(cdof_i):
      - hinge/slide dof i: strictly-preceding dofs on the path (rotating the
        parent chain moves i's axis; own rotation does not).
      - ball / free-rotation dof i: the axis columns are *body-fixed*, so the
        full body twist applies — all path dofs including the joint's own
        rotational dofs.
      - free-translation dof i: world-fixed axes, derivative is zero.
    """
    body_dofs = [[] for _ in range(nbody)]
    for j, b in enumerate(jnt_bodyid):
        w = dof_width(jnt_type[j])
        body_dofs[b].extend(range(jnt_dofadr[j], jnt_dofadr[j] + w))
    anc = np.zeros((nbody, nv), dtype=np.float64)
    for b in range(nbody):
        chain = []
        cur = b
        while cur != 0:  # body 0 is world
            chain.extend(body_dofs[cur])
            cur = body_parent[cur]
        anc[b, chain] = 1.0
    dotmask = np.zeros((nv, nv), dtype=np.float64)
    for j, b in enumerate(jnt_bodyid):
        jt = jnt_type[j]
        dadr = jnt_dofadr[j]
        own = sorted(body_dofs[b])
        if jt in (HINGE, SLIDE):
            i = dadr
            dotmask[i] = anc[b]
            for later in own[own.index(i):]:
                dotmask[i, later] = 0.0
        elif jt == BALL:
            for k in range(3):
                i = dadr + k
                dotmask[i] = anc[b]
                # exclude same-body dofs declared after this joint
                for later in own[own.index(dadr + 2) + 1:]:
                    dotmask[i, later] = 0.0
        elif jt == FREE:
            # translation dofs: zero mask; rotation dofs: full body path
            for k in range(3):
                dotmask[dadr + 3 + k] = anc[b]
    return anc, dotmask
