"""Soft bodies as particle lattices with edge spring-dampers.

TPU-native replacement for the reference's MuJoCo *flex* soft bodies: the
reference loads an elasticity plugin and treats each flex vertex as three
slide dofs in the optimiser state (`/root/reference/src/ModelTranslator/
ModelTranslator.cpp:80-86` plugin loading; vertex get/set
`src/PhysicsSimulators/MuJoCoHelper.cpp:443-557`; per-vertex state entries
`include/StdInclude.h:51-80`).

Here the same structure is explicit and XLA-friendly:

  - each vertex is a body with 3 world-aligned slide joints and a sphere
    collision geom (so the existing contact pipeline handles vertex-table /
    vertex-pusher / vertex-rigid-object contact with no new code);
  - the elastic coupling is a static edge list with per-edge rest length,
    stiffness and damping; `flex_passive_force` evaluates every edge in one
    batched gather/scatter — the hot path stays a handful of fused einsums
    regardless of vertex count.

The generalized-force mapping goes through the body Jacobian (ancestor mask x
cdof), so the same code remains correct if a lattice is ever attached to an
articulated parent rather than the world.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .model import Data, Model


# ---------------------------------------------------------------------------
# Lattice construction (host-side, trace-time)
# ---------------------------------------------------------------------------


def lattice_topology(shape: Tuple[int, int, int]):
    """Vertex grid coordinates and edge list for an (nx, ny, nz) lattice.

    Edges connect every vertex pair within Chebyshev distance 1 (26-neighbour
    stencil): axis edges give stretch stiffness, face/cube diagonals give
    shear stability — the standard mass-spring discretisation of an elastic
    block (the role of the reference's flex elasticity plugin).
    """
    nx, ny, nz = shape
    coords = [(i, j, k) for i in range(nx) for j in range(ny) for k in range(nz)]
    index = {c: n for n, c in enumerate(coords)}
    edges: List[Tuple[int, int]] = []
    for (i, j, k) in coords:
        a = index[(i, j, k)]
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    if (di, dj, dk) == (0, 0, 0):
                        continue
                    nb = (i + di, j + dj, k + dk)
                    if nb in index and index[nb] > a:
                        edges.append((a, index[nb]))
    return coords, tuple(edges)


def soft_body_xml(
    name: str,
    pos: Tuple[float, float, float],
    shape: Tuple[int, int, int] = (4, 3, 3),
    spacing: float = 0.03,
    radius: float = 0.014,
    total_mass: float = 0.1,
    damping: float = 0.05,
    friction: str = "0.5 0.005 0.0001",
    rgba: str = "1 0.6 0 1",
    contype: int = 2,
    conaffinity: int = 1,
) -> str:
    """MJCF snippet: one <body> per vertex, 3 slides + sphere geom each.

    contype=2/conaffinity=1 vs. rigid geoms' 1/1 disables vertex-vertex
    collision (edge springs handle self-penetration) while keeping
    vertex-rigid contact — mirroring flexes' default self-collision-off.
    """
    coords, _ = lattice_topology(shape)
    m = total_mass / len(coords)
    out = []
    for n, (i, j, k) in enumerate(coords):
        x = pos[0] + i * spacing
        y = pos[1] + j * spacing
        z = pos[2] + k * spacing
        out.append(
            f'<body name="{name}_v{n}" pos="{x} {y} {z}">\n'
            f'  <joint name="{name}_v{n}_x" type="slide" axis="1 0 0" '
            f'damping="{damping}" armature="0"/>\n'
            f'  <joint name="{name}_v{n}_y" type="slide" axis="0 1 0" '
            f'damping="{damping}" armature="0"/>\n'
            f'  <joint name="{name}_v{n}_z" type="slide" axis="0 0 1" '
            f'damping="{damping}" armature="0"/>\n'
            f'  <geom name="{name}_v{n}" type="sphere" size="{radius}" '
            f'mass="{m}" contype="{contype}" conaffinity="{conaffinity}" '
            f'friction="{friction}" rgba="{rgba}"/>\n'
            f"</body>"
        )
    return "\n".join(out)


def attach_flex(
    model: Model,
    name: str,
    shape: Tuple[int, int, int],
    stiffness: float = 30.0,
    damping: float = 0.5,
) -> Model:
    """Register the lattice's edge constraints on a loaded Model.

    Rest lengths come from the compiled vertex body positions (vertices are
    world children whose slide joints are zero at qpos0, so world position =
    body_pos).
    """
    coords, edges = lattice_topology(shape)
    vert_ids = tuple(
        model.body_names.index(f"{name}_v{n}") for n in range(len(coords))
    )
    bp = np.asarray(model.body_pos)
    xyz = bp[list(vert_ids)]
    e = np.array(edges)
    rest = np.linalg.norm(xyz[e[:, 1]] - xyz[e[:, 0]], axis=1)
    dtype = model.dtype
    prev_ids = tuple(model.flex_vertbodyid)
    prev_edges = tuple(model.flex_edges)
    off = len(prev_ids)
    new_edges = prev_edges + tuple((a + off, b + off) for a, b in edges)
    cat = lambda old, new: (
        jnp.concatenate([old, new]) if old is not None else new
    )
    return model.replace(
        flex_vertbodyid=prev_ids + vert_ids,
        flex_edges=new_edges,
        flex_edge_length0=cat(
            model.flex_edge_length0, jnp.asarray(rest, dtype=dtype)
        ),
        flex_edge_stiffness=cat(
            model.flex_edge_stiffness,
            jnp.full((len(edges),), stiffness, dtype=dtype),
        ),
        flex_edge_damping=cat(
            model.flex_edge_damping,
            jnp.full((len(edges),), damping, dtype=dtype),
        ),
    )


# ---------------------------------------------------------------------------
# Runtime force evaluation (traced)
# ---------------------------------------------------------------------------


def flex_vertex_positions(model: Model, data: Data) -> jnp.ndarray:
    """(nvert, 3) world vertex positions (body CoM of each particle)."""
    vb = np.array(model.flex_vertbodyid)
    return data.xipos[vb]


def flex_vertex_velocities(model: Model, data: Data) -> jnp.ndarray:
    """(nvert, 3) world vertex linear velocities from body spatial velocity."""
    vb = np.array(model.flex_vertbodyid)
    cdof_v = data.cdof * data.qvel[:, None]              # (nv, 6)
    cvel = model.ancestor_mask[vb] @ cdof_v              # (nvert, 6) [ang; lin]
    x = data.xipos[vb]
    return cvel[:, 3:] + jnp.cross(cvel[:, :3], x)


def flex_passive_force(model: Model, data: Data) -> jnp.ndarray:
    """Generalized spring-damper force of all flex edges ((nv,)).

    Per edge (i, j):  f = [k (|d| - L0) + c (v_rel . d̂)] d̂ applied to i,
    reaction on j — momentum-conserving internal forces, batched over the
    whole edge list.
    """
    vb = np.array(model.flex_vertbodyid)
    e = np.array(model.flex_edges)
    x = data.xipos[vb]                                    # (nvert, 3)
    v = flex_vertex_velocities(model, data)

    d = x[e[:, 1]] - x[e[:, 0]]                           # (nedge, 3)
    L = jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-12)
    dhat = d / L[:, None]
    vrel = v[e[:, 1]] - v[e[:, 0]]
    mag = (
        model.flex_edge_stiffness * (L - model.flex_edge_length0)
        + model.flex_edge_damping * jnp.sum(vrel * dhat, axis=1)
    )
    f_edge = mag[:, None] * dhat                          # force on vertex e0
    F = (
        jnp.zeros((len(vb), 3), dtype=x.dtype)
        .at[e[:, 0]].add(f_edge)
        .at[e[:, 1]].add(-f_edge)
    )
    # map world CoM forces to generalized forces via the body Jacobian
    wrench = jnp.zeros((model.nbody, 6), dtype=x.dtype)
    wrench = wrench.at[vb, :3].add(jnp.cross(x, F))       # torque about origin
    wrench = wrench.at[vb, 3:].add(F)
    return jnp.einsum(
        "bi,if,bf->i", model.ancestor_mask, data.cdof, wrench
    )


def flex_damping_diag(model: Model, data: Data) -> jnp.ndarray:
    """(nv,) diagonal bound of the flex damping matrix J^T C J.

    Edge dampers are stiff relative to the tiny per-vertex masses, so the
    integrator treats them *linearly implicitly* (like MuJoCo's implicit
    joint damping in mj_Euler): the explicit damping force is kept in the
    rhs and this diagonal enters the (M + h D) solve, which is exactly the
    first-order Taylor treatment f(v') ~= f(v) - D (v' - v).  The diagonal
    uses the bound |d̂ . j_i|^2 <= |j_i|^2 per incident edge.
    """
    e = np.array(model.flex_edges)
    vb = np.array(model.flex_vertbodyid)
    nvert = len(vb)
    # per-vertex sum of incident damping (host-static scatter pattern)
    cdamp = (
        jnp.zeros((nvert,), dtype=data.qpos.dtype)
        .at[e[:, 0]].add(model.flex_edge_damping)
        .at[e[:, 1]].add(model.flex_edge_damping)
    )
    # |translational jacobian row|^2 of each vertex point wrt each dof
    x = data.xipos[vb]                                    # (nvert, 3)
    w = data.cdof[None, :, :3]                            # (1, nv, 3)
    v = data.cdof[None, :, 3:]
    jac = (v + jnp.cross(w, x[:, None, :])) * model.ancestor_mask[vb][:, :, None]
    return jnp.einsum("p,pid->i", cdamp, jac * jac)


def flex_centroid(model: Model, data: Data) -> jnp.ndarray:
    """(3,) mean vertex position — the soft body's tracked pose."""
    return jnp.mean(flex_vertex_positions(model, data), axis=0)
