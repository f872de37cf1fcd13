"""Offline scene renderer: headless replacement for the reference Visualiser.

The reference renders live via GLFW + mjv/mjr and records PNG sequences with
pngwriter (`/root/reference/src/Visualiser/Visualiser.cpp:233-294`).  TPU
hosts are headless, so this module renders trajectory replays offline with
matplotlib 3D primitives from the engine's own FK — no GL stack needed —
and writes the same artefact (a PNG frame sequence, assemblable into video).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..dynamics.fk import forward_kinematics
from ..dynamics.model import (GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER,
                              GEOM_PLANE, GEOM_SPHERE, Data, Model)


def _draw_geom(ax, gtype, pos, mat, size, color):
    import matplotlib.pyplot as plt  # noqa: F401

    if gtype == GEOM_PLANE:
        xx, yy = np.meshgrid(np.linspace(-1.5, 1.5, 2), np.linspace(-1.5, 1.5, 2))
        ax.plot_surface(xx + pos[0], yy + pos[1],
                        np.full_like(xx, pos[2]), alpha=0.15, color="gray")
    elif gtype == GEOM_SPHERE:
        u, v = np.mgrid[0 : 2 * np.pi : 12j, 0 : np.pi : 8j]
        r = size[0]
        ax.plot_surface(
            pos[0] + r * np.cos(u) * np.sin(v),
            pos[1] + r * np.sin(u) * np.sin(v),
            pos[2] + r * np.cos(v),
            color=color, alpha=0.8,
        )
    elif gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
        r, hl = size[0], size[1]
        axis = mat[:, 2]
        p0, p1 = pos - axis * hl, pos + axis * hl
        ax.plot([p0[0], p1[0]], [p0[1], p1[1]], [p0[2], p1[2]],
                linewidth=max(1.0, r * 250), color=color,
                solid_capstyle="round", alpha=0.9)
    elif gtype == GEOM_BOX:
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        ) * size
        world = corners @ mat.T + pos
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
                 (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            ax.plot(*zip(world[a], world[b]), color=color, alpha=0.9)


def render_frame(model: Model, qpos, out_path: Optional[str] = None,
                 ax=None, title: str = ""):
    """Render one configuration; returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = Data(
        qpos=jnp.asarray(qpos),
        qvel=jnp.zeros((model.nv,), model.dtype),
        ctrl=jnp.zeros((model.nu,), model.dtype),
        time=jnp.zeros((), model.dtype),
    )
    data = forward_kinematics(model, data)
    gx = np.asarray(data.geom_xpos)
    gm = np.asarray(data.geom_xmat)
    sizes = np.asarray(model.geom_size)

    own_fig = ax is None
    if own_fig:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
    else:
        fig = ax.figure
    colors = ["tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple",
              "tab:brown", "tab:pink", "tab:olive", "tab:cyan"]
    for g in range(model.ngeom):
        _draw_geom(
            ax, model.geom_type[g], gx[g], gm[g], sizes[g],
            colors[model.geom_bodyid[g] % len(colors)],
        )
    ax.set_title(title)
    ax.set_box_aspect((1, 1, 1))
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, dpi=80)
        plt.close(fig)
    return fig


def render_trajectory(model: Model, qpos_traj, out_dir: str,
                      every: int = 6, prefix: str = "frame"):
    """PNG frame sequence of a trajectory replay (StartRecording analogue;
    the reference renders every 6th MPC tick, `src/main.cpp:546-550`)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    qpos_traj = np.asarray(qpos_traj)
    for i in range(0, len(qpos_traj), every):
        p = os.path.join(out_dir, f"{prefix}_{i:05d}.png")
        render_frame(model, qpos_traj[i], out_path=p, title=f"t = {i}")
        paths.append(p)
    return paths
