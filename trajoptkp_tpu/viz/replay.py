"""Interactive trajectory replay via the MuJoCo viewer, with headless
fallback.

Closes the reference Visualiser's interactive surface
(`/root/reference/src/Visualiser/Visualiser.cpp:37-153` window + camera,
`:233-271` trajectory replay): our scenes are hand-authored MJCF
(Model.source_xml keeps the source), so a real mujoco.MjModel of the SAME
scene can be rebuilt and played back in `mujoco.viewer` — free camera
orbit/zoom/pan, pause/step, body selection all come from the viewer itself.
On headless hosts (no GL stack — every TPU pod slice) the replay falls back
to the matplotlib PNG sequence (viz/render.py), which needs no GL.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def viewer_available() -> bool:
    """True when an interactive GL viewer can actually launch here."""
    import os

    if not os.environ.get("DISPLAY") and not os.environ.get(
        "WAYLAND_DISPLAY"
    ):
        return False
    try:
        import glfw

        return bool(glfw.init())
    except Exception:
        return False


def replay_trajectory(
    model,
    qpos_traj: np.ndarray,
    out_dir: Optional[str] = None,
    fps: Optional[float] = None,
    loop: bool = False,
    interactive: Optional[bool] = None,
):
    """Play back a saved qpos trajectory.

    interactive=None auto-detects a display; when interactive, opens
    `mujoco.viewer.launch_passive` on a MjModel rebuilt from
    model.source_xml and streams frames at the model timestep (or `fps`);
    otherwise writes a PNG frame sequence to out_dir and returns the paths.
    """
    qpos_traj = np.asarray(qpos_traj)
    if interactive is None:
        interactive = viewer_available()
    if interactive and model.source_xml is not None:
        import mujoco
        import mujoco.viewer

        mj = mujoco.MjModel.from_xml_string(model.source_xml)
        d = mujoco.MjData(mj)
        frame_dt = 1.0 / fps if fps else float(model.timestep)
        with mujoco.viewer.launch_passive(mj, d) as v:
            while True:
                for t in range(len(qpos_traj)):
                    if not v.is_running():
                        return None
                    d.qpos[:] = qpos_traj[t]
                    mujoco.mj_forward(mj, d)
                    v.sync()
                    time.sleep(frame_dt)
                if not loop:
                    break
        return None
    # headless fallback: PNG sequence via the engine's own FK
    from .render import render_trajectory

    out_dir = out_dir or "TestingData/replay"
    return render_trajectory(model, qpos_traj, out_dir)
