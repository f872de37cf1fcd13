"""Config / IO layer: YAML configs, scene CSVs, task registry.

TPU-native equivalent of the reference FileHandler
(`/root/reference/src/FileHandler/FileHandler.cpp`):

  - general config YAML (task, optimiser, runMode, filtering, iteration
    bounds, async_mpc — schema of `generalConfigs/default.yaml`, parsed at
    `FileHandler.cpp:291-310`)
  - task config YAML (robots/bodies/residuals/keypoints — schema of
    `TaskConfigs/**`, parsed at `FileHandler.cpp:21-289`): applied as
    overrides onto the registered task implementations
  - scene CSV load/save in the reference's `TestTasks/<task>/<i>.csv` format
    (`FileHandler.cpp:423-578`): one row = robot start positions, body
    start lin+ang poses, then flattened residual targets — so the
    reference's 100 saved benchmark scenes load verbatim.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
import yaml

from ..keypoints.methods import KeypointConfig
from ..tasks.base import Task

# ---------------------------------------------------------------------------
# task registry
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Callable[..., Task]] = {}


def register_task(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def make_task(name: str, **kwargs) -> Task:
    """17-way task factory (assign_task, `/root/reference/src/main.cpp:746-839`)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown task '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)


def available_tasks() -> List[str]:
    return sorted(_REGISTRY)


def _populate_registry():
    from ..tasks.toys import (make_acrobot, make_floating_cube,
                              make_pentabot, make_piston_block)
    from ..tasks.reaching import make_reaching
    from ..tasks.locomotion import make_walker
    from ..tasks.pushing import make_pushing
    from ..tasks.humanoid import make_humanoid
    from ..tasks.manipulation import (make_box_sweep, make_place,
                                      make_sweep_multiple, make_threed_push)

    _REGISTRY.setdefault("acrobot", make_acrobot)
    _REGISTRY.setdefault("pentabot", make_pentabot)
    _REGISTRY.setdefault("piston_block", make_piston_block)
    _REGISTRY.setdefault("floating_cube", make_floating_cube)
    _REGISTRY.setdefault("reaching", make_reaching)
    _REGISTRY.setdefault("walker_walk", lambda **kw: make_walker(run=False, **kw))
    _REGISTRY.setdefault("walker_run", lambda **kw: make_walker(run=True, **kw))
    _REGISTRY.setdefault(
        "walker_uneven", lambda **kw: make_walker(run=False, uneven=True, **kw)
    )
    _REGISTRY.setdefault(
        "pushing_no_clutter", lambda **kw: make_pushing(0, **kw)
    )
    _REGISTRY.setdefault(
        "pushing_low_clutter", lambda **kw: make_pushing(3, **kw)
    )
    _REGISTRY.setdefault(
        "pushing_moderate_clutter", lambda **kw: make_pushing(7, **kw)
    )
    _REGISTRY.setdefault(
        "pushing_moderate_clutter_constrained",
        lambda **kw: make_pushing("constrained", **kw),
    )

    def _box_push_toppling(**kw):
        raise NotImplementedError(
            "box_push_toppling is not implemented (matches the reference "
            "stub, src/main.cpp:783-786); see threeD_push for the toppling "
            "box task"
        )

    _REGISTRY.setdefault("box_push_toppling", _box_push_toppling)
    _REGISTRY.setdefault("humanoid", make_humanoid)
    _REGISTRY.setdefault("box_sweep", make_box_sweep)
    _REGISTRY.setdefault("place", make_place)
    _REGISTRY.setdefault("threeD_push", make_threed_push)
    _REGISTRY.setdefault("sweep_multiple", make_sweep_multiple)
    from ..tasks.soft import make_push_soft

    _REGISTRY.setdefault(
        "push_soft", lambda **kw: make_push_soft(into_rigid=False, **kw)
    )
    _REGISTRY.setdefault(
        "push_soft_rigid", lambda **kw: make_push_soft(into_rigid=True, **kw)
    )

    def _hopper(**kw):
        # reference parity: Hopper is declared but unimplemented
        # (`/root/reference/src/main.cpp:799-802` exits with "not implemented")
        raise NotImplementedError(
            "hopper task is not implemented (matches the reference stub)"
        )

    _REGISTRY.setdefault("hopper", _hopper)


_populate_registry()


# ---------------------------------------------------------------------------
# general config
# ---------------------------------------------------------------------------


@dataclass
class GeneralConfig:
    """Mirror of generalConfigs/*.yaml (ReadSettingsFile)."""

    task: str = "acrobot"
    optimiser: str = "iLQR"
    runMode: str = "Optimise_once"
    taskInitMode: str = "fromYAML"
    csvRow: int = 0
    filtering: str = "none"
    costDerivsFD: bool = False
    minIter: int = 5
    maxIter: int = 10
    async_mpc: bool = True
    record: bool = False


def read_general_config(path: str) -> GeneralConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = GeneralConfig()
    for k, v in (raw or {}).items():
        if hasattr(cfg, k):
            setattr(cfg, k, v)
    return cfg


# ---------------------------------------------------------------------------
# task config overrides
# ---------------------------------------------------------------------------


def apply_task_config(task: Task, path: str) -> Task:
    """Overlay a reference-schema task YAML onto a Task: keypoint method,
    horizons, residual weights/targets, robot start positions."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    dtype = task.model.dtype
    updates = {}

    if "keypointMethod" in raw or "minN" in raw:
        kp = task.keypoint_cfg
        updates["keypoint_cfg"] = kp.replace(
            name=raw.get("keypointMethod", kp.name),
            min_N=int(raw.get("minN", kp.min_N)),
            max_N=int(raw.get("maxN", kp.max_N)),
            auto_adjust=bool(raw.get("auto_adjust", kp.auto_adjust)),
        )
    if "openloop_horizon" in raw:
        updates["openloop_horizon"] = int(raw["openloop_horizon"])
    if "mpc_horizon" in raw:
        updates["mpc_horizon"] = int(raw["mpc_horizon"])

    if "residuals" in raw:
        weights, weights_t, targets = [], [], []
        for name, spec in raw["residuals"].items():
            dim = int(spec.get("resid_dimension", 1))
            weights += [float(spec.get("weight", 0.0))] * dim
            weights_t += [float(spec.get("weight_terminal", 0.0))] * dim
            targets += [float(t) for t in spec.get("target", [0.0])]
        if len(weights) == task.nres:
            updates["weights"] = jnp.array(weights, dtype=dtype)
            updates["weights_terminal"] = jnp.array(weights_t, dtype=dtype)
        if task.residual_targets is not None and len(targets) == len(
            task.residual_targets
        ):
            updates["residual_targets"] = jnp.array(targets, dtype=dtype)

    if "robots" in raw:
        robot = next(iter(raw["robots"].values()))
        start = robot.get("startPos")
        if start is not None:
            qpos = np.asarray(task.qpos_start)
            qpos = qpos.copy()
            qpos[: len(start)] = start
            updates["qpos_start"] = jnp.asarray(qpos, dtype=dtype)

    return task.replace(**updates)


# ---------------------------------------------------------------------------
# scene CSV (TestTasks format)
# ---------------------------------------------------------------------------


@dataclass
class SceneSpec:
    """One benchmark scene: robot start, body start poses, residual targets."""

    robot_start: np.ndarray            # (n_robot_joints,)
    body_starts: List[np.ndarray]      # per body: (6,) lin xyz + euler rpy
    residual_targets: np.ndarray       # flattened targets


def load_scene_csv(
    path: str, n_robot_joints: int, n_bodies: int, n_targets: int
) -> SceneSpec:
    """Parse a reference TestTasks/<task>/<i>.csv row (LoadTaskFromFile)."""
    row = [
        float(x)
        for x in open(path).read().strip().split(",")
        if x.strip() != ""
    ]
    expect = n_robot_joints + 6 * n_bodies + n_targets
    if len(row) != expect:
        raise ValueError(
            f"{path}: got {len(row)} values, expected {expect} "
            f"({n_robot_joints} joints + {6*n_bodies} body dofs + "
            f"{n_targets} targets)"
        )
    i = 0
    robot_start = np.array(row[i : i + n_robot_joints])
    i += n_robot_joints
    body_starts = []
    for _ in range(n_bodies):
        body_starts.append(np.array(row[i : i + 6]))
        i += 6
    targets = np.array(row[i:])
    return SceneSpec(robot_start, body_starts, targets)


def save_scene_csv(path: str, scene: SceneSpec) -> None:
    """Write the same single-row format (SaveTaskToFile)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    vals: List[float] = list(scene.robot_start)
    for b in scene.body_starts:
        vals += list(b)
    vals += list(scene.residual_targets)
    with open(path, "w") as f:
        f.write(",".join(str(v) for v in vals) + ",\n")


def scene_layout(model):
    """Infer the TestTasks CSV layout from the model topology.

    The reference writes robot scalar-joint start positions first, then one
    6-value (lin xyz + euler rpy) block per rigid body, then the flattened
    residual targets (`/root/reference/src/FileHandler/FileHandler.cpp:423-469`).
    Here: robot joints = scalar (hinge/slide) joints in model order; bodies =
    free joints in model order.

    Returns (robot_qadr: list of qpos addresses, free_joint_ids: list).
    """
    from ..dynamics.model import FREE, HINGE, SLIDE

    robot_qadr, free_joints = [], []
    for j in range(model.njnt):
        if model.jnt_type[j] in (HINGE, SLIDE):
            robot_qadr.append(model.jnt_qposadr[j])
        elif model.jnt_type[j] == FREE:
            free_joints.append(j)
    return robot_qadr, free_joints


def load_scenes_for_task(task: Task, scenes_dir: str, num: Optional[int] = None):
    """Load reference TestTasks/<task>/<i>.csv scenes into batched arrays.

    Wires `LoadTaskFromFile` semantics onto our Task: scalar-joint starts are
    scattered to their qpos addresses, free-joint bodies get pos + euler->quat,
    and residual targets are truncated/padded to the task's target length.

    Returns (qpos (N, nq), qvel (N, nv) zeros, targets (N, ntargets)).
    """
    from ..utils.math import euler_to_quat

    model = task.model
    robot_qadr, free_joints = scene_layout(model)
    n_rj = len(robot_qadr)
    n_bodies = len(free_joints)
    ntargets = len(task.residual_targets)

    files = sorted(
        (f for f in os.listdir(scenes_dir) if f.endswith(".csv")),
        key=lambda f: int(os.path.splitext(f)[0]),
    )
    if num is not None:
        files = files[:num]
    if not files:
        raise FileNotFoundError(f"no scene CSVs in {scenes_dir}")

    qpos_rows, target_rows = [], []
    for f in files:
        row = [
            float(x)
            for x in open(os.path.join(scenes_dir, f)).read().strip().split(",")
            if x.strip() != ""
        ]
        if len(row) < n_rj + 6 * n_bodies:
            raise ValueError(
                f"{f}: {len(row)} values < {n_rj} joints + {6*n_bodies} body dofs"
            )
        qpos = np.asarray(task.qpos_start, dtype=np.float64).copy()
        if task.scene_robot_start != "task":
            for k, qadr in enumerate(robot_qadr):
                qpos[qadr] = row[k]
        i = n_rj
        for j in free_joints:
            qadr = model.jnt_qposadr[j]
            qpos[qadr : qadr + 3] = row[i : i + 3]
            quat = np.asarray(euler_to_quat(jnp.asarray(np.array(row[i + 3 : i + 6]))))
            qpos[qadr + 3 : qadr + 7] = quat
            i += 6
        raw_targets = np.array(row[i:], dtype=np.float64)
        targets = np.asarray(task.residual_targets, dtype=np.float64).copy()
        targets[: min(ntargets, len(raw_targets))] = raw_targets[:ntargets]
        qpos_rows.append(qpos)
        target_rows.append(targets)

    dtype = model.dtype
    return (
        np.stack(qpos_rows),
        np.zeros((len(files), model.nv)),
        np.stack(target_rows),
    )


def apply_scene(task: Task, scene: SceneSpec, body_names: List[str] = ()) -> Task:
    """Install a scene's start state + targets into a Task.

    body_names: model body names corresponding to scene.body_starts order.
    """
    from ..utils.math import euler_to_quat

    dtype = task.model.dtype
    model = task.model
    qpos = np.asarray(task.qpos_start, dtype=np.float64).copy()
    nrj = len(scene.robot_start)
    qpos[:nrj] = scene.robot_start
    for bname, pose in zip(body_names, scene.body_starts):
        j = model.joint_names.index(bname)
        qadr = model.jnt_qposadr[j]
        qpos[qadr : qadr + 3] = pose[:3]
        quat = np.asarray(euler_to_quat(jnp.asarray(pose[3:6])))
        qpos[qadr + 3 : qadr + 7] = quat
    return task.replace(
        qpos_start=jnp.asarray(qpos, dtype=dtype),
        residual_targets=jnp.asarray(scene.residual_targets, dtype=dtype)
        if task.residual_targets is not None
        and len(scene.residual_targets) >= len(task.residual_targets)
        else task.residual_targets,
    )
