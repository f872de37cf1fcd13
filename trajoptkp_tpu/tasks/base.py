"""Task abstraction: model + state vector + residual cost, as data.

TPU-native equivalent of the reference's ModelTranslator layer
(`/root/reference/src/ModelTranslator/ModelTranslator.h:39-404`): instead of a
C++ subclass per task, a Task is a pytree bundling the dynamics Model, the
selected StateVector, residual weights, and a pure residual function.

Cost semantics (`ModelTranslator.cpp:314-328`): c = sum_i w_i * r_i^2, with
per-residual terminal weights.  Cost derivatives use the Gauss-Newton form
from residual Jacobians (`ModelTranslator.cpp:552-583`).

Convention note: the trajectory cost is sum_{t=0}^{H-1} c(x_t, u_t) with the
terminal weights applied at t = H-1, matching the reference forward pass
(`iLQR.cpp:900-915`).  (The reference's *initial* rollout costs post-step
states (`iLQR.cpp:225-245`) — an internal inconsistency we resolve in favour
of the forward-pass convention so initial and line-search costs are
comparable.)
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics.fk import forward_kinematics
from ..dynamics.model import Data, Model
from ..keypoints.methods import KeypointConfig
from ..state.statevector import StateVector, apply_tangent
from ..utils import math as tm


@struct.dataclass
class Task:
    """A trajectory-optimisation problem definition."""

    name: str = struct.field(pytree_node=False)
    residual_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # residual_fn(model, data, targets) -> (nres,); data has qpos/qvel/ctrl +
    # FK filled; targets is the task's traced target array (scene-dependent)
    residual_fn: Callable = struct.field(pytree_node=False)
    # task_complete_fn(model, data) -> (done: bool array, distance: float)
    task_complete_fn: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )
    # body whose position the EE-waypoint init-control heuristic pushes
    # toward the target (PushBaseClass semantics); "goal" for rigid pushing,
    # a central jelly vertex for soft pushing.
    push_object_body: str = struct.field(pytree_node=False, default="goal")
    # CreateInitOptimisationControls hook
    # (`ModelTranslator.h:166`, overridden per task e.g. `BoxSweep.h:13`,
    # `SweepMultiple.h:12`, `PlaceObject.h:22`): fn(task, H, qpos0, qvel0,
    # targets) -> (H, nu) control tape.  None = zero controls
    # (`ModelTranslator.cpp:1783-1797`).
    init_controls_fn: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )
    # CreateInitSetupControls hook (`main.cpp:360-363`,
    # `TwoDPushing.cpp:225-258`, `SweepMultiple.cpp:188`): fn(task, H,
    # qpos0, qvel0, targets) -> (U_setup, qpos_end, qvel_end); the END state
    # becomes the optimisation start.  None = no setup phase (the base-class
    # default is an empty tape, `ModelTranslator.cpp:875-880`).
    setup_controls_fn: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )
    model: Model = None
    sv: StateVector = None
    residual_targets: jnp.ndarray = None   # flat target array (layout per task)
    weights: jnp.ndarray = None            # (nres,)
    weights_terminal: jnp.ndarray = None   # (nres,)
    qpos_start: jnp.ndarray = None         # (nq,)
    qvel_start: jnp.ndarray = None         # (nv,)
    keypoint_cfg: KeypointConfig = None
    openloop_horizon: int = struct.field(pytree_node=False, default=500)
    mpc_horizon: int = struct.field(pytree_node=False, default=100)
    # how to treat the robot-joint columns of reference TestTasks CSVs:
    #   "csv"  — use them verbatim (toys/locomotion: the values are the
    #            scene's actual random joint starts)
    #   "task" — keep task.qpos_start (manipulation: the reference stores
    #            its constant YAML startPos, whose joint values encode
    #            "EE in the push-ready pose" for the reference's OWN scene
    #            kinematics (unvendored submodule); our hand-authored arm
    #            needs its own equivalent pose, `tasks/pushing.py`)
    scene_robot_start: str = struct.field(pytree_node=False, default="csv")
    # per-task random scene generator (ReturnRandomStartState,
    # `/root/reference/src/ModelTranslator/TwoDPushing.cpp:29-188`): host
    # fn (task, np rng) -> (robot_start (n_rj,), body_starts [list of (6,)
    # lin+euler], residual_targets).  None = task-generic jitter in
    # app._generate_scenes.
    scene_generator_fn: callable = struct.field(
        pytree_node=False, default=None
    )

    @property
    def nres(self) -> int:
        return len(self.residual_names)


def residuals_at(task: Task, qpos, qvel, ctrl) -> jnp.ndarray:
    """Evaluate residuals at a bare state (runs FK)."""
    data = Data(qpos=qpos, qvel=qvel, ctrl=ctrl, time=jnp.zeros((), qpos.dtype))
    data = forward_kinematics(task.model, data)
    return task.residual_fn(task.model, data, task.residual_targets)


def cost_from_residuals(task: Task, r: jnp.ndarray, terminal) -> jnp.ndarray:
    """c = sum_i w_i r_i^2 (terminal selects the terminal weight row)."""
    w = jnp.where(terminal, task.weights_terminal, task.weights)
    return jnp.sum(w * r * r)


def residual_derivatives(task: Task, qpos, qvel, ctrl):
    """r, r_x (nres, 2n), r_u (nres, nu) — exact jacfwd on the tangent space.

    Replaces the reference's FD ResidualDerivatives
    (`/root/reference/src/Differentiator/Differentiator.cpp:464-663`); no
    dynamics step is needed, only FK, so this is cheap at every timestep.
    """
    model, sv = task.model, task.sv
    nx = sv.nx

    def res_x(dx):
        qp, qv = apply_tangent(model, sv, qpos, qvel, dx)
        return residuals_at(task, qp, qv, ctrl)

    def res_u(u):
        return residuals_at(task, qpos, qvel, u)

    zero_dx = jnp.zeros((nx,), dtype=qpos.dtype)
    r = res_x(zero_dx)
    r_x = jax.jacfwd(res_x)(zero_dx)
    r_u = jax.jacfwd(res_u)(ctrl)
    return r, r_x, r_u


def cost_derivatives_gn(task: Task, r, r_x, r_u, terminal):
    """Gauss-Newton cost expansion (CostDerivativesFromResiduals,
    `ModelTranslator.cpp:552-583`):
      l_x  = 2 w r r_x        l_xx = 2 w r_x r_x^T
      l_u  = 2 w r r_u        l_uu = 2 w r_u r_u^T
    """
    w = jnp.where(terminal, task.weights_terminal, task.weights)
    l_x = 2.0 * jnp.einsum("i,i,ij->j", w, r, r_x)
    l_xx = 2.0 * jnp.einsum("i,ij,ik->jk", w, r_x, r_x)
    l_u = 2.0 * jnp.einsum("i,i,ij->j", w, r, r_u)
    l_uu = 2.0 * jnp.einsum("i,ij,ik->jk", w, r_u, r_u)
    return l_x, l_xx, l_u, l_uu


def control_limits(task: Task) -> jnp.ndarray:
    """(nu, 2) lower/upper ctrl bounds (ReturnControlLimits analogue).

    MuJoCo stores (0, 0) for actuators with ctrllimited=false — those must
    map to (-inf, +inf), not a clamp to zero (mj_fwdActuation only clamps
    when the limited flag is set)."""
    model = task.model
    lim = model.actuator_ctrlrange
    limited = jnp.array(
        [bool(l) for l in model.actuator_ctrllimited]
    )[:, None]
    inf = jnp.array([-jnp.inf, jnp.inf], dtype=lim.dtype)
    return jnp.where(limited, lim, inf[None, :])
