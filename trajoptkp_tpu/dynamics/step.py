"""The pure step function: the heart of the TPU engine.

Replaces mj_step for the trajectory optimiser.  Semantics mirror MuJoCo's
default pipeline (semi-implicit Euler with implicit joint damping,
`mj_EulerSkip`): the reference's whole FD machinery differentiates exactly
this function (`/root/reference/src/Differentiator/Differentiator.cpp:8-462`),
so matching its integrator semantics is what makes A/B Jacobians comparable.

Everything here is jit/vmap-safe with static shapes; `step` is the unit that
gets batched over FD perturbation columns, line-search alphas, MPC scenario
instances, and sharded over the device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.linalg import sym_solve
from .constraint import constraint_force
from .fk import forward_kinematics
from .integrate import integrate_pos
from .model import Data, Model
from .smooth import fwd_velocity_smooth


def forward(model: Model, data: Data, solver_iters: int = None) -> Data:
    """Forward dynamics: fill FK products, forces, and qacc (mj_forward).

    With constraints present, qacc is the projected-Newton solution directly
    (the solver optimises over accelerations, so its iterate IS the
    constrained qacc — no extra mass-matrix solve).  data.warmstart, when
    set by the caller (rollout/line-search scan carries), seeds the solver
    with the previous step's constraint delta and runs fewer iterations.
    """
    data = forward_kinematics(model, data)
    data = fwd_velocity_smooth(model, data)
    qfrc_smooth = data.qfrc_passive + data.qfrc_actuator - data.qfrc_bias
    data = constraint_force(model, data, qfrc_smooth, solver_iters)
    if model.contact_pairs or any(model.jnt_limited):
        return data  # qacc + warmstart filled by the constraint solver
    qacc = sym_solve(data.qM, qfrc_smooth)
    return data.replace(qacc=qacc)


def advance(model: Model, data: Data) -> Data:
    """Euler integration given forward() products (mj_Euler semantics).

    Split from `step` so rollouts can evaluate residuals on the forward()-
    filled Data (FK products at x_t) without recomputing kinematics.
    """
    h = model.timestep
    qfrc_smooth = data.qfrc_passive + data.qfrc_actuator - data.qfrc_bias
    rhs = qfrc_smooth + data.qfrc_constraint
    # implicit joint damping: (M + h D) qacc = f   (mj_Euler semantics)
    damping = model.dof_damping
    if model.flex_edges:
        from .flex import flex_damping_diag

        damping = damping + flex_damping_diag(model, data)
    MhD = data.qM + h * jnp.diag(damping)
    qacc = sym_solve(MhD, rhs)
    qvel_new = data.qvel + h * qacc
    qpos_new = integrate_pos(model, data.qpos, qvel_new, h)
    return data.replace(
        qpos=qpos_new, qvel=qvel_new, qacc=qacc, time=data.time + h
    )


def step(model: Model, data: Data) -> Data:
    """Advance one timestep (mj_step: forward + Euler w/ implicit damping)."""
    return advance(model, forward(model, data))


def step_state(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray,
               ctrl: jnp.ndarray, warmstart: jnp.ndarray = None):
    """Functional convenience wrapper: (qpos, qvel, ctrl) -> (qpos', qvel').

    This is the signature the derivative engine vmaps over (the analogue of
    the reference's `mj_stepSkip` FD kernel).  `warmstart` (optional) is the
    constraint-solver delta the rollout used at this state — passing it makes
    the differentiated function IDENTICAL to the rollout's step (the
    reference instead clamps the solver to 5 iterations during FD,
    `MuJoCoHelper.cpp:925-937`, differentiating a *different* function than
    its rollouts integrate; we keep the two in exact agreement).
    """
    data = Data(
        qpos=qpos, qvel=qvel, ctrl=ctrl, time=jnp.zeros((), dtype=qpos.dtype),
        warmstart=warmstart,
    )
    out = step(model, data)
    return out.qpos, out.qvel


def step_state_clamped(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray,
                       ctrl: jnp.ndarray, solver_iters: int = 5,
                       warmstart: jnp.ndarray = None):
    """The reference's FD kernel: a constraint solve clamped to
    `solver_iters` Newton iterations (`MuJoCoHelper.cpp:925-937` pins the
    solver to maxIter 5, tolerance 0 while finite-differencing — it
    differentiates a different function than its rollouts integrate).
    Exists for the Analyse_fd_clamp divergence experiment; the production
    derivative path differentiates the exact rollout step (step_state).

    Warm vs cold modelling choice: the reference perturbs COPIED mjData that
    carries qacc_warmstart from the nominal rollout (`CpMjData`,
    `MuJoCoHelper.cpp:732-741`), so its clamped FD solve is warmstarted; the
    default here (warmstart=None) is a cold solve, which UPPER-BOUNDS the
    clamp's divergence relative to the reference's actual kernel.  Pass the
    nominal step's warmstart delta (Data.warmstart from the unclamped step)
    to reproduce the warmstarted variant."""
    data = Data(
        qpos=qpos, qvel=qvel, ctrl=ctrl, time=jnp.zeros((), dtype=qpos.dtype),
        warmstart=warmstart,
    )
    out = advance(model, forward(model, data, solver_iters=solver_iters))
    return out.qpos, out.qvel
