"""Asynchronous MPC executor: real-time actor + background planner.

TPU-native re-design of the reference's AsyncMPC
(`/root/reference/src/main.cpp:425-744`): the planner thread re-optimises
from the latest actor state while the actor applies buffered controls at the
model timestep (sleep-compensated wall-clock loop, `main.cpp:552-562`).

Mapping of the reference's thread/mutex structure:
  - planner thread + sim thread sharing vis_data under a mutex  ->
    host actor loop + device-side planner dispatch; the shared state is a
    small lock-protected ControlBuffer (plain Python objects — the actor and
    planner exchange only tiny host arrays; all heavy compute is jitted).
  - plan hand-off: shift consumed controls, pad with last control
    (`main.cpp:663-669`), re-optimise with max_iter = 1, install new buffer
    with start index = 1 (the reference computes a best-matching-state index
    then hardcodes 1, `main.cpp:687-707` — we keep the computed-index path
    available via `resync_mode`).
  - actor: 5%-of-range Gaussian control noise (`main.cpp:489-496`),
    gravity-compensation hold when the buffer is exhausted (`:498-509`).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.model import Data
from ..dynamics.step import forward, step
from ..solver.fused import make_fused_optimise
from ..solver.ilqr import ILQRConfig
from ..state.statevector import to_tangent
from ..tasks.base import Task, control_limits


@dataclass
class ControlBuffer:
    """The mutex-guarded planner->actor hand-off (`main.cpp:55-81,709-720`)."""

    lock: threading.Lock = field(default_factory=threading.Lock)
    controls: Optional[np.ndarray] = None   # (H, nu)
    index: int = 0
    X_plan_qpos: Optional[np.ndarray] = None
    X_plan_qvel: Optional[np.ndarray] = None

    def install(self, controls, index, qpos_plan, qvel_plan):
        with self.lock:
            self.controls = controls
            self.index = index
            self.X_plan_qpos = qpos_plan
            self.X_plan_qvel = qvel_plan

    def next_control(self):
        with self.lock:
            if self.controls is None or self.index >= len(self.controls):
                return None
            u = self.controls[self.index]
            self.index += 1
            return u

    def consumed(self):
        with self.lock:
            return self.index

    def has_plan(self):
        with self.lock:
            return self.controls is not None


class _NativeBufferAdapter:
    """Adapts NativeControlBuffer to the ControlBuffer interface."""

    def __init__(self, native):
        self._n = native

    def install(self, controls, index, qpos_plan, qvel_plan):
        self._n.publish(np.asarray(controls, dtype=np.float64), index)

    def next_control(self):
        return self._n.next_control()

    def consumed(self):
        return self._n.consumed()

    def has_plan(self):
        return self._n.stats["plans_published"] > 0


class AsyncMPC:
    """Planner/actor pair for one task instance."""

    def __init__(
        self,
        task: Task,
        cfg: ILQRConfig,
        horizon: int,
        noise_pct: float = 5.0,
        realtime: bool = False,
        num_steps_replan: int = 1,
        seed: int = 0,
        # "fixed1" (the reference's final choice, `main.cpp:707`) |
        # "opt_time" (replan latency in sim ticks) | "best_match" (the
        # reference's computed-but-overridden nearest-state search,
        # `main.cpp:687-707`)
        resync_mode: str = "fixed1",
    ):
        self.task = task
        self.model = task.model
        self.horizon = horizon
        self.realtime = realtime
        self.num_steps_replan = num_steps_replan
        self.resync_mode = resync_mode
        self.dt = float(task.model.timestep)

        mpc_cfg = cfg.replace(max_iterations=1, min_iterations=1)
        self._optimise = jax.jit(make_fused_optimise(task, mpc_cfg, horizon))
        self._step = jax.jit(lambda d: step(self.model, d))
        self._forward = jax.jit(lambda d: forward(self.model, d))

        limits = np.asarray(control_limits(task))
        self._limits = limits
        rng_width = limits[:, 1] - limits[:, 0]
        # unlimited actuators have infinite range: no range-scaled noise
        rng_width = np.where(np.isfinite(rng_width), rng_width, 0.0)
        self._noise_std = rng_width / 100.0 * noise_pct
        self._rng = np.random.default_rng(seed)

        # native lock-free buffer + absolute-deadline ticker when the C++
        # core is available (mpc/native); Python fallback otherwise
        self._use_native = False
        try:
            from .native_executor import NativeControlBuffer, RtTicker

            self.buffer = _NativeBufferAdapter(
                NativeControlBuffer(horizon, task.model.nu)
            )
            self._ticker = RtTicker(self.dt) if realtime else None
            self._use_native = True
        except Exception:
            self.buffer = ControlBuffer()
            self._ticker = None
        self._stop = threading.Event()
        self._state_lock = threading.Lock()
        self._qpos = np.asarray(task.qpos_start, dtype=np.float64)
        self._qvel = np.asarray(task.qvel_start, dtype=np.float64)
        self.replan_times_ms: list = []
        self.applied_controls: list = []
        self.visited_qpos: list = []
        self.visited_qvel: list = []

    # ----- planner ---------------------------------------------------------

    def _planner_loop(self, U_init):
        U = jnp.asarray(U_init)
        dtype = U.dtype
        while not self._stop.is_set():
            with self._state_lock:
                qpos = self._qpos.copy()
                qvel = self._qvel.copy()
            consumed = self.buffer.consumed()
            # shift consumed controls, pad with last
            U_np = np.asarray(U)
            if 0 < consumed < len(U_np):
                U_np = np.concatenate(
                    [U_np[consumed:], np.tile(U_np[-1:], (consumed, 1))]
                )
            t0 = time.perf_counter()
            res = self._optimise(
                jnp.asarray(qpos, dtype), jnp.asarray(qvel, dtype), jnp.asarray(U_np, dtype)
            )
            jax.block_until_ready(res.traj.ctrl)
            opt_ms = (time.perf_counter() - t0) * 1e3
            self.replan_times_ms.append(opt_ms)
            U = res.traj.ctrl

            if self.resync_mode == "opt_time":
                idx = min(int(opt_ms / (self.dt * 1e3)), self.horizon - 1)
            elif self.resync_mode == "best_match":
                # best-matching-state search (`main.cpp:687-707`): start the
                # new plan at the X_old index closest (L1 over the state
                # vector) to the sim's CURRENT state — the plan was computed
                # from a state the sim has since moved past
                with self._state_lock:
                    cur = np.concatenate([self._qpos, self._qvel])
                X_old = np.concatenate(
                    [np.asarray(res.traj.qpos), np.asarray(res.traj.qvel)],
                    axis=1,
                )
                errs = np.abs(X_old[: self.horizon - 1] - cur[None]).sum(1)
                idx = int(np.argmin(errs))
            else:
                idx = 1  # reference hardcodes 1 (`main.cpp:707`)
            self.buffer.install(
                np.asarray(U), idx,
                np.asarray(res.traj.qpos), np.asarray(res.traj.qvel),
            )

    # ----- actor -----------------------------------------------------------

    def _actor_step(self):
        u = self.buffer.next_control()
        with self._state_lock:
            qpos = self._qpos
            qvel = self._qvel
        dtype = self.task.model.dtype
        data = Data(
            qpos=jnp.asarray(qpos, dtype),
            qvel=jnp.asarray(qvel, dtype),
            ctrl=jnp.zeros((self.model.nu,), dtype),
            time=jnp.zeros((), dtype),
        )
        if u is None:
            # gravity-compensation hold (`main.cpp:498-509`)
            d = self._forward(data)
            u = np.array(
                [
                    float(d.qfrc_bias[self.model.jnt_dofadr[self.model.actuator_trnid[a]]])
                    / float(self.model.actuator_gear[a, 0])
                    for a in range(self.model.nu)
                ]
            )
        u = u + self._rng.normal(0.0, self._noise_std)
        u = np.clip(u, self._limits[:, 0], self._limits[:, 1])
        out = self._step(data.replace(ctrl=jnp.asarray(u, dtype)))
        with self._state_lock:
            self._qpos = np.asarray(out.qpos)
            self._qvel = np.asarray(out.qvel)
        self.applied_controls.append(u)
        self.visited_qpos.append(np.asarray(out.qpos))
        self.visited_qvel.append(np.asarray(out.qvel))
        return out

    def episode_cost(self) -> float:
        """Replay the episode's visited states + applied controls through
        the residual pipeline and sum the task cost, terminal weights at the
        last visited state (the reference's end-of-run replay loop,
        `/root/reference/src/main.cpp:585-625` — it restores each stored
        full state into vis_data, re-evaluates Residuals/CostFunction and
        accumulates)."""
        from ..dynamics.fk import forward_kinematics

        if not self.visited_qpos:
            return float("nan")
        dtype = self.model.dtype
        task = self.task
        qp = jnp.asarray(np.array(self.visited_qpos), dtype)
        qv = jnp.asarray(np.array(self.visited_qvel), dtype)
        us = jnp.asarray(np.array(self.applied_controls), dtype)
        n = qp.shape[0]

        @jax.jit
        def _cost(qp, qv, us):
            def one(qpos, qvel, u, terminal):
                d = forward_kinematics(self.model, Data(
                    qpos=qpos, qvel=qvel, ctrl=u, time=jnp.zeros((), dtype),
                ))
                r = task.residual_fn(self.model, d, task.residual_targets)
                w = jnp.where(terminal, task.weights_terminal, task.weights)
                return jnp.sum(w * r * r)

            term = jnp.arange(n) == n - 1
            return jnp.sum(jax.vmap(one)(qp, qv, us, term))

        return float(_cost(qp, qv, us))

    def run(self, U_init, max_steps: int = 2000):
        """Run the episode; returns (visited qpos history, applied controls)."""
        planner = threading.Thread(
            target=self._planner_loop, args=(U_init,), daemon=True
        )
        planner.start()
        # wait for the first plan
        while not self.buffer.has_plan():
            time.sleep(1e-3)
        try:
            for t in range(max_steps):
                tic = time.perf_counter()
                out = self._actor_step()
                if self.task.task_complete_fn is not None:
                    done, dist = self.task.task_complete_fn(
                        self.model, out, self.task.residual_targets
                    )
                    if bool(done):
                        break
                if self.realtime:
                    if self._ticker is not None:
                        self._ticker.wait()  # native absolute-deadline pacing
                    else:
                        # sleep-compensated pacing (`main.cpp:552-562`)
                        elapsed = time.perf_counter() - tic
                        if elapsed < self.dt:
                            time.sleep(self.dt - elapsed)
        finally:
            self._stop.set()
            planner.join(timeout=5.0)
        return np.array(self.visited_qpos), np.array(self.applied_controls)
