"""iterative_error keypoints: adaptive bisection with batched FD rounds.

Reproduces GenerateKeyPointsIteratively
(`/root/reference/src/KeyPointGenerator/KeyPointGenerator.cpp:449-640`):
per dof, recursively bisect [0, H-1]; a segment is approximated well when the
FD columns at its midpoint are within `iterative_error_threshold` MSE of the
average of its endpoints' columns (only the velocity rows are compared,
`:611-620`); computed columns are cached and reused (`:572-606`).

TPU re-design (SURVEY §7.4): the reference recurses serially per dof with an
FD call per node.  Here each bisection *round* evaluates every open segment
of every dof in ONE batched FD launch (breadth-wise), with the column cache
carried as dense (H, ndof) masks + stored columns.  Rounds are host-driven
(log2(H) of them at most) around jitted batch evaluations — the open-loop
path the reference uses this method for.

Returns both the keypoint mask and the cached A/B columns so the optimiser
reuses every FD evaluation (matching the reference's cost accounting).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..derivs.fd import DerivJobs, keypoint_jacobians
from ..state.statevector import StateVector
from ..tasks.base import Task


def iterative_error_keypoints(
    task: Task,
    qpos_traj: jnp.ndarray,   # (H, nq)
    qvel_traj: jnp.ndarray,   # (H, nv)
    ctrl_traj: jnp.ndarray,   # (H, nu)
    min_N: int,
    threshold: float,
    mode: str = "fd",
    fd_eps: float = 1e-6,
    warm_traj: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mask (H, n) bool, A_cols (H, 2n, 2n), B_cols (H, 2n, nu),
    computed (H, n) bool).

    A_cols/B_cols contain the FD columns for every (t, dof) that was computed
    (the cache); entries not computed are zero and `computed` is False there.
    """
    model, sv = task.model, task.sv
    n = sv.ndof
    H = qpos_traj.shape[0]
    dtype = qpos_traj.dtype

    A_cache = jnp.zeros((H, 2 * n, 2 * n), dtype=dtype)
    B_cache = jnp.zeros((H, 2 * n, model.nu), dtype=dtype)
    computed = np.zeros((H, n), dtype=bool)

    def eval_batch(ts, ds):
        """Batched FD of (t, dof) pairs -> scatter into caches."""
        nonlocal A_cache, B_cache, computed
        if len(ts) == 0:
            return
        jobs = DerivJobs(
            t=jnp.asarray(ts, jnp.int32),
            d=jnp.asarray(ds, jnp.int32),
            valid=jnp.ones((len(ts),), bool),
        )
        A_kp, B_kp, _ = keypoint_jacobians(
            model, sv, qpos_traj, qvel_traj, ctrl_traj, jobs,
            eps=fd_eps, mode=mode, warm_traj=warm_traj,
        )
        A_cache = A_cache + A_kp
        B_cache = B_cache + B_kp
        for t, d in zip(ts, ds):
            computed[t, d] = True

    # open segment lists per dof
    segments = {d: [(0, H - 1)] for d in range(n)}

    # seed: endpoints for all dofs
    seed_ts, seed_ds = [], []
    for d in range(n):
        for t in (0, H - 1, (H - 1) // 2):
            if not computed[t, d]:
                seed_ts.append(t)
                seed_ds.append(d)
    eval_batch(seed_ts, seed_ds)

    max_rounds = int(np.ceil(np.log2(max(H, 2)))) + 1
    for _ in range(max_rounds):
        # gather all midpoints needing evaluation this round
        need_ts, need_ds = [], []
        actives = []
        for d, segs in segments.items():
            for (s, e) in segs:
                mid = (s + e) // 2
                if (e - s) > min_N:
                    for t in (s, mid, e):
                        if not computed[t, d]:
                            need_ts.append(t)
                            need_ds.append(d)
                    actives.append((d, s, e))
        if not actives:
            break
        eval_batch(need_ts, need_ds)

        # decide splits using the cached columns (velocity rows only)
        A_np = np.asarray(A_cache)
        new_segments = {d: [] for d in range(n)}
        for (d, s, e) in actives:
            mid = (s + e) // 2
            cols = [d, n + d]
            approx = 0.5 * (A_np[s][:, cols] + A_np[e][:, cols])
            errs = (A_np[mid][:, cols] - approx)[n:, :]  # velocity rows
            mse = float(np.mean(errs**2))
            if mse >= threshold:
                new_segments[d].append((s, mid))
                new_segments[d].append((mid, e))
        segments = new_segments

    mask = jnp.asarray(computed)
    return mask, A_cache, B_cache, jnp.asarray(computed)
