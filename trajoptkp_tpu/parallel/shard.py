"""Sharded derivative computation: FD-job batch over the "job" mesh axis.

The TPU replacement for the reference's FD thread pool
(`/root/reference/src/Optimiser/Optimiser.cpp:258-323`): perturbation jobs
are an array axis, sharded over devices with shard_map; each device computes
its chunk's A/B columns and the scatter into the full (H, 2n, 2n) tables is
combined with one psum over ICI — the all-gather/all-reduce SURVEY §2.3
prescribes for Jacobian assembly.

Also: process-level initialisation for multi-host pods (jax.distributed) —
the scene axis maps across hosts over DCN, the job axis stays intra-slice.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..derivs.fd import DerivJobs, keypoint_jacobians
from ..state.statevector import StateVector
from ..dynamics.model import Model


def sharded_keypoint_jacobians(
    mesh: Mesh,
    model: Model,
    sv: StateVector,
    qpos_traj, qvel_traj, ctrl_traj,
    jobs: DerivJobs,
    eps: float = 1e-6,
    mode: str = "fd",
    axis: str = "job",
):
    """keypoint_jacobians with the job batch sharded over `axis`.

    jobs.budget must be divisible by the axis size.  Trajectories are
    replicated; each shard scatters its columns into zero-initialised full
    tables and a psum combines them (scatter targets are disjoint, so the
    sum is exact assembly).
    """

    def chunk(jt, jd, jv):
        local = DerivJobs(t=jt, d=jd, valid=jv)
        A, B, touched = keypoint_jacobians(
            model, sv, qpos_traj, qvel_traj, ctrl_traj, local,
            eps=eps, mode=mode,
        )
        A = jax.lax.psum(A, axis)
        B = jax.lax.psum(B, axis)
        touched = jax.lax.pmax(touched, axis)
        return A, B, touched

    return shard_map(
        chunk,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )(jobs.t, jobs.d, jobs.valid)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialisation (new scope vs the reference — SURVEY §2.3
    'Communication backend: none').  On single-host this is a no-op."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
