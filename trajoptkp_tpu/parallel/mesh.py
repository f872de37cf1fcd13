"""Device mesh + sharded batch optimisation.

The reference's only parallel resources are one machine's CPU threads
(SURVEY §2.3).  Here the parallel axes are array dimensions laid over a
`jax.sharding.Mesh`:

  - "scene": scenario instances / MPC ensemble members — data-parallel axis
    (replaces GenTestingData's serial 100-trial loops,
    `/root/reference/src/GenTestingData.cpp:136-259`).
  - "job": the flat FD-column job batch within one solve — sharded so one
    scene's thousands of perturbation steps spread over chips; XLA inserts
    the all-gather when columns are scattered back into A/B.

Single-chip, single-host multi-chip, and multi-host all use the same code:
only the mesh shape changes.  Collectives ride ICI within a slice; the
scene axis is the one to map over DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.fused import make_fused_optimise
from ..solver.ilqr import ILQRConfig
from ..tasks.base import Task


def make_mesh(
    devices: Optional[Sequence] = None,
    scene_axis: Optional[int] = None,
) -> Mesh:
    """1-D or 2-D mesh over available devices: axes ("scene", "job")."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if scene_axis is None:
        scene_axis = n  # default: all devices on the scene axis
    job_axis = n // scene_axis
    arr = np.array(devices).reshape(scene_axis, job_axis)
    return Mesh(arr, axis_names=("scene", "job"))


def make_sharded_batch_optimise(task: Task, cfg: ILQRConfig, H: int,
                                mesh: Mesh):
    """Scene x job sharded optimiser: scenes over the "scene" axis AND each
    solve's derivative jobs over the "job" axis (SURVEY §2.3 — the axis that
    makes ONE solve faster with more chips).

    One shard_map over the whole mesh: scene args are split over "scene";
    inside, the fused solver's derivative engine slices its keypoint-time /
    job batch by jax.lax.axis_index("job") and psums the A/B assembly over
    ICI.  All non-derivative phases run replicated over "job" (identical
    inputs -> identical results), so out_specs declare job-replication.

    Returns optimise_batch(qpos0 (B,nq), qvel0, U0, targets) with B a
    multiple of the scene-axis size.
    """
    from jax.experimental.shard_map import shard_map

    n_job = mesh.shape["job"]

    def one(qpos0, qvel0, U0, targets):
        t = task.replace(residual_targets=targets)
        return make_fused_optimise(
            t, cfg, H, shard_axis="job" if n_job > 1 else None,
            num_shards=n_job,
        )(qpos0, qvel0, U0)

    local = jax.vmap(one)

    @jax.jit
    def optimise_batch(qpos0, qvel0, U0, targets):
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P("scene"), P("scene"), P("scene"), P("scene")),
            out_specs=P("scene"),
            check_rep=False,
        )(qpos0, qvel0, U0, targets)

    return optimise_batch


def make_batch_optimise(task: Task, cfg: ILQRConfig, H: int, mesh: Mesh):
    """Sharded multi-scene optimiser: (B, ...) scene batch over the mesh.

    Returns optimise_batch(qpos0 (B,nq), qvel0 (B,nv), U0 (B,H,nu),
    targets (B, ntargets)) -> FusedResult batched over B.  B must be a
    multiple of the mesh "scene" axis size.
    """
    fused = make_fused_optimise(task, cfg, H)

    def one(qpos0, qvel0, U0, targets):
        t = task.replace(residual_targets=targets)
        # rebuild the fused fn against the per-scene task: cheap, traced once
        return make_fused_optimise(t, cfg, H)(qpos0, qvel0, U0)

    batched = jax.vmap(one)
    scene_sharding = NamedSharding(mesh, P("scene"))

    @jax.jit
    def optimise_batch(qpos0, qvel0, U0, targets):
        args = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, scene_sharding),
            (qpos0, qvel0, U0, targets),
        )
        return batched(*args)

    return optimise_batch
