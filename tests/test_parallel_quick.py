"""Quick-tier multi-device parity gate (VERDICT r3 weak #7/#8): a tiny-H
version of the scene x job sharded-solve parity assertion runs on every
default test invocation, not just the slow tier.  8 virtual CPU devices
(conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.parallel.mesh import make_mesh, make_sharded_batch_optimise
from trajoptkp_tpu.solver.fused import make_fused_optimise
from trajoptkp_tpu.solver.ilqr import ILQRConfig
from trajoptkp_tpu.tasks.toys import make_acrobot


def test_sharded_parity_tiny():
    task = make_acrobot()
    task = task.replace(
        keypoint_cfg=task.keypoint_cfg.replace(name="set_interval", min_N=2)
    )
    H, B = 40, 4
    cfg = ILQRConfig(max_iterations=1, min_iterations=1,
                     deriv_mode="ad_time")
    mesh = make_mesh(jax.devices(), scene_axis=2)  # 2 scenes x 4 job shards
    key = jax.random.PRNGKey(5)
    qpB = task.qpos_start + 0.2 * jax.random.normal(key, (B, task.model.nq))
    qvB = jnp.zeros((B, task.model.nv))
    UB = jnp.zeros((B, H, task.model.nu))
    tgB = jnp.tile(task.residual_targets, (B, 1))

    res_s = make_sharded_batch_optimise(task, cfg, H, mesh)(qpB, qvB, UB, tgB)
    res_f = jax.jit(jax.vmap(make_fused_optimise(task, cfg, H)))(qpB, qvB, UB)

    costs = np.asarray(res_s.final_cost)
    assert len(set(costs.tolist())) > 1  # distinct scenes -> distinct costs
    np.testing.assert_allclose(
        costs, np.asarray(res_f.final_cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_s.traj.ctrl), np.asarray(res_f.traj.ctrl), atol=1e-9
    )
