"""Golden-trajectory regression (the BASELINE.json acceptance criterion:
control sequences reproduce within tolerance at a fixed horizon + keypoint
schedule).  Regenerate tests/golden/*.npz deliberately when solver semantics
change on purpose."""

import os

import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.solver.ilqr import ILQRConfig, optimise
from trajoptkp_tpu.tasks.toys import make_acrobot

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_acrobot_si5_golden():
    z = np.load(os.path.join(GOLDEN, "acrobot_si5_h200.npz"))
    task = make_acrobot().replace(
        weights=jnp.array([0.0, 0.0, 0.001, 0.001, 0.01]),
        weights_terminal=jnp.array([100.0, 100.0, 1.0, 1.0, 0.01]),
        keypoint_cfg=make_acrobot().keypoint_cfg.replace(
            name="set_interval", min_N=5
        ),
    )
    H = 200
    traj, stats = optimise(
        task, task.qpos_start, task.qvel_start, jnp.zeros((H, 1)),
        ILQRConfig(max_iterations=6, min_iterations=6),
    )
    np.testing.assert_allclose(
        np.asarray(traj.ctrl), z["ctrl"], atol=1e-6,
        err_msg="control sequence drifted from golden",
    )
    np.testing.assert_allclose(
        np.asarray(traj.qpos), z["qpos"], atol=1e-6
    )
    assert abs(stats.final_cost - float(z["final_cost"])) < 1e-6
