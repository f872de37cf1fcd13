"""FD solver-clamp parity mode (VERDICT r3 missing #5): the experiment that
quantifies the divergence caused by the reference's clamped-FD kernel
(`/root/reference/src/PhysicsSimulators/MuJoCoHelper.cpp:925-937`) vs
differentiating the exact rollout step (dynamics/step.py:step_state)."""

import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.bench.campaigns import fd_clamp_analysis
from trajoptkp_tpu.tasks.toys import make_piston_block


def test_fd_clamp_divergence_piston(tmp_path):
    task = make_piston_block(dtype=jnp.float64)
    rows = fd_clamp_analysis(
        task, horizon=60, n_states=6, out_dir=str(tmp_path)
    )
    assert len(rows) == 6
    # FD of the exact step agrees with jacfwd of the exact step to FD
    # truncation error everywhere
    assert max(r["fd_vs_exact"] for r in rows) < 1e-5
    # the clamp matters only where constraints are active; smooth states
    # are bit-identical up to FD error
    smooth = [r for r in rows if not r["contact_active"]]
    for r in smooth:
        assert r["clamp_vs_fd"] < 1e-7
    assert (tmp_path / "fd_clamp.csv").exists()
