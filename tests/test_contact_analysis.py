"""Contact-derivative analysis campaign tests (AnalyseToyContact parity,
GenTestingData.cpp:961-1327)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.bench.campaigns import (analyse_toy_contact,
                                           analyse_toy_contact_keypoints,
                                           pair_contact_flags,
                                           smooth_contact_mask)
from trajoptkp_tpu.config.loader import make_task
from trajoptkp_tpu.solver import ilqr as il

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (README: test tiers)


def test_smooth_contact_mask_clears_window():
    mask = jnp.ones((20, 3), dtype=bool)
    contact = np.zeros(20, dtype=bool)
    contact[10:] = True
    out = np.asarray(smooth_contact_mask(mask, contact, 2))
    assert not out[8:12].any()         # [t0-2, t0+2) cleared
    assert out[:8].all() and out[12:].all()
    # no contact: unchanged
    out2 = np.asarray(smooth_contact_mask(mask, np.zeros(20, bool), 5))
    assert out2.all()


def test_contact_flags_detect_piston_impact(tmp_path):
    task = make_task("piston_block")
    H = 120
    U = jnp.full((H, task.model.nu), 6.0, task.model.dtype)
    traj = il.rollout(task, task.qpos_start, task.qvel_start, U)
    flags = pair_contact_flags(task, traj, "piston", "goal")
    assert not flags[0]                # starts separated
    assert flags.any()                 # impact happens under constant push
    t0 = int(np.flatnonzero(flags)[0])
    assert 1 < t0 < H - 1


def test_analyse_toy_contact_campaign(tmp_path):
    task = make_task("piston_block")
    rows = analyse_toy_contact(
        task, 100, smoothing_range=(2, 8), out_dir=str(tmp_path / "a")
    )
    assert [r["smoothing"] for r in rows] == [0, 2, 8]
    # smoothing drops keypoints -> fewer derivatives computed
    assert rows[1]["percent_derivs"] <= rows[0]["percent_derivs"]
    assert rows[2]["percent_derivs"] <= rows[1]["percent_derivs"]
    assert (tmp_path / "a" / "summary.csv").exists()
    rows_k = analyse_toy_contact_keypoints(
        task, 100, min_N_range=(1, 10), out_dir=str(tmp_path / "b")
    )
    assert rows_k[0]["percent_derivs"] > rows_k[1]["percent_derivs"]
    assert (tmp_path / "b" / "summary.csv").exists()
