"""Humanoid standing/balance task.

Mirrors Humanoid (`/root/reference/src/ModelTranslator/Humanoid.cpp`):
  - residual 0: stand upright — head height above mean foot-site height
    minus 1.5 m (`Humanoid.cpp:` head_feet_error)
  - residual 1: balance — horizontal distance between the capture point
    (CoM + kFallTime * CoM velocity, kFallTime = 0.2 s) and the mean foot
    position
  - residuals 2..: per-actuator control magnitudes

CoM quantities come from the engine's own FK products (mass-weighted xipos;
CoM velocity from the spatial body velocities) instead of MuJoCo sensors.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..dynamics.mjcf import load_mjcf
from ..keypoints.methods import KeypointConfig
from ..state.statevector import full_state_vector
from .base import Task

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")


def make_humanoid(dtype=jnp.float64) -> Task:
    model = load_mjcf(os.path.join(_MODELS_DIR, "humanoid.xml"), dtype=dtype)
    sv = full_state_vector(model, dtype=dtype)
    nu = model.nu
    head = model.site_names.index("head")
    feet = [model.site_names.index(s) for s in ("sp0", "sp1", "sp2", "sp3")]
    masses = model.body_mass
    total_mass = jnp.sum(masses)
    k_fall = 0.2

    def residual_fn(m, data, targets):
        head_z = data.site_xpos[head][2]
        feet_z = jnp.mean(
            jnp.stack([data.site_xpos[f][2] for f in feet])
        )
        upright = (head_z - feet_z) - 1.5

        # CoM and CoM velocity from FK products
        com = jnp.einsum("b,bi->i", masses, data.xipos) / total_mass
        # body CoM velocities: v_com_b = lin + w x c_b (cvel about origin)
        if data.cdof is not None and data.cdof.shape[0]:
            cvel = m.ancestor_mask @ (data.cdof * data.qvel[:, None])
            v_com_b = cvel[:, 3:] + jnp.cross(cvel[:, :3], data.xipos)
            com_vel = jnp.einsum("b,bi->i", masses, v_com_b) / total_mass
        else:
            com_vel = jnp.zeros(3, dtype=data.qpos.dtype)
        capture = com[:2] + k_fall * com_vel[:2]
        feet_xy = jnp.mean(
            jnp.stack([data.site_xpos[f][:2] for f in feet]), axis=0
        )
        balance = jnp.sqrt(jnp.sum((capture - feet_xy) ** 2) + 1e-12)

        return jnp.concatenate(
            [jnp.stack([upright, balance]), data.ctrl]
        )

    def complete_fn(m, data, targets):
        # standing never "completes"; distance = upright error
        head_z = data.site_xpos[head][2]
        return jnp.zeros((), bool), jnp.abs(head_z - 1.5)

    return Task(
        name="humanoid",
        residual_names=(
            "stand_upright", "balance", *(f"ctrl_{i}" for i in range(nu)),
        ),
        residual_fn=residual_fn,
        task_complete_fn=complete_fn,
        model=model,
        sv=sv,
        residual_targets=jnp.zeros((2 + nu,), dtype=dtype),
        weights=jnp.array([10.0, 10.0] + [0.1] * nu, dtype=dtype),
        weights_terminal=jnp.array([10.0, 10.0] + [0.1] * nu, dtype=dtype),
        qpos_start=jnp.asarray(model.qpos0, dtype=dtype),
        qvel_start=jnp.zeros((model.nv,), dtype=dtype),
        keypoint_cfg=KeypointConfig(
            name="set_interval",
            min_N=1,
            max_N=20,
            jerk_thresholds=jnp.full((model.nv,), 1.0, dtype),
            accel_thresholds=jnp.full((model.nv,), 1.0, dtype),
            velocity_change_thresholds=jnp.full((model.nv,), 0.5, dtype),
        ),
        openloop_horizon=300,
        mpc_horizon=40,
    )
