"""Keypoint selection methods as pure array programs.

TPU-native re-design of the reference KeypointGenerator
(`/root/reference/src/KeyPointGenerator/KeyPointGenerator.cpp`).  Keypoint
sets are represented as a boolean mask (H, ndof) instead of ragged per-step
lists (XLA needs static shapes; SURVEY.md §7.4).

Method semantics reproduced exactly:
  - set_interval            (`KeyPointGenerator.cpp:319-339`)
  - adaptive_jerk / accel   (`:341-382`, profiles `:730-795`)
  - velocity_change         (`:642-728`)
  - auto-adjust / order-of-importance (`:137-278`, `:384-447`)
(iterative_error lives in iterative.py — it drives the FD engine itself.)

The per-timestep sequential threshold logic (last-keypoint counters) is a
`lax.scan` over time with all dofs vectorised in the carry — cheap (H scalar
steps over (ndof,) lanes) and fully jittable, unlike the reference's nested
Python-style loops.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KeypointConfig:
    """Mirror of the reference `keypoint_method` struct
    (`/root/reference/include/KeyPointGenerator.h:34-43`)."""

    name: str = struct.field(pytree_node=False, default="set_interval")
    min_N: int = struct.field(pytree_node=False, default=1)
    max_N: int = struct.field(pytree_node=False, default=1)
    auto_adjust: bool = struct.field(pytree_node=False, default=False)
    jerk_thresholds: jnp.ndarray = None            # (ndof,)
    accel_thresholds: jnp.ndarray = None           # (ndof,)
    velocity_change_thresholds: jnp.ndarray = None # (ndof,)
    iterative_error_threshold: float = struct.field(
        pytree_node=False, default=1e-4
    )


# ---------------------------------------------------------------------------
# profiles (KeyPointGenerator.cpp:730-795)
# ---------------------------------------------------------------------------


def jerk_profile(vel_traj: jnp.ndarray, dt) -> jnp.ndarray:
    """|vel[t+2] - 2 vel[t+1] + vel[t]| / dt^2, zero-padded at the tail.

    vel_traj: (H, ndof) velocity part of the state trajectory.
    """
    H = vel_traj.shape[0]
    a1 = (vel_traj[1:] - vel_traj[:-1]) / dt          # (H-1, ndof)
    jerk = jnp.abs((a1[1:] - a1[:-1]) / dt)           # (H-2, ndof)
    return jnp.concatenate([jerk, jnp.zeros_like(vel_traj[:2])], axis=0)


def accel_profile(vel_traj: jnp.ndarray) -> jnp.ndarray:
    """vel[t+1] - vel[t] (undivided, as the reference does), tail-padded."""
    acc = vel_traj[1:] - vel_traj[:-1]
    return jnp.concatenate([acc, jnp.zeros_like(vel_traj[:1])], axis=0)


# ---------------------------------------------------------------------------
# selectors
# ---------------------------------------------------------------------------


def set_interval(H: int, ndof: int, min_N: int) -> jnp.ndarray:
    t = jnp.arange(H)
    row = (t % min_N == 0) | (t == H - 1)
    return jnp.broadcast_to(row[:, None], (H, ndof))


def adaptive(
    profile: jnp.ndarray, thresholds: jnp.ndarray, min_N: int, max_N: int
) -> jnp.ndarray:
    """adaptive_jerk / adaptive_accel keypoints (KeyPointGenerator.cpp:341-382).

    Per dof: keypoint when interval >= min_N and profile > threshold, or when
    interval >= max_N; first and last steps always keypoints.

    Shape-generic: profile may be (H, ndof) or (H, ndof, lanes) — thresholds
    must broadcast against profile[t] (pass thresholds[:, None] for lanes).
    """
    H = profile.shape[0]
    rest = profile.shape[1:]

    def body(last_idx, t):
        gap = t - last_idx
        hit_thresh = (gap >= min_N) & (profile[t] > thresholds)
        last1 = jnp.where(hit_thresh, t, last_idx)
        hit_max = (t - last1) >= max_N
        last2 = jnp.where(hit_max, t, last1)
        return last2.astype(last_idx.dtype), hit_thresh | hit_max

    _, rows = jax.lax.scan(
        body,
        jnp.zeros(rest, dtype=jnp.arange(1).dtype),
        jnp.arange(1, H - 1),
    )
    full = jnp.ones((1,) + rest, dtype=bool)
    return jnp.concatenate([full, rows, full], axis=0)


def velocity_change(
    vel_traj: jnp.ndarray, thresholds: jnp.ndarray, min_N: int, max_N: int
) -> jnp.ndarray:
    """velocity_change keypoints (KeyPointGenerator.cpp:642-728).

    Cumulative |velocity| since last keypoint above threshold, or velocity
    turning point, or max_N exceeded — each gated by min_N.  The reference
    only updates the stored direction while the counter is below min_N; we
    reproduce that behaviour bit-for-bit.

    Shape-generic like `adaptive`: vel_traj (H, ndof[, lanes]); thresholds
    must broadcast against vel_traj[t].
    """
    H = vel_traj.shape[0]
    rest = vel_traj.shape[1:]

    class Carry(NamedTuple):
        counter: jnp.ndarray
        acc: jnp.ndarray
        last_dir: jnp.ndarray

    def body(c: Carry, t):
        counter = c.counter + 1
        cur_dir = vel_traj[t] - vel_traj[t - 1]
        acc = c.acc + jnp.abs(vel_traj[t])

        ge_min = counter >= min_N
        hit_acc = ge_min & (jnp.abs(acc) > thresholds)
        hit_turn = ge_min & ~hit_acc & (cur_dir * c.last_dir < 0)
        # direction memory only updates when counter < min_N (reference :699-701)
        new_dir = jnp.where(ge_min, c.last_dir, cur_dir)
        hit_max = ~hit_acc & ~hit_turn & (counter >= max_N)
        hit = hit_acc | hit_turn | hit_max
        return (
            Carry(
                counter=jnp.where(hit, 0, counter),
                acc=jnp.where(hit, 0.0, acc),
                last_dir=new_dir,
            ),
            hit,
        )

    init = Carry(
        counter=jnp.zeros(rest, dtype=jnp.int32),
        acc=jnp.zeros(rest, dtype=vel_traj.dtype),
        last_dir=jnp.zeros(rest, dtype=vel_traj.dtype),
    )
    _, rows = jax.lax.scan(body, init, jnp.arange(1, H))
    full = jnp.ones((1,) + rest, dtype=bool)
    rows = rows.at[-1].set(True)  # last step: all dofs (reference :725-727)
    return jnp.concatenate([full, rows], axis=0)


def order_of_importance(
    vel_traj: jnp.ndarray, dt, num_keypoints: jnp.ndarray
) -> jnp.ndarray:
    """Place each dof's budget of keypoints at its highest-jerk times
    (GenerateKeypointsOrderOfImportance, KeyPointGenerator.cpp:384-447).

    num_keypoints: (ndof,) int — includes the enforced first/last steps.
    Candidate times are t in [1, H-3] (reference sorts jerk_profile[1..H-3]).
    """
    H, ndof = vel_traj.shape
    jerk = jerk_profile(vel_traj, dt)  # (H, ndof)
    cand = jerk[1 : H - 2]             # (H-3, ndof)
    # rank of each candidate time per dof (0 = largest jerk); stable like
    # std::sort of SortIndices
    order = jnp.argsort(-cand, axis=0, stable=True)      # (H-3, ndof)
    ranks = jnp.argsort(order, axis=0, stable=True)      # rank per time
    chosen = ranks < jnp.maximum(num_keypoints - 2, 0)[None, :]
    mask = jnp.zeros((H, ndof), dtype=bool)
    mask = mask.at[1 : H - 2].set(chosen)
    mask = mask.at[0].set(True).at[H - 1].set(True)
    return mask


def desired_percentages(
    expected,
    actual,
    last_percentages: jnp.ndarray,
    dof_importances: jnp.ndarray,
    surprise_lower: float = 0.1,
) -> jnp.ndarray:
    """Surprise controller (DesiredPercentageDerivs, KeyPointGenerator.cpp:209-278)."""
    surprise = actual / expected
    # cost-reduced branch
    raw_low = jnp.maximum(-2.0 - expected**2, -5.0)
    raw_high = 3.0 * surprise**2 + 2.0
    raw = jnp.where(surprise < surprise_lower, raw_low, raw_high)
    raw = jnp.minimum(raw, 5.0)
    adj = jnp.where(
        dof_importances == 0.0, raw, raw * (1.0 / jnp.where(
            dof_importances == 0.0, 1.0, dof_importances))
    )
    dec = last_percentages - adj
    # no-cost-reduction branch
    raw2 = jnp.minimum(expected**2, 5.0)
    inc = last_percentages + raw2 * dof_importances
    return jnp.where(actual > 0, dec, inc)


def auto_adjust_mask(
    vel_traj: jnp.ndarray,
    dt,
    expected,
    actual,
    last_percentages: jnp.ndarray,
    dof_importances: jnp.ndarray,
    max_N: int,
) -> jnp.ndarray:
    """AdjustKeyPointMethod (KeyPointGenerator.cpp:137-207): surprise-driven
    percentage update, clamped, then order-of-importance placement."""
    H = vel_traj.shape[0]
    pct = desired_percentages(expected, actual, last_percentages, dof_importances)
    num_kp = jnp.round(pct / 100.0 * H).astype(jnp.int32)
    lower = int(-(-H // max_N)) + 1  # ceil(H / max_N) + 1
    num_kp = jnp.clip(num_kp, lower, H)
    return order_of_importance(vel_traj, dt, num_kp)


def percentage_derivs(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-dof percentage of timesteps with computed derivatives
    (ComputePercentageDerivatives, KeyPointGenerator.cpp:816-838)."""
    H = mask.shape[0]
    return 100.0 * jnp.sum(mask, axis=0) / H


def generate_keypoints(
    cfg: KeypointConfig,
    vel_traj: jnp.ndarray,
    dt,
) -> jnp.ndarray:
    """Dispatch on method name (GenerateKeyPoints, KeyPointGenerator.cpp:76-135).

    vel_traj: (H, ndof) velocities of the state-vector dofs along the nominal
    trajectory.  Returns mask (H, ndof).
    """
    H, ndof = vel_traj.shape
    if cfg.name == "set_interval":
        return set_interval(H, ndof, cfg.min_N)
    if cfg.name == "adaptive_jerk":
        return adaptive(
            jerk_profile(vel_traj, dt), cfg.jerk_thresholds, cfg.min_N, cfg.max_N
        )
    if cfg.name == "adaptive_accel":
        return adaptive(
            accel_profile(vel_traj), cfg.accel_thresholds, cfg.min_N, cfg.max_N
        )
    if cfg.name == "velocity_change":
        return velocity_change(
            vel_traj, cfg.velocity_change_thresholds, cfg.min_N, cfg.max_N
        )
    raise ValueError(f"unknown keypoint method: {cfg.name}")


def generate_keypoints_lanes(
    cfg: KeypointConfig,
    vel_traj: jnp.ndarray,
    dt,
) -> jnp.ndarray:
    """Lane-last variant of generate_keypoints: vel_traj (H, ndof, B) ->
    mask (H, ndof, B), same per-dof algorithms (the scans carry (ndof, B)
    registers — solver/lanes.py adaptive-keypoint path)."""
    H, ndof, _ = vel_traj.shape
    if cfg.name == "set_interval":
        return jnp.broadcast_to(
            set_interval(H, ndof, cfg.min_N)[:, :, None], vel_traj.shape
        ).astype(bool)
    if cfg.name == "adaptive_jerk":
        return adaptive(
            jerk_profile(vel_traj, dt), cfg.jerk_thresholds[:, None],
            cfg.min_N, cfg.max_N,
        )
    if cfg.name == "adaptive_accel":
        return adaptive(
            accel_profile(vel_traj), cfg.accel_thresholds[:, None],
            cfg.min_N, cfg.max_N,
        )
    if cfg.name == "velocity_change":
        return velocity_change(
            vel_traj, cfg.velocity_change_thresholds[:, None],
            cfg.min_N, cfg.max_N,
        )
    raise ValueError(f"unsupported lane keypoint method: {cfg.name}")
