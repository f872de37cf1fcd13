"""Keypoint method invariants + exact interpolation algebra.

Mirrors the reference test strategy
(`/root/reference/src/tests/Keypoints_Test.cpp`): placement invariants on a
real simulated trajectory, and hand-checkable linear interpolation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptkp_tpu.keypoints import (KeypointConfig, adaptive,
                                     generate_keypoints,
                                     interpolate_derivatives, jerk_profile,
                                     order_of_importance, percentage_derivs,
                                     prev_next_keypoints, set_interval,
                                     velocity_change)

H, NDOF = 100, 3
DT = 0.01


@pytest.fixture(scope="module")
def vel_traj():
    """Smooth synthetic velocity trajectory (analogue of CreateTrajectory)."""
    t = np.linspace(0, 2 * np.pi, H)[:, None]
    phases = np.array([0.0, 1.0, 2.5])[None, :]
    freqs = np.array([1.0, 2.0, 0.5])[None, :]
    return jnp.asarray(np.sin(freqs * t + phases) * np.array([1.0, 3.0, 0.3]))


def gaps_ok(mask, max_N):
    m = np.asarray(mask)
    for i in range(m.shape[1]):
        idx = np.flatnonzero(m[:, i])
        assert idx[0] == 0 and idx[-1] == H - 1
        assert np.all(np.diff(idx) <= max_N), f"dof {i} gap > {max_N}"


def test_set_interval_placement():
    for n in (1, 5, 17):
        mask = np.asarray(set_interval(H, NDOF, n))
        expect = np.zeros(H, dtype=bool)
        expect[::n] = True
        expect[H - 1] = True
        for i in range(NDOF):
            np.testing.assert_array_equal(mask[:, i], expect)


def test_set_interval_1_is_full():
    mask = set_interval(H, NDOF, 1)
    assert bool(jnp.all(mask))
    np.testing.assert_allclose(np.asarray(percentage_derivs(mask)), 100.0)


def test_adaptive_jerk_invariants(vel_traj):
    prof = jerk_profile(vel_traj, DT)
    thresholds = jnp.array([5.0, 50.0, 1.0])
    for min_N, max_N in [(1, 10), (3, 20), (5, 50)]:
        mask = adaptive(prof, thresholds, min_N, max_N)
        gaps_ok(mask, max_N)
        # interior keypoints respect min_N spacing
        m = np.asarray(mask)
        for i in range(NDOF):
            idx = np.flatnonzero(m[1:-1, i]) + 1
            if len(idx) > 1:
                assert np.all(np.diff(idx) >= min_N)


def test_velocity_change_invariants(vel_traj):
    thresholds = jnp.array([2.0, 10.0, 0.5])
    for min_N, max_N in [(1, 10), (2, 25)]:
        mask = velocity_change(vel_traj, thresholds, min_N, max_N)
        gaps_ok(mask, max_N)


def test_order_of_importance_budget(vel_traj):
    num_kp = jnp.array([2, 10, 50])
    mask = np.asarray(order_of_importance(vel_traj, DT, num_kp))
    counts = mask.sum(axis=0)
    assert counts[0] == 2  # first + last only
    assert counts[1] == 10
    assert counts[2] == 50
    assert mask[0].all() and mask[-1].all()


def test_prev_next():
    mask = jnp.zeros((10, 1), dtype=bool).at[jnp.array([0, 4, 9])].set(True)
    prev, nxt = prev_next_keypoints(mask)
    np.testing.assert_array_equal(
        np.asarray(prev[:, 0]), [0, 0, 0, 0, 4, 4, 4, 4, 4, 9]
    )
    np.testing.assert_array_equal(
        np.asarray(nxt[:, 0]), [0, 4, 4, 4, 4, 9, 9, 9, 9, 9]
    )


def test_interpolation_exact_lerp():
    """Interior steps equal hand-computed lerp (Keypoints_Test.cpp:204-308)."""
    n, nu = 2, 2
    rng = np.random.default_rng(0)
    Hh = 9
    mask = np.zeros((Hh, n), dtype=bool)
    mask[[0, 4, 8], :] = True
    A_kp = np.zeros((Hh, 2 * n, 2 * n))
    B_kp = np.zeros((Hh, 2 * n, nu))
    for t in [0, 4, 8]:
        A_kp[t] = rng.standard_normal((2 * n, 2 * n))
        B_kp[t] = rng.standard_normal((2 * n, nu))
    A, B = interpolate_derivatives(
        jnp.asarray(A_kp), jnp.asarray(B_kp), jnp.asarray(mask), nu
    )
    A, B = np.asarray(A), np.asarray(B)
    for t in range(1, 4):
        w = t / 4
        np.testing.assert_allclose(A[t], (1 - w) * A_kp[0] + w * A_kp[4], atol=1e-12)
        np.testing.assert_allclose(B[t], (1 - w) * B_kp[0] + w * B_kp[4], atol=1e-12)
    for t in range(5, 8):
        w = (t - 4) / 4
        np.testing.assert_allclose(A[t], (1 - w) * A_kp[4] + w * A_kp[8], atol=1e-12)
    # keypoints untouched
    for t in [0, 4, 8]:
        np.testing.assert_allclose(A[t], A_kp[t], atol=1e-12)
        np.testing.assert_allclose(B[t], B_kp[t], atol=1e-12)


def test_interpolation_identity_when_all_keypoints():
    """Property: interp(A) == A when every step is a keypoint (SURVEY §4)."""
    n, nu = 3, 2
    rng = np.random.default_rng(1)
    A_kp = jnp.asarray(rng.standard_normal((12, 2 * n, 2 * n)))
    B_kp = jnp.asarray(rng.standard_normal((12, 2 * n, nu)))
    mask = jnp.ones((12, n), dtype=bool)
    A, B = interpolate_derivatives(A_kp, B_kp, mask, nu)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_kp), atol=1e-12)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B_kp), atol=1e-12)


def test_generate_keypoints_dispatch(vel_traj):
    cfg = KeypointConfig(
        name="adaptive_jerk",
        min_N=2,
        max_N=20,
        jerk_thresholds=jnp.array([5.0, 50.0, 1.0]),
    )
    mask = generate_keypoints(cfg, vel_traj, DT)
    gaps_ok(mask, 20)
