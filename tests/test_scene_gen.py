"""Per-task random scene generation (ReturnRandomStartState,
`/root/reference/src/ModelTranslator/TwoDPushing.cpp:29-188`): clutter
scenes must be collision-free at t=0 — every object pair separated by more
than two cylinder radii — and goals must lie in the reference's sampling
annulus."""

import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.tasks.pushing import make_pushing


def _check_scenes(task, n_obstacles, n=25, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        start, bodies, targets = task.scene_generator_fn(task, rng)
        assert len(bodies) == 1 + n_obstacles
        xy = np.array([[b[0], b[1]] for b in bodies])
        for i in range(len(xy)):
            for j in range(i + 1, len(xy)):
                d = np.hypot(*(xy[i] - xy[j]))
                assert d > 0.1, (i, j, d)  # 2 * r=0.05 cylinders
        assert np.all(np.isfinite(targets)) and targets.shape == (2,)


def test_push_low_clutter_scenes_collision_free():
    task = make_pushing(3, dtype=jnp.float64)
    _check_scenes(task, 3)


def test_push_heavy_clutter_scenes_collision_free():
    task = make_pushing(7, dtype=jnp.float64)
    _check_scenes(task, 7)


def test_push_ncl_goal_annulus():
    task = make_pushing(0, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    for _ in range(25):
        _, bodies, tg = task.scene_generator_fn(task, rng)
        start = np.array([bodies[0][0], bodies[0][1]])
        d = np.hypot(*(tg - start))
        assert 0.27 < d < 0.31  # randDist in (0.28, 0.3)
