"""Does the init-controls rollout actually contact/push the object?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import os
import sys

mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
if mode == "f64":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_enable_x64", True)
else:
    import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from trajoptkp_tpu.app import _batch_init_controls
from trajoptkp_tpu.config.loader import load_scenes_for_task, make_task
from trajoptkp_tpu.solver.ilqr import rollout

dtype = jnp.float64 if mode == "f64" else jnp.float32
task = make_task("pushing_no_clutter", dtype=dtype)
H = 1000
qpos, qvel, targets = load_scenes_for_task(
    task, "/root/reference/TestTasks/push_ncl", 2)
qpos, qvel, U = _batch_init_controls(task, H, qpos, qvel, targets)

model = task.model
ee_site = model.site_names.index("ee")
goal_body = model.body_names.index("goal")
goal_jnt = model.joint_names.index("goal")
goal_qadr = int(model.jnt_qposadr[goal_jnt])

from trajoptkp_tpu.dynamics.fk import forward_kinematics
from trajoptkp_tpu.dynamics.model import Data

for i in range(2):
    t = task.replace(residual_targets=jnp.asarray(targets[i], dtype))
    traj = rollout(t, jnp.asarray(qpos[i], dtype), jnp.asarray(qvel[i], dtype),
                   jnp.asarray(U[i], dtype))
    # FK at a few steps to see EE vs object
    obj_xy = np.asarray(traj.qpos[:, goal_qadr:goal_qadr + 2])
    print(f"scene {i} target {np.asarray(targets[i])[:2].round(3)}")
    print("  obj xy start", obj_xy[0].round(4), "end", obj_xy[-1].round(4),
          "moved", np.linalg.norm(obj_xy[-1] - obj_xy[0]).round(4))
    dists = []
    for tt in range(0, H + 1, 100):
        d = forward_kinematics(model, Data(
            qpos=traj.qpos[tt], qvel=traj.qvel[tt],
            ctrl=jnp.zeros((model.nu,), dtype), time=jnp.zeros((), dtype)))
        ee = np.asarray(d.site_xpos[ee_site])
        ob = np.asarray(d.xpos[goal_body])
        dists.append(np.linalg.norm(ee[:2] - ob[:2]))
    print("  ee-obj xy dist every 100:", np.array(dists).round(3))
    print("  costs head/tail:", np.asarray(traj.costs)[:3].round(3),
          np.asarray(traj.costs)[-3:].round(3))
