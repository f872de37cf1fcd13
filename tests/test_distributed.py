"""Two-process jax.distributed integration test (the DCN half of the
communication backend, SURVEY §2.3: scene axis across hosts).

Spawns two fresh CPU-only processes that call parallel.shard.init_distributed
against a local coordinator, build a 2-process global mesh, and psum a
per-process value across processes — exercising exactly the
jax.distributed.initialize passthrough the multi-host campaign path uses.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["REPO_ROOT"])
from trajoptkp_tpu.parallel.shard import init_distributed

coord = os.environ["COORD"]
pid = int(os.environ["PROC_ID"])
init_distributed(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
n_global = len(jax.devices())
assert n_global == 4, n_global  # 2 local CPU devices x 2 processes

mesh = Mesh(jax.devices(), ("scene",))
# global array: each device holds its device-index + 1
from jax.experimental import multihost_utils
import numpy as np

local = jnp.full((2, 4), float(pid + 1))
sharding = NamedSharding(mesh, P("scene"))
garr = jax.make_array_from_process_local_data(sharding, np.asarray(local))

@jax.jit
def total(x):
    return jnp.sum(x)

out = float(total(garr))
# processes 0 and 1 contribute 2*4*1 and 2*4*2 -> 24
assert abs(out - 24.0) < 1e-6, out
print(f"proc {pid}: global sum OK = {out}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORD=coord, PROC_ID=str(pid), REPO_ROOT=repo,
            JAX_PLATFORMS="cpu",
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "global sum OK = 24.0" in out, out
