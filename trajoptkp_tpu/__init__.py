"""trajoptkp_tpu: TPU-native keypoint-iLQR trajectory optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DMackRus/TrajOptKP (see SURVEY.md): a pure-JAX rigid-body + contact dynamics
engine, batched finite-difference / autodiff dynamics Jacobians at adaptively
selected keypoints, scan-based iLQR (+ state-vector reduction), synchronous
and asynchronous MPC, a YAML task system and a benchmarking harness —
parallelised as batch/shard dimensions over a TPU mesh instead of the
reference's C++ thread pools.
"""

import jax as _jax

# Physics requires true-f32 arithmetic: TPU's default "fastest" matmul
# precision routes f32 matmuls through bf16 MXU passes, which breaks the
# contact solver's Cholesky pipelines (NaNs at long horizons).  The
# framework's matrices are tiny (nv <= ~30), so full-precision matmuls cost
# nothing; batching provides the throughput, not the MXU tile width.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
