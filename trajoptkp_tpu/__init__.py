"""trajoptkp_tpu: TPU-native keypoint-iLQR trajectory optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DMackRus/TrajOptKP (see SURVEY.md): a pure-JAX rigid-body + contact dynamics
engine, batched finite-difference / autodiff dynamics Jacobians at adaptively
selected keypoints, scan-based iLQR (+ state-vector reduction), synchronous
and asynchronous MPC, a YAML task system and a benchmarking harness —
parallelised as batch/shard dimensions over a TPU mesh instead of the
reference's C++ thread pools.
"""

__version__ = "0.1.0"
