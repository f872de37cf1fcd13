"""Tracing / profiling utilities.

The reference instruments with manual std::chrono timers and a per-iteration
console banner (`/root/reference/include/Optimiser/Optimiser.h:176-188`,
`src/Optimiser/iLQR.cpp:950-980`).  Here the same phase taxonomy
(derivs / BP / FP / %derivs) lives in ILQRStats; this module adds:

  - `trace(dir)`: context manager around jax.profiler for device-level
    traces viewable in TensorBoard/Perfetto
  - `phase_banner(stats)`: the reference-style per-iteration banner
  - `Timer`: tiny wall-clock phase timer used by host-driven loops
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/trajoptkp_trace"):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap_ms(self) -> float:
        now = time.perf_counter()
        ms = (now - self.t0) * 1e3
        self.t0 = now
        return ms


def phase_banner(stats) -> str:
    """Reference-style summary banner (PrintBanner/PrintBannerIteration)."""
    lines = [
        "-" * 78,
        f" initial cost {stats.initial_cost:.5f} -> final "
        f"{stats.final_cost:.5f}  (reduction {stats.cost_reduction:.3f}) "
        f"in {stats.num_iterations} iterations, {stats.opt_time_ms:.1f} ms",
        "-" * 78,
        " iter |     cost | lambda  | %derivs | t_derivs | t_bp | t_fp | alpha",
    ]
    for i, c in enumerate(stats.cost_history):
        lines.append(
            f" {i:4d} | {c:8.3f} | {stats.lambdas[i]:.1e} |"
            f" {stats.percent_derivs[i]:7.1f} |"
            f" {stats.time_derivs_ms[i]:8.1f} |"
            f" {stats.time_bp_ms[i]:4.1f} | {stats.time_fp_ms[i]:4.1f} |"
            f" {stats.best_alphas[i]:.3f}"
        )
    return "\n".join(lines)
