"""Temporal filtering of dynamics derivatives (A-matrix velocity rows).

Reproduces Optimiser::FilterDynamicsMatrices / FilterIndValLowPass /
FilterIndValFIRFilter (`/root/reference/src/Optimiser/Optimiser.cpp:340-406`):
only the velocity rows (dof..2dof-1) of A are filtered along time.

  - low-pass: yn = (1-a) yn_1 + a (xn + xn_1)/2, a = 0.25
    (first-order IIR — a lax.scan over time, vectorised over all matrix
    entries at once instead of the reference's per-entry loops)
  - FIR: causal convolution with coefficients {0.1, 0.15, 0.5, 0.15, 0.1}
    (a depthwise conv along time, fully parallel)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOW_PASS_A = 0.25
FIR_DEFAULT = (0.1, 0.15, 0.5, 0.15, 0.1)


def low_pass(x: jnp.ndarray, a: float = LOW_PASS_A) -> jnp.ndarray:
    """First-order IIR along axis 0; x: (H, ...)."""

    def body(carry, xn):
        yn1, xn1 = carry
        yn = (1.0 - a) * yn1 + a * (xn + xn1) / 2.0
        return (yn, xn), yn

    (_, _), y = jax.lax.scan(body, (x[0], x[0]), x)
    return y


def fir(x: jnp.ndarray, coeffs=FIR_DEFAULT) -> jnp.ndarray:
    """Causal FIR along axis 0 with zero left-padding; x: (H, ...)."""
    H = x.shape[0]
    y = jnp.zeros_like(x)
    for j, c in enumerate(coeffs):
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:j]), x[: H - j]], axis=0
        )
        y = y + c * shifted
    return y


def filter_dynamics(A: jnp.ndarray, method: str,
                    a: float = LOW_PASS_A, coeffs=FIR_DEFAULT) -> jnp.ndarray:
    """Filter the velocity rows of A (H, 2n, 2n) along time."""
    if method in (None, "none"):
        return A
    n = A.shape[1] // 2
    vel_rows = A[:, n:, :]
    if method == "low_pass":
        filt = low_pass(vel_rows, a)
    elif method == "FIR":
        filt = fir(vel_rows, coeffs)
    else:
        raise ValueError(f"unknown filtering method: {method}")
    return A.at[:, n:, :].set(filt)
