"""Small-matrix linear algebra as pure fused ops.

The hot step function solves tiny SPD systems (nv <= ~30; often 2-13) every
timestep.  LAPACK/cuSolver-style custom calls (jax.scipy cho_factor) cost a
kernel launch each — inside a 500-step lax.scan that overhead dominates the
sequential path on TPU.  For small static n we unroll Cholesky +
triangular solves into plain jnp arithmetic, which XLA fuses straight into
the surrounding step computation (and which vmaps over FD columns /
line-search alphas / scenes with zero special-casing).

Falls back to jax.scipy for n > _UNROLL_MAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_UNROLL_MAX = 20


def chol_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor L (lower) of SPD A, unrolled for static small n."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0])
             for j in range(n)],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = chol(A); b is (..., n) or (..., n, m)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k][..., None] * y[k]
        y[i] = s / L[..., i, i][..., None]
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i][..., None] * x[k]
        x[i] = s / L[..., i, i][..., None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def _sym_solve_primal(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = A.shape[-1]
    if n <= _UNROLL_MAX:
        return chol_solve_unrolled(chol_unrolled(A), b)
    return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(A), b)


@jax.custom_jvp
def sym_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD A x = b, fused for small n, LAPACK fallback otherwise.

    Custom JVP: d(A^{-1} b) = A^{-1}(db - dA x).  Without it, forward-mode
    AD re-traverses the unrolled Cholesky factorisation once PER TANGENT —
    under the derivative engine's 2n+nu-direction jacfwd that multiplies the
    factorisation cost ~27x.  With it, the factorisation is primal-only
    (hoisted out of the tangent vmap) and each tangent costs one matvec +
    one pair of triangular solves.
    """
    return _sym_solve_primal(A, b)


@sym_solve.defjvp
def _sym_solve_jvp(primals, tangents):
    A, b = primals
    dA, db = tangents
    n = A.shape[-1]
    if n <= _UNROLL_MAX:
        L = chol_unrolled(A)
        x = chol_solve_unrolled(L, b)
        # dA @ x covers both b shapes: (n,) matvec and (n, m) matmat
        dx = chol_solve_unrolled(L, db - dA @ x)
    else:
        f = jax.scipy.linalg.cho_factor(A)
        x = jax.scipy.linalg.cho_solve(f, b)
        dx = jax.scipy.linalg.cho_solve(f, db - dA @ x)
    return x, dx


def sym_solve_checked(A: jnp.ndarray, b: jnp.ndarray):
    """(solve, L-diagonal) — callers can NaN-check the factor diagonal for
    PD detection (backward-pass regularisation logic)."""
    n = A.shape[-1]
    if n <= _UNROLL_MAX:
        L = chol_unrolled(A)
        return chol_solve_unrolled(L, b), jnp.diagonal(L, axis1=-2, axis2=-1)
    L, lower = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve((L, lower), b), jnp.diagonal(
        L, axis1=-2, axis2=-1
    )
