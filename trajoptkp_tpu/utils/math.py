"""Quaternion / rotation / spatial math for the TPU trajectory-optimization stack.

TPU-native equivalents of the reference's quaternion helpers
(`/root/reference/include/StdInclude.h:258-276`, `src/StdInclude/StdInclude.cpp`):
eul2Quat, quat2Eul, quat2Axis, axis2Quat, invQuat, multQuat, etc. — plus the
MuJoCo-style tangent-space operators (`mj_integratePos` / `mj_differentiatePos`
analogues) used by the finite-difference engine
(`/root/reference/src/Differentiator/Differentiator.cpp:170,288,388`).

Conventions (MuJoCo-compatible):
  - quaternion layout [w, x, y, z]
  - rotations are world-from-body ("xquat" semantics)
  - angular velocities are expressed in the frame noted per-function

Everything is pure jnp, shape-polymorphic over leading batch dims where noted,
and safe under jit/vmap/grad (no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float64) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both [.., 4] wxyz (reference multQuat)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate == inverse for unit quaternions (reference invQuat)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (world = R(q) @ body)."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix, batched over leading dims."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> quaternion wxyz (reference rotMat2Quat).

    Branch-free (select over the four Shepperd cases) so it is jit/vmap safe.
    """
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]

    def case(wsq_term, build):
        s = jnp.sqrt(jnp.maximum(wsq_term, 1e-16)) * 2.0
        return build(s)

    # case 0: trace positive
    q0 = case(
        tr + 1.0,
        lambda s: jnp.stack(
            [
                s / 4.0,
                (m[..., 2, 1] - m[..., 1, 2]) / s,
                (m[..., 0, 2] - m[..., 2, 0]) / s,
                (m[..., 1, 0] - m[..., 0, 1]) / s,
            ],
            axis=-1,
        ),
    )
    q1 = case(
        1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
        lambda s: jnp.stack(
            [
                (m[..., 2, 1] - m[..., 1, 2]) / s,
                s / 4.0,
                (m[..., 0, 1] + m[..., 1, 0]) / s,
                (m[..., 0, 2] + m[..., 2, 0]) / s,
            ],
            axis=-1,
        ),
    )
    q2 = case(
        1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
        lambda s: jnp.stack(
            [
                (m[..., 0, 2] - m[..., 2, 0]) / s,
                (m[..., 0, 1] + m[..., 1, 0]) / s,
                s / 4.0,
                (m[..., 1, 2] + m[..., 2, 1]) / s,
            ],
            axis=-1,
        ),
    )
    q3 = case(
        1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        lambda s: jnp.stack(
            [
                (m[..., 1, 0] - m[..., 0, 1]) / s,
                (m[..., 0, 2] + m[..., 2, 0]) / s,
                (m[..., 1, 2] + m[..., 2, 1]) / s,
                s / 4.0,
            ],
            axis=-1,
        ),
    )
    cond0 = tr > 0
    cond1 = (m[..., 0, 0] > m[..., 1, 1]) & (m[..., 0, 0] > m[..., 2, 2])
    cond2 = m[..., 1, 1] > m[..., 2, 2]
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Axis-angle / exponential map (tangent-space ops)
# ---------------------------------------------------------------------------


def quat_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector (3,) -> quaternion. exp map, MuJoCo mju_quatIntegrate core.

    Autodiff-safe at v = 0 (double-where guards the norm so jvp/vjp stay
    finite — required by the exact-Jacobian derivative mode).
    """
    sumsq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = sumsq < 1e-18
    angle = jnp.sqrt(jnp.where(small, 1.0, sumsq))
    half = 0.5 * angle
    # sin(half)/angle is smooth; use series 0.5 - angle^2/48 near zero
    sinc_half = jnp.where(
        small, 0.5 - sumsq / 48.0, jnp.sin(half) / angle
    )
    w = jnp.where(small, 1.0 - sumsq / 8.0, jnp.cos(half))
    xyz = v * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> rotation vector (3,). Inverse of quat_exp (reference quat2Axis).

    Autodiff-safe at the identity quaternion (double-where guarded norm).
    """
    q = quat_normalize(q)
    # force w >= 0 to take the short geodesic
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    xyz = q[..., 1:]
    sumsq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = sumsq < 1e-18
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sumsq))
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # angle/sin_half is smooth near 0: series 2 + sumsq/3 (w ~ 1)
    scale = jnp.where(small, 2.0 + sumsq / 3.0, angle / sin_half)
    return xyz * scale


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """MuJoCo mju_quatIntegrate semantics: q' = q * exp(omega_local * dt).

    omega is expressed in the LOCAL (body) frame, as MuJoCo stores ball-joint
    and free-joint angular velocities in child/body coordinates.
    """
    return quat_normalize(quat_mul(q, quat_exp(omega * dt)))


def quat_sub(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """Velocity v (local frame) s.t. qa = qb * exp(v): mj_differentiatePos core
    (mju_subQuat semantics): returns log(qb^-1 * qa)."""
    return quat_log(quat_mul(quat_conj(qb), qa))


# ---------------------------------------------------------------------------
# Euler conversions (reference eul2Quat / quat2Eul — ZYX intrinsic i.e. XYZ fixed)
# ---------------------------------------------------------------------------


def euler_to_quat(eul: jnp.ndarray) -> jnp.ndarray:
    """Roll-pitch-yaw (x, y, z fixed-axis) -> quaternion. Matches reference
    eul2Quat (`src/StdInclude/StdInclude.cpp`)."""
    roll, pitch, yaw = eul[..., 0], eul[..., 1], eul[..., 2]
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> roll-pitch-yaw, inverse of euler_to_quat."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


# ---------------------------------------------------------------------------
# Spatial algebra (Featherstone 6-vectors: [angular; linear])
# ---------------------------------------------------------------------------


def cross_motion(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product  v x m  with v, m = [w; v_lin]."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1
    )


def cross_force(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product  v x* f."""
    w, vl = v[..., :3], v[..., 3:]
    fw, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fw) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix, batched."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def gauss_noise(key: jax.Array, mean, std, shape=()) -> jnp.ndarray:
    """Keyed replacement for the reference's GaussNoise (StdInclude.cpp:9-20)."""
    return mean + std * jax.random.normal(key, shape)
