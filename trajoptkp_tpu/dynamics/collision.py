"""Primitive narrow-phase collision functions.

Replaces MuJoCo's collision drivers for the primitive shapes the task suite
uses (plane/sphere/capsule/box/cylinder-ish): each pair function returns a
FIXED number of candidate contact points (static shapes for XLA), with
dist > 0 meaning separated; the constraint assembler masks out inactive ones.

Contact frame convention (MuJoCo-compatible): normal points from geom1 into
geom2; frame rows are (normal, tangent1, tangent2).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .model import (GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_PLANE,
                    GEOM_SPHERE)

# contact slots produced per geom-type pair
PAIR_NCON = {
    (GEOM_PLANE, GEOM_SPHERE): 1,
    (GEOM_PLANE, GEOM_CAPSULE): 2,
    (GEOM_PLANE, GEOM_BOX): 4,
    (GEOM_PLANE, GEOM_CYLINDER): 3,
    (GEOM_SPHERE, GEOM_SPHERE): 1,
    (GEOM_SPHERE, GEOM_CAPSULE): 1,
    (GEOM_SPHERE, GEOM_BOX): 1,
    (GEOM_CAPSULE, GEOM_CAPSULE): 1,
    (GEOM_CAPSULE, GEOM_BOX): 2,
    (GEOM_BOX, GEOM_BOX): 8,
    (GEOM_SPHERE, GEOM_CYLINDER): 1,
    (GEOM_CAPSULE, GEOM_CYLINDER): 1,
    (GEOM_CYLINDER, GEOM_BOX): 2,
    (GEOM_CYLINDER, GEOM_CYLINDER): 1,
}

_BIG = 1e10


def _frame_from_normal(n: jnp.ndarray) -> jnp.ndarray:
    """Build (3,3) frame rows (n, t1, t2) from a unit normal."""
    # pick the axis least aligned with n
    ref = jnp.where(
        jnp.abs(n[0]) < 0.5,
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
        jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


def _contact(dist, pos, n):
    return dist, pos, _frame_from_normal(n)


def _pack(*contacts):
    dists = jnp.stack([c[0] for c in contacts])
    poss = jnp.stack([c[1] for c in contacts])
    frames = jnp.stack([c[2] for c in contacts])
    return dists, poss, frames


# --- plane vs X (plane: xmat[:,2] is the normal, xpos a point on it) -------


def plane_sphere(xp1, xm1, s1, xp2, xm2, s2):
    n = xm1[:, 2]
    r = s2[0]
    cdist = jnp.dot(n, xp2 - xp1)
    dist = cdist - r
    pos = xp2 - n * (r + 0.5 * dist)
    return _pack(_contact(dist, pos, n))


def plane_capsule(xp1, xm1, s1, xp2, xm2, s2):
    n = xm1[:, 2]
    r, hl = s2[0], s2[1]
    axis = xm2[:, 2]
    ends = [xp2 + axis * hl, xp2 - axis * hl]
    out = []
    for e in ends:
        cdist = jnp.dot(n, e - xp1)
        dist = cdist - r
        pos = e - n * (r + 0.5 * dist)
        out.append(_contact(dist, pos, n))
    return _pack(*out)


def plane_box(xp1, xm1, s1, xp2, xm2, s2):
    """4 deepest corners of the box vs the plane (MuJoCo emits <=4)."""
    n = xm1[:, 2]
    corners = []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                local = jnp.array([sx, sy, sz], dtype=xp2.dtype) * s2
                corners.append(xp2 + xm2 @ local)
    corners = jnp.stack(corners)  # (8, 3)
    dists = corners @ n - jnp.dot(n, xp1)  # (8,)
    # pick the 4 smallest distances
    idx = jnp.argsort(dists)[:4]
    out = []
    for k in range(4):
        c = corners[idx[k]]
        d = dists[idx[k]]
        pos = c - 0.5 * d * n
        out.append(_contact(d, pos, n))
    return _pack(*out)


def plane_cylinder(xp1, xm1, s1, xp2, xm2, s2):
    """3 rim points of the closer end cap (approximates MuJoCo's manifold)."""
    n = xm1[:, 2]
    r, hl = s2[0], s2[1]
    axis = xm2[:, 2]
    sign = -jnp.sign(jnp.dot(axis, n))
    sign = jnp.where(sign == 0, 1.0, sign)
    cap = xp2 + axis * hl * sign  # center of the cap closest to the plane
    # radial direction maximally towards the plane
    rad = n - axis * jnp.dot(axis, n)
    rad_norm = jnp.linalg.norm(rad)
    aligned = rad_norm < 1e-9
    rad = jnp.where(aligned, xm2[:, 0], -rad / jnp.maximum(rad_norm, 1e-9))
    t = jnp.cross(axis, rad)
    out = []
    for p in (cap + rad * r, cap - 0.5 * rad * r + 0.866 * t * r,
              cap - 0.5 * rad * r - 0.866 * t * r):
        d = jnp.dot(n, p - xp1)
        out.append(_contact(d, p - 0.5 * d * n, n))
    return _pack(*out)


# --- sphere / capsule ------------------------------------------------------


def _sphere_sphere_core(p1, r1, p2, r2, dtype):
    d = p2 - p1
    L = jnp.linalg.norm(d)
    n = jnp.where(L < 1e-9, jnp.array([0.0, 0.0, 1.0], dtype=dtype), d / jnp.maximum(L, 1e-9))
    dist = L - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)
    return dist, pos, n


def sphere_sphere(xp1, xm1, s1, xp2, xm2, s2):
    dist, pos, n = _sphere_sphere_core(xp1, s1[0], xp2, s2[0], xp1.dtype)
    return _pack(_contact(dist, pos, n))


def _closest_seg_point(a0, a1, p):
    """Closest point on segment [a0, a1] to point p."""
    d = a1 - a0
    t = jnp.dot(p - a0, d) / jnp.maximum(jnp.dot(d, d), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return a0 + t * d


def sphere_capsule(xp1, xm1, s1, xp2, xm2, s2):
    axis = xm2[:, 2]
    hl = s2[1]
    c = _closest_seg_point(xp2 - axis * hl, xp2 + axis * hl, xp1)
    dist, pos, n = _sphere_sphere_core(xp1, s1[0], c, s2[0], xp1.dtype)
    return _pack(_contact(dist, pos, n))


def _closest_seg_seg(p0, p1, q0, q1):
    """Closest points between two segments (clamped, stable)."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(
        denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0, 1), 0.0
    )
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    return p0 + d1 * s, q0 + d2 * t_cl


def capsule_capsule(xp1, xm1, s1, xp2, xm2, s2):
    a_axis = xm1[:, 2] * s1[1]
    b_axis = xm2[:, 2] * s2[1]
    pa, pb = _closest_seg_seg(xp1 - a_axis, xp1 + a_axis, xp2 - b_axis, xp2 + b_axis)
    dist, pos, n = _sphere_sphere_core(pa, s1[0], pb, s2[0], xp1.dtype)
    return _pack(_contact(dist, pos, n))


# --- box -------------------------------------------------------------------


def _closest_point_box(p_local, size):
    return jnp.clip(p_local, -size, size)


def sphere_box(xp1, xm1, s1, xp2, xm2, s2):
    """Sphere (or capsule end) vs box via closest point; handles the
    center-inside-box case by pushing out along the least-penetration face."""
    r = s1[0]
    p_local = xm2.T @ (xp1 - xp2)
    clamped = _closest_point_box(p_local, s2)
    delta = p_local - clamped
    L = jnp.linalg.norm(delta)
    outside = L > 1e-9

    # outside: normal from surface point to sphere center
    n_out_local = delta / jnp.maximum(L, 1e-9)
    dist_out = L - r
    pos_local_out = clamped

    # inside: push along smallest margin face
    margins = s2 - jnp.abs(p_local)  # (3,)
    ax = jnp.argmin(margins)
    sgn = jnp.sign(p_local[ax])
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    n_in_local = jnp.zeros(3, dtype=xp1.dtype).at[ax].set(sgn)
    dist_in = -(margins[ax] + r)
    pos_local_in = p_local - n_in_local * (dist_in * 0.5 + r)

    n_local = jnp.where(outside, n_out_local, n_in_local)
    dist = jnp.where(outside, dist_out, dist_in)
    pos_local = jnp.where(outside, pos_local_out, pos_local_in)
    # normal must point from box(geom2 here) ... caller fixes orientation
    n_world = xm2 @ n_local
    pos_world = xm2 @ pos_local + xp2
    # convention: normal from geom1(sphere) into geom2(box) = -n_world
    return _pack(_contact(dist, pos_world, -n_world))


def capsule_box(xp1, xm1, s1, xp2, xm2, s2):
    """Two sphere-box probes at the capsule's closest interior points."""
    axis = xm1[:, 2]
    hl = s1[1]
    outs = []
    for e in (xp1 + axis * hl, xp1 - axis * hl):
        # closest point on segment to box center, then probe that end
        d, p, f = sphere_box(e, xm1, s1, xp2, xm2, s2)
        outs.append((d[0], p[0], f[0]))
    return _pack(*outs)


def box_box(xp1, xm1, s1, xp2, xm2, s2):
    """SAT + incident-face clipping manifold (box_collision.py)."""
    from .box_collision import box_box_sat

    return box_box_sat(xp1, xm1, s1, xp2, xm2, s2)


_DISPATCH = {
    (GEOM_PLANE, GEOM_SPHERE): plane_sphere,
    (GEOM_PLANE, GEOM_CAPSULE): plane_capsule,
    (GEOM_PLANE, GEOM_BOX): plane_box,
    (GEOM_PLANE, GEOM_CYLINDER): plane_cylinder,
    (GEOM_SPHERE, GEOM_SPHERE): sphere_sphere,
    (GEOM_SPHERE, GEOM_CAPSULE): sphere_capsule,
    (GEOM_SPHERE, GEOM_BOX): sphere_box,
    (GEOM_CAPSULE, GEOM_CAPSULE): capsule_capsule,
    (GEOM_CAPSULE, GEOM_BOX): capsule_box,
    (GEOM_BOX, GEOM_BOX): box_box,
    # cylinders treated as equal-radius capsules for lateral contact — exact
    # for the side-on pushing interactions the manipulation tasks exercise;
    # rim/cap edge contacts are approximated (note: plane-cylinder above is
    # a dedicated 3-point cap manifold)
    (GEOM_SPHERE, GEOM_CYLINDER): sphere_capsule,
    (GEOM_CAPSULE, GEOM_CYLINDER): capsule_capsule,
    (GEOM_CYLINDER, GEOM_CYLINDER): capsule_capsule,
    (GEOM_CYLINDER, GEOM_BOX): capsule_box,
}


def pair_contacts(t1: int, t2: int, xp1, xm1, s1, xp2, xm2, s2):
    """Dispatch on static geom types; returns (dists, poss, frames) with the
    fixed slot count of the pair, normals from geom1 into geom2."""
    if (t1, t2) in _DISPATCH:
        return _DISPATCH[(t1, t2)](xp1, xm1, s1, xp2, xm2, s2)
    if (t2, t1) in _DISPATCH:
        d, p, f = _DISPATCH[(t2, t1)](xp2, xm2, s2, xp1, xm1, s1)
        # flip normals to keep geom1 -> geom2 orientation
        return d, p, f * jnp.array([-1.0, 1.0, 1.0], dtype=f.dtype)[None, :, None]
    raise NotImplementedError(f"no collider for geom types ({t1}, {t2})")


def pair_ncon(t1: int, t2: int) -> int:
    if (t1, t2) in PAIR_NCON:
        return PAIR_NCON[(t1, t2)]
    if (t2, t1) in PAIR_NCON:
        return PAIR_NCON[(t2, t1)]
    raise NotImplementedError(f"no collider for geom types ({t1}, {t2})")
