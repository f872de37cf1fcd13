"""Box-box narrow phase: SAT + incident-face clipping, fixed 8-slot manifold.

Static-shape JAX implementation of the classic oriented-box contact manifold
(the approach MuJoCo/ODE use): test 6 face axes + 9 edge-cross axes for the
minimum-penetration separating axis; for a face axis, clip the incident face
of the other box against the reference face's side planes (4->8 vertices) and
emit the points that lie below the reference plane; for an edge axis, emit
the single closest point between the two edges.

All branches are computed and select-ed (no data-dependent control flow);
inactive slots carry dist = +BIG and are masked by the constraint assembler.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 1e10
_FACE_PREFERENCE = 0.99  # prefer face axes over edge axes (ODE-style fudge)


def _axis_depth(axis, t, R_abs, s1, s2):
    """Penetration depth along a (unit) axis expressed in box1 frame."""
    r1 = s1 @ jnp.abs(axis)
    # box2 half-extent projected: |axis^T R| s2 — use R_abs trick per axis
    return r1, None


def box_box_sat(xp1, xm1, s1, xp2, xm2, s2):
    """Returns (dists (8,), points (8,3), frames (8,3,3)) in world frame,
    normals pointing from box1 into box2."""
    dtype = xp1.dtype
    R = xm1.T @ xm2          # box2 orientation in box1 frame
    t = xm1.T @ (xp2 - xp1)  # box2 center in box1 frame
    R_abs = jnp.abs(R) + 1e-9

    # ---- 15 candidate axes (box1 frame), with penetration depths
    axes = []
    depths = []
    kinds = []  # 0 = face of box1, 1 = face of box2, 2 = edge-edge

    eye = jnp.eye(3, dtype=dtype)
    for i in range(3):
        a = eye[i]
        depth = s1[i] + (R_abs[i] @ s2) - jnp.abs(t[i])
        axes.append(a)
        depths.append(depth)
        kinds.append(0)
    for j in range(3):
        a = R[:, j]
        depth = (R_abs[:, j] @ s1) + s2[j] - jnp.abs(t @ a)
        axes.append(a)
        depths.append(depth)
        kinds.append(1)
    for i in range(3):
        for j in range(3):
            a = jnp.cross(eye[i], R[:, j])
            norm = jnp.linalg.norm(a)
            ok = norm > 1e-6
            a = a / jnp.maximum(norm, 1e-6)
            r1 = s1 @ jnp.abs(a)
            r2 = s2 @ jnp.abs(a.T @ R)
            depth = r1 + r2 - jnp.abs(t @ a)
            # scale up so edge axes only win when clearly smaller
            depth = jnp.where(ok, depth / _FACE_PREFERENCE, _BIG)
            axes.append(a)
            depths.append(depth)
            kinds.append(2)

    axes = jnp.stack(axes)         # (15, 3)
    depths = jnp.stack(depths)     # (15,)
    kinds = jnp.array(kinds)

    separated = jnp.any(depths < 0)
    best = jnp.argmin(depths)
    best_axis = axes[best]
    # orient axis from box1 towards box2
    sgn = jnp.where(t @ best_axis < 0, -1.0, 1.0)
    n1 = best_axis * sgn           # in box1 frame, pointing into box2
    best_kind = kinds[best]

    # ======== face-contact manifold ========
    # reference box r, incident box i: if kind==0 ref=box1 else ref=box2.
    # Work in the reference box frame.
    is_ref1 = best_kind == 0

    # transforms box2<->box1
    R_2in1, t_2in1 = R, t
    R_1in2, t_1in2 = R.T, -(R.T @ t)

    R_i_in_r = jnp.where(is_ref1, R_2in1, R_1in2)
    t_i_in_r = jnp.where(is_ref1, t_2in1, t_1in2)
    s_r = jnp.where(is_ref1, s1, s2)
    s_i = jnp.where(is_ref1, s2, s1)
    # normal in ref frame, pointing from ref box outward towards incident box
    n_ref = jnp.where(is_ref1, n1, R_1in2 @ (-n1))

    # reference face: axis with max |n_ref| (n_ref is a face normal: one-hot)
    ref_ax = jnp.argmax(jnp.abs(n_ref))
    ref_sgn = jnp.sign(n_ref[ref_ax])
    ref_sgn = jnp.where(ref_sgn == 0, 1.0, ref_sgn)

    # incident face: the face of the incident box most anti-parallel to n_ref
    n_in_i = R_i_in_r.T @ n_ref    # normal in incident frame
    inc_ax = jnp.argmax(jnp.abs(n_in_i))
    inc_sgn = -jnp.sign(n_in_i[inc_ax])
    inc_sgn = jnp.where(inc_sgn == 0, 1.0, inc_sgn)

    # 4 corners of the incident face (incident frame)
    u_ax = (inc_ax + 1) % 3
    v_ax = (inc_ax + 2) % 3

    def inc_corner(su, sv):
        c = jnp.zeros(3, dtype=dtype)
        c = c.at[inc_ax].set(inc_sgn * s_i[inc_ax])
        c = c.at[u_ax].set(su * s_i[u_ax])
        c = c.at[v_ax].set(sv * s_i[v_ax])
        return R_i_in_r @ c + t_i_in_r  # ref frame

    poly = jnp.stack(
        [inc_corner(1.0, 1.0), inc_corner(1.0, -1.0),
         inc_corner(-1.0, -1.0), inc_corner(-1.0, 1.0)]
    )  # (4, 3)
    valid = jnp.ones((4,), dtype=bool)

    # clip against the 4 side planes of the reference face
    ru = (ref_ax + 1) % 3
    rv = (ref_ax + 2) % 3

    def next_valid(valid):
        """For each slot i, the index of the first valid slot strictly after
        i (cyclically).  Clipping leaves valid vertices non-contiguous in
        slot order, so the polygon edge from a valid vertex goes to the NEXT
        VALID vertex, not the next slot — pairing consecutive slots loses
        every edge that spans an invalid gap (including the ring-closing
        edge), which silently drops intersection points from the manifold."""
        N = valid.shape[0]
        idx = jnp.arange(N)
        fwd = (idx[None, :] - idx[:, None] - 1) % N  # ring distance i -> j
        key = jnp.where(valid[None, :], fwd, N + 1)
        return jnp.argmin(key, axis=1)

    def clip(poly, valid, axis_idx, sign):
        """Sutherland-Hodgman step vs plane sign*x[axis] <= s_r[axis].
        Emits (2N slots): [p0, inter0, p1, inter1, ...] where inter_i lies on
        the ring edge (i -> next_valid(i)); valid subsequence stays in ring
        order."""
        nverts = poly.shape[0]
        limit = s_r[axis_idx]
        nv = next_valid(valid)
        pb = poly[nv]
        vb = valid[nv]
        da = sign * poly[:, axis_idx] - limit   # > 0 means outside
        db = sign * pb[:, axis_idx] - limit
        inside_a = da <= 0
        inside_b = db <= 0
        denom = da - db
        frac = da / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        inter = poly + jnp.clip(frac, 0.0, 1.0)[:, None] * (pb - poly)
        out_pts = jnp.stack([poly, inter], axis=1).reshape(2 * nverts, 3)
        out_val = jnp.stack(
            [valid & inside_a, valid & vb & (inside_a ^ inside_b)], axis=1
        ).reshape(2 * nverts)
        return out_pts, out_val

    def compress(poly, valid, keep):
        order = jnp.argsort(~valid, stable=True)[:keep]
        return poly[order], valid[order]

    # 4 planes: vertex count grows by at most 1 per plane (convex polygon),
    # so compressing to 8 slots after each round never drops a valid vertex
    poly2, valid2 = clip(*clip(poly, valid, ru, 1.0), ru, -1.0)
    poly2, valid2 = compress(poly2, valid2, 8)
    poly3, valid3 = clip(poly2, valid2, rv, 1.0)
    poly3, valid3 = compress(poly3, valid3, 8)
    poly4, valid4 = clip(poly3, valid3, rv, -1.0)
    poly4, valid4 = compress(poly4, valid4, 8)  # (8, 3)

    # signed distance of each clipped point below the reference face
    face_plane = ref_sgn * poly4[:, ref_ax] - s_r[ref_ax]  # <0 = penetrating
    face_dists = jnp.where(valid4, face_plane, _BIG)
    # contact point: midway between incident point and its projection
    proj = poly4.at[:, ref_ax].set(
        poly4[:, ref_ax] - face_plane * ref_sgn * 0.5
    )
    # back to world frame
    R_r = jnp.where(is_ref1, xm1, xm2)
    p_r = jnp.where(is_ref1, xp1, xp2)
    face_pts_w = proj @ R_r.T + p_r
    n_world_face = R_r @ (n_ref * 1.0)
    # normal must point from box1 -> box2 in world
    n_world_face = jnp.where(is_ref1, n_world_face, -n_world_face)

    # ======== edge-contact (single point) ========
    # recover the (box1 axis i, box2 axis j) of the winning cross axis
    edge_idx = best - 6
    ei = jnp.clip(edge_idx // 3, 0, 2)
    ej = jnp.clip(edge_idx % 3, 0, 2)
    d1 = jnp.eye(3, dtype=dtype)[ei]
    d2w = R[:, ej]
    # supporting edge midpoints: extreme corner along the normal with the
    # edge-direction component zeroed
    sup1 = jnp.sign(n1) * s1
    sup1 = sup1.at[ei].set(0.0)
    sup2 = -jnp.sign(R.T @ n1) * s2
    sup2 = sup2.at[ej].set(0.0)
    p1e = sup1
    p2e = R @ sup2 + t
    # closest points of the two edge lines (box1 frame)
    w12 = p2e - p1e
    b_ = d1 @ d2w
    d_ = d1 @ w12
    e_ = d2w @ w12
    den = 1.0 - b_ * b_  # d1, d2w are unit
    s_par = jnp.where(jnp.abs(den) > 1e-9, (d_ - b_ * e_) /
                      jnp.where(jnp.abs(den) > 1e-9, den, 1.0), 0.0)
    u_par = s_par * b_ - e_
    q1 = p1e + jnp.clip(s_par, -s1[ei], s1[ei]) * d1
    q2 = p2e + jnp.clip(u_par, -s2[ej], s2[ej]) * d2w
    edge_mid = 0.5 * (q1 + q2)
    edge_depth = depths[best] * _FACE_PREFERENCE  # undo scaling
    edge_dist = -edge_depth
    edge_pt_w = xm1 @ edge_mid + xp1
    n_world_edge = xm1 @ n1

    # ======== select ========
    is_face = best_kind != 2
    dists = jnp.where(
        is_face,
        face_dists,
        jnp.full((8,), _BIG, dtype=dtype).at[0].set(edge_dist),
    )
    pts = jnp.where(
        is_face,
        face_pts_w,
        jnp.broadcast_to(edge_pt_w, (8, 3)),
    )
    n_world = jnp.where(is_face, n_world_face, n_world_edge)
    # fully separated: disable everything
    dists = jnp.where(separated, jnp.full((8,), _BIG, dtype=dtype), dists)

    from .collision import _frame_from_normal

    frames = jnp.broadcast_to(_frame_from_normal(n_world), (8, 3, 3))
    return dists, pts, frames
