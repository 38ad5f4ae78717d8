"""Vertex pipeline + triangle setup: the "vertex shader" stage of the rasterizer.

TPU-native counterpart of the per-face transform loop inside the reference's
`DTRRender_Mesh` (SURVEY.md CS-2: per face, DqnMat4 model-view-proj transform of 3
verts, perspective divide, viewport scale, backface cull). Here the whole vertex buffer
transforms in one batched op and the per-triangle "setup" (edge-function coefficients,
area, depth plane, fill-rule flags, bbox) is computed vectorized over all T triangles at
once — the raster stages (raster_ref / raster_pallas) only evaluate the resulting affine
forms per pixel.

All formulas and their op order follow FORMULAS.md (shared with tests/oracle.py).

Packed setup layout, f32 [T, 16] (referenced by the Pallas kernel — keep in sync):
  0:A0 1:B0 2:C0  3:A1 4:B1 5:C1  6:A2 7:B2 8:C2
  9:inv_area2  10:z0 11:z1 12:z2  13:tl0 14:tl1 15:tl2
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dtrenderer_tpu.utils.math3d import homogenize, transform_points

F32 = jnp.float32

SETUP_CHANNELS = 16
# Channel indices (see layout above).
CH_A0, CH_B0, CH_C0 = 0, 1, 2
CH_A1, CH_B1, CH_C1 = 3, 4, 5
CH_A2, CH_B2, CH_C2 = 6, 7, 8
CH_INV_AREA2 = 9
CH_Z0, CH_Z1, CH_Z2 = 10, 11, 12
CH_TL0, CH_TL1, CH_TL2 = 13, 14, 15


class TriSetup(NamedTuple):
    coef: jnp.ndarray   # f32 [T, 16] packed per-triangle setup
    bbox: jnp.ndarray   # i32 [T, 4]  (x0, y0, x1, y1) inclusive, clamped to frame
    valid: jnp.ndarray  # bool [T]


def vertex_transform(verts3, mvp, width, height):
    """[N,3] model-space verts -> [N,4] screen (sx, sy, sz01, q=1/w_clip).

    Viewport mapping per FORMULAS.md: sx=(x_ndc+1)*(0.5*W), sy=(1-y_ndc)*(0.5*H),
    sz=(z_ndc+1)*0.5. Vertices with w_clip <= eps get q=0 (their triangles are
    dropped in triangle_setup; static near clipping is handled upstream).
    """
    clip = transform_points(homogenize(jnp.asarray(verts3, F32)), mvp)
    w = clip[..., 3]
    behind = w <= jnp.float32(1e-6)
    q = jnp.where(behind, jnp.float32(0.0), jnp.float32(1.0) / jnp.where(behind, 1.0, w))
    x_ndc = clip[..., 0] * q
    y_ndc = clip[..., 1] * q
    z_ndc = clip[..., 2] * q
    sx = (x_ndc + jnp.float32(1.0)) * jnp.float32(0.5 * width)
    sy = (jnp.float32(1.0) - y_ndc) * jnp.float32(0.5 * height)
    sz = (z_ndc + jnp.float32(1.0)) * jnp.float32(0.5)
    return jnp.stack([sx, sy, sz, q], axis=-1)


def _edge_coef(ax, ay, bx, by):
    """Affine edge coefficients per FORMULAS.md: E(p) = (A*px + B*py) + C."""
    A = by - ay
    B = ax - bx
    C = -(ax * A + ay * B)
    return A, B, C


def _top_left(ax, ay, bx, by):
    """Top-left fill-rule flag for directed edge a->b (FORMULAS.md)."""
    return ((ay == by) & (bx < ax)) | (by < ay)


def triangle_setup(screen, faces, width, height, cull_backfaces=True):
    """Build TriSetup from screen-space verts [N,4] and face indices i32 [T,3]."""
    faces = jnp.asarray(faces, jnp.int32)
    p0 = screen[faces[:, 0]]
    p1 = screen[faces[:, 1]]
    p2 = screen[faces[:, 2]]
    return triangle_setup_from_corners(p0, p1, p2, width, height, cull_backfaces)


def triangle_setup_from_corners(p0, p1, p2, width, height, cull_backfaces=True):
    """Triangle setup from explicit corner arrays [T,4] (sx, sy, sz, q)."""
    x0, y0, z0 = p0[:, 0], p0[:, 1], p0[:, 2]
    x1, y1, z1 = p1[:, 0], p1[:, 1], p1[:, 2]
    x2, y2, z2 = p2[:, 0], p2[:, 1], p2[:, 2]

    # Edge opposite v0 is v1->v2, opposite v1 is v2->v0, opposite v2 is v0->v1.
    A0, B0, C0 = _edge_coef(x1, y1, x2, y2)
    A1, B1, C1 = _edge_coef(x2, y2, x0, y0)
    A2, B2, C2 = _edge_coef(x0, y0, x1, y1)
    area2 = (A2 * x2 + B2 * y2) + C2

    any_behind = (p0[:, 3] == 0) | (p1[:, 3] == 0) | (p2[:, 3] == 0)
    finite = (
        jnp.isfinite(x0) & jnp.isfinite(y0)
        & jnp.isfinite(x1) & jnp.isfinite(y1)
        & jnp.isfinite(x2) & jnp.isfinite(y2)
    )
    nondegenerate = area2 != 0
    if cull_backfaces:
        valid = finite & ~any_behind & (area2 > 0)
        flip = jnp.zeros_like(valid)
    else:
        valid = finite & ~any_behind & nondegenerate
        flip = area2 < 0

    sgn = jnp.where(flip, jnp.float32(-1.0), jnp.float32(1.0))
    A0, B0, C0 = A0 * sgn, B0 * sgn, C0 * sgn
    A1, B1, C1 = A1 * sgn, B1 * sgn, C1 * sgn
    A2, B2, C2 = A2 * sgn, B2 * sgn, C2 * sgn
    area2 = area2 * sgn

    safe_area2 = jnp.where(valid, area2, jnp.float32(1.0))
    inv_area2 = jnp.float32(1.0) / safe_area2

    # Fill-rule flags use the EFFECTIVE directed edge: flipping the winding
    # reverses each edge's direction (FORMULAS.md "Inside test").
    def tl(ax, ay, bx, by):
        fwd = _top_left(ax, ay, bx, by)
        rev = _top_left(bx, by, ax, ay)
        return jnp.where(flip, rev, fwd).astype(F32)

    tl0 = tl(x1, y1, x2, y2)
    tl1 = tl(x2, y2, x0, y0)
    tl2 = tl(x0, y0, x1, y1)

    coef = jnp.stack(
        [A0, B0, C0, A1, B1, C1, A2, B2, C2,
         inv_area2, z0, z1, z2, tl0, tl1, tl2],
        axis=-1,
    )

    # Conservative pixel bbox (1px slack; the inside test is the arbiter).
    xs = jnp.stack([x0, x1, x2], axis=-1)
    ys = jnp.stack([y0, y1, y2], axis=-1)
    safe_xs = jnp.where(valid[:, None], xs, jnp.float32(0.0))
    safe_ys = jnp.where(valid[:, None], ys, jnp.float32(0.0))
    bx0 = jnp.clip(jnp.floor(jnp.min(safe_xs, axis=-1)).astype(jnp.int32) - 1, 0, width - 1)
    by0 = jnp.clip(jnp.floor(jnp.min(safe_ys, axis=-1)).astype(jnp.int32) - 1, 0, height - 1)
    bx1 = jnp.clip(jnp.ceil(jnp.max(safe_xs, axis=-1)).astype(jnp.int32) + 1, 0, width - 1)
    by1 = jnp.clip(jnp.ceil(jnp.max(safe_ys, axis=-1)).astype(jnp.int32) + 1, 0, height - 1)
    # Off-screen triangles collapse to an empty bbox.
    offscreen = (
        (jnp.max(safe_xs, axis=-1) < 0) | (jnp.min(safe_xs, axis=-1) >= width)
        | (jnp.max(safe_ys, axis=-1) < 0) | (jnp.min(safe_ys, axis=-1) >= height)
    )
    valid = valid & ~offscreen
    bbox = jnp.stack([bx0, by0, bx1, by1], axis=-1)

    return TriSetup(coef=coef, bbox=bbox, valid=valid)


def coverage_and_depth(coef, px, py):
    """Evaluate coverage + interpolated depth + barycentrics at pixel centers.

    coef: f32 [..., 16] (broadcastable against px/py), px/py: f32 pixel centers.
    Returns (inside bool, z f32, (b0, b1, b2)). Single source of truth for the
    inside test — used by raster_ref, the deferred shading pass, and (on VMEM
    values) the Pallas tile kernel. Op order per FORMULAS.md.
    """
    A0, B0, C0 = coef[..., 0], coef[..., 1], coef[..., 2]
    A1, B1, C1 = coef[..., 3], coef[..., 4], coef[..., 5]
    A2, B2, C2 = coef[..., 6], coef[..., 7], coef[..., 8]
    inv_area2 = coef[..., 9]
    z0, z1, z2 = coef[..., 10], coef[..., 11], coef[..., 12]
    tl0, tl1, tl2 = coef[..., 13], coef[..., 14], coef[..., 15]

    E0 = (A0 * px + B0 * py) + C0
    E1 = (A1 * px + B1 * py) + C1
    E2 = (A2 * px + B2 * py) + C2

    acc0 = (E0 > 0) | ((E0 == 0) & (tl0 > 0))
    acc1 = (E1 > 0) | ((E1 == 0) & (tl1 > 0))
    acc2 = (E2 > 0) | ((E2 == 0) & (tl2 > 0))
    inside = acc0 & acc1 & acc2

    b0 = E0 * inv_area2
    b1 = E1 * inv_area2
    b2 = E2 * inv_area2
    z = (b0 * z0 + b1 * z1) + b2 * z2
    return inside, z, (b0, b1, b2)


def interp(b, a0, a1, a2):
    """Barycentric interpolation with fixed op order (FORMULAS.md)."""
    b0, b1, b2 = b
    return (b0 * a0 + b1 * a1) + b2 * a2


# ---------------------------------------------------------------------------
# Near-plane clipping (static shapes: every triangle -> exactly 2 output slots)
# ---------------------------------------------------------------------------

NEAR_EPS = jnp.float32(1e-4)


def _rotate_corners(c, a, start):
    """Rotate corner order of c [T,3,4] / a [T,3,A] by per-triangle start i32[T]."""
    idx = (start[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]) % 3  # [T,3]
    gather = lambda x: jnp.take_along_axis(
        x, idx[..., None], axis=1
    )
    return gather(c), gather(a)


def clip_near(corners_clip, corner_attrs, eps=NEAR_EPS):
    """Clip triangles against the near plane w = eps in clip space.

    corners_clip: f32 [T, 3, 4] homogeneous clip coords per corner.
    corner_attrs: f32 [T, 3, A] linearly-varying attributes per corner (raw,
    NOT premultiplied by 1/w — clip-space lerp is exact for these).
    Returns (clip2 [T, 2, 3, 4], attrs2 [T, 2, 3, A], valid2 [T, 2]): each input
    triangle maps to up to two output triangles (a triangle with exactly two
    vertices in front of the plane clips to a quad). Triangles fully in front
    pass through unchanged in slot 0 (bit-identical corners, so enabling
    clipping does not perturb unclipped geometry). The reference has no
    clipping stage (SURVEY.md CS-2 transforms then rasterizes); this closes
    that robustness gap.
    """
    w = corners_clip[..., 3]                        # [T, 3]
    inside = w >= eps
    cnt = jnp.sum(inside.astype(jnp.int32), axis=1)  # [T]

    # Canonical rotations: cnt==1 -> the single INSIDE vertex becomes corner 0;
    # cnt==2 -> the single OUTSIDE vertex becomes corner 2.
    in_idx = jnp.argmax(inside.astype(jnp.int32), axis=1).astype(jnp.int32)
    out_idx = jnp.argmax((~inside).astype(jnp.int32), axis=1).astype(jnp.int32)
    start = jnp.where(
        cnt == 1, in_idx, jnp.where(cnt == 2, (out_idx + 1) % 3, 0)
    )
    c, a = _rotate_corners(corners_clip, corner_attrs, start)
    w = c[..., 3]

    def isect(i, j):
        """Intersection of edge corner_i -> corner_j with the w = eps plane."""
        wi = w[:, i:i + 1]
        wj = w[:, j:j + 1]
        denom = wj - wi
        t = (eps - wi) / jnp.where(denom == 0, jnp.float32(1.0), denom)
        t = jnp.clip(t, 0.0, 1.0)
        ci = c[:, i]
        cj = c[:, j]
        ai = a[:, i]
        aj = a[:, j]
        return ci + (cj - ci) * t, ai + (aj - ai) * t

    # cnt == 1 (A=corner0 inside): A, AB_x, AC_x
    ab_c, ab_a = isect(0, 1)
    ac_c, ac_a = isect(0, 2)
    tri1_c = jnp.stack([c[:, 0], ab_c, ac_c], axis=1)
    tri1_a = jnp.stack([a[:, 0], ab_a, ac_a], axis=1)

    # cnt == 2 (A,B inside, C=corner2 outside): (A, B, BC_x) and (A, BC_x, AC_x)
    bc_c, bc_a = isect(1, 2)
    ca_c, ca_a = isect(0, 2)
    tri2a_c = jnp.stack([c[:, 0], c[:, 1], bc_c], axis=1)
    tri2a_a = jnp.stack([a[:, 0], a[:, 1], bc_a], axis=1)
    tri2b_c = jnp.stack([c[:, 0], bc_c, ca_c], axis=1)
    tri2b_a = jnp.stack([a[:, 0], bc_a, ca_a], axis=1)

    cnt_b = cnt[:, None, None]
    slot0_c = jnp.where(cnt_b == 3, c,
                        jnp.where(cnt_b == 2, tri2a_c,
                                  jnp.where(cnt_b == 1, tri1_c, c)))
    slot0_a = jnp.where(cnt_b == 3, a,
                        jnp.where(cnt_b == 2, tri2a_a,
                                  jnp.where(cnt_b == 1, tri1_a, a)))
    slot1_c = tri2b_c
    slot1_a = tri2b_a

    valid0 = cnt >= 1
    valid1 = cnt == 2
    clip2 = jnp.stack([slot0_c, slot1_c], axis=1)
    attrs2 = jnp.stack([slot0_a, slot1_a], axis=1)
    valid2 = jnp.stack([valid0, valid1], axis=1)
    return clip2, attrs2, valid2


def corners_to_screen(corners_clip, width, height):
    """Per-corner clip -> screen (sx, sy, sz01, q); same formulas as
    vertex_transform (FORMULAS.md viewport)."""
    w = corners_clip[..., 3]
    behind = w <= jnp.float32(1e-6)
    q = jnp.where(behind, jnp.float32(0.0),
                  jnp.float32(1.0) / jnp.where(behind, 1.0, w))
    x_ndc = corners_clip[..., 0] * q
    y_ndc = corners_clip[..., 1] * q
    z_ndc = corners_clip[..., 2] * q
    sx = (x_ndc + jnp.float32(1.0)) * jnp.float32(0.5 * width)
    sy = (jnp.float32(1.0) - y_ndc) * jnp.float32(0.5 * height)
    sz = (z_ndc + jnp.float32(1.0)) * jnp.float32(0.5)
    return jnp.stack([sx, sy, sz, q], axis=-1)
