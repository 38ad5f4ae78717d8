"""Scalar NumPy oracle rasterizer.

Plays the role the reference's scalar `SlowTriangle` path played for its SIMD path
(SURVEY.md §4.5): an independent, simple-as-possible implementation of the FORMULAS.md
contract, written with per-pixel Python loops over np.float32 scalars, against which the
device paths (raster_ref, raster_pallas, deferred shading) are compared to ≤1 ULP.

Discipline: every arithmetic op is float32 (np.float32 constants everywhere); op order
matches FORMULAS.md exactly.
"""

from __future__ import annotations

import numpy as np

f32 = np.float32


# ---------------------------------------------------------------------------
# Vertex pipeline
# ---------------------------------------------------------------------------

def transform_point(m, p4):
    """v' = M @ v, op order (m0*x + m1*y) + (m2*z + m3*w), all f32 scalars."""
    m = np.asarray(m, f32)
    x, y, z, w = (f32(p4[0]), f32(p4[1]), f32(p4[2]), f32(p4[3]))
    out = np.empty(4, f32)
    for i in range(4):
        out[i] = (m[i, 0] * x + m[i, 1] * y) + (m[i, 2] * z + m[i, 3] * w)
    return out


def vertex_transform(verts3, mvp, width, height):
    """[N,3] -> [N,4] screen (sx, sy, sz01, q); mirrors geometry.vertex_transform."""
    verts3 = np.asarray(verts3, f32)
    n = verts3.shape[0]
    out = np.empty((n, 4), f32)
    half_w = f32(0.5 * width)
    half_h = f32(0.5 * height)
    one = f32(1.0)
    half = f32(0.5)
    for i in range(n):
        clip = transform_point(mvp, [verts3[i, 0], verts3[i, 1], verts3[i, 2], 1.0])
        w = clip[3]
        if w <= f32(1e-6):
            out[i] = (0, 0, 0, 0)
            continue
        q = one / w
        x_ndc = clip[0] * q
        y_ndc = clip[1] * q
        z_ndc = clip[2] * q
        out[i, 0] = (x_ndc + one) * half_w
        out[i, 1] = (one - y_ndc) * half_h
        out[i, 2] = (z_ndc + one) * half
        out[i, 3] = q
    return out


# ---------------------------------------------------------------------------
# Rasterization
# ---------------------------------------------------------------------------

def _edge_coef(ax, ay, bx, by):
    A = by - ay
    B = ax - bx
    C = -(ax * A + ay * B)
    return A, B, C


def _top_left(ax, ay, bx, by):
    return (ay == by and bx < ax) or (by < ay)


class TriOracle:
    """Per-triangle setup mirroring geometry.triangle_setup_from_corners."""

    def __init__(self, p0, p1, p2, width, height, cull_backfaces=True):
        x0, y0 = f32(p0[0]), f32(p0[1])
        x1, y1 = f32(p1[0]), f32(p1[1])
        x2, y2 = f32(p2[0]), f32(p2[1])
        self.z = (f32(p0[2]), f32(p1[2]), f32(p2[2]))
        self.q = (f32(p0[3]), f32(p1[3]), f32(p2[3]))

        A0, B0, C0 = _edge_coef(x1, y1, x2, y2)
        A1, B1, C1 = _edge_coef(x2, y2, x0, y0)
        A2, B2, C2 = _edge_coef(x0, y0, x1, y1)
        area2 = (A2 * x2 + B2 * y2) + C2

        any_behind = self.q[0] == 0 or self.q[1] == 0 or self.q[2] == 0
        finite = all(np.isfinite(v) for v in (x0, y0, x1, y1, x2, y2))
        if cull_backfaces:
            self.valid = bool(finite and not any_behind and area2 > 0)
            flip = False
        else:
            self.valid = bool(finite and not any_behind and area2 != 0)
            flip = bool(area2 < 0)

        sgn = f32(-1.0) if flip else f32(1.0)
        self.E = [
            (A0 * sgn, B0 * sgn, C0 * sgn),
            (A1 * sgn, B1 * sgn, C1 * sgn),
            (A2 * sgn, B2 * sgn, C2 * sgn),
        ]
        area2 = area2 * sgn
        self.inv_area2 = f32(1.0) / (area2 if self.valid else f32(1.0))

        if flip:
            self.tl = (
                _top_left(x2, y2, x1, y1),
                _top_left(x0, y0, x2, y2),
                _top_left(x1, y1, x0, y0),
            )
        else:
            self.tl = (
                _top_left(x1, y1, x2, y2),
                _top_left(x2, y2, x0, y0),
                _top_left(x0, y0, x1, y1),
            )

        xs = (x0, x1, x2)
        ys = (y0, y1, y2)
        self.bx0 = max(0, int(np.floor(min(xs))) - 1)
        self.by0 = max(0, int(np.floor(min(ys))) - 1)
        self.bx1 = min(width - 1, int(np.ceil(max(xs))) + 1)
        self.by1 = min(height - 1, int(np.ceil(max(ys))) + 1)
        if max(xs) < 0 or min(xs) >= width or max(ys) < 0 or min(ys) >= height:
            self.valid = False

    def coverage(self, px, py):
        """Returns (inside, z, (b0, b1, b2)) at pixel center (px, py), f32 scalars."""
        E = []
        acc = True
        for k in range(3):
            A, B, C = self.E[k]
            e = (A * px + B * py) + C
            acc = acc and (e > 0 or (e == 0 and self.tl[k]))
            E.append(e)
        b0 = E[0] * self.inv_area2
        b1 = E[1] * self.inv_area2
        b2 = E[2] * self.inv_area2
        z = (b0 * self.z[0] + b1 * self.z[1]) + b2 * self.z[2]
        return acc, z, (b0, b1, b2)


def rasterize(screen, faces, height, width, cull_backfaces=True):
    """Sequential per-triangle, per-pixel visibility pass.

    Returns (zbuf f32 [H,W] +inf background, tri i32 [H,W] -1 background).
    Later triangles overwrite only when STRICTLY closer (FORMULAS.md depth test).
    """
    screen = np.asarray(screen, f32)
    faces = np.asarray(faces)
    zbuf = np.full((height, width), np.inf, f32)
    tri = np.full((height, width), -1, np.int32)
    half = f32(0.5)
    for t in range(faces.shape[0]):
        i0, i1, i2 = faces[t]
        to = TriOracle(screen[i0], screen[i1], screen[i2], width, height,
                       cull_backfaces)
        if not to.valid:
            continue
        for iy in range(to.by0, to.by1 + 1):
            py = f32(iy) + half
            for ix in range(to.bx0, to.bx1 + 1):
                px = f32(ix) + half
                inside, z, _ = to.coverage(px, py)
                if inside and z < zbuf[iy, ix]:
                    zbuf[iy, ix] = z
                    tri[iy, ix] = t
    return zbuf, tri


# ---------------------------------------------------------------------------
# Interpolation / sampling / color (scalar mirrors of FORMULAS.md)
# ---------------------------------------------------------------------------

def interp(b, a0, a1, a2):
    b0, b1, b2 = b
    return (b0 * a0 + b1 * a1) + b2 * a2


def lerp2(u, v, t):
    return u + (v - u) * t


def sample_nearest(tex, u, v):
    th, tw = tex.shape[0], tex.shape[1]
    tx = min(max(int(np.floor(u * f32(tw))), 0), tw - 1)
    ty = min(max(int(np.floor((f32(1.0) - v) * f32(th))), 0), th - 1)
    return tex[ty, tx]


def sample_bilinear(tex, u, v):
    th, tw = tex.shape[0], tex.shape[1]
    fx = u * f32(tw) - f32(0.5)
    fy = (f32(1.0) - v) * f32(th) - f32(0.5)
    x0f = np.floor(fx)
    y0f = np.floor(fy)
    ax = fx - x0f
    ay = fy - y0f
    x0 = min(max(int(x0f), 0), tw - 1)
    x1 = min(max(int(x0f) + 1, 0), tw - 1)
    y0 = min(max(int(y0f), 0), th - 1)
    y1 = min(max(int(y0f) + 1, 0), th - 1)
    t00 = tex[y0, x0].astype(f32)
    t10 = tex[y0, x1].astype(f32)
    t01 = tex[y1, x0].astype(f32)
    t11 = tex[y1, x1].astype(f32)
    return lerp2(lerp2(t00, t10, ax), lerp2(t01, t11, ax), ay)


def srgb_to_linear(c):
    c = np.asarray(c, f32)
    lo = c / f32(12.92)
    hi = ((c + f32(0.055)) / f32(1.055)) ** f32(2.4)
    return np.where(c <= f32(0.04045), lo, hi).astype(f32)


def linear_to_srgb(c):
    c = np.asarray(c, f32)
    lo = c * f32(12.92)
    hi = f32(1.055) * (c ** f32(1.0 / 2.4)) - f32(0.055)
    return np.where(c <= f32(0.0031308), lo, hi).astype(f32)


def blend_over(src, dst):
    return (src + dst * (f32(1.0) - src[..., 3:4])).astype(f32)


def pack_srgb_u8(rgba):
    rgba = np.asarray(rgba, f32)
    a = rgba[..., 3:4]
    safe = np.where(a > 0, a, f32(1.0)).astype(f32)
    straight = np.concatenate([(rgba[..., :3] / safe).astype(f32), a], axis=-1)
    srgb = np.concatenate(
        [linear_to_srgb(straight[..., :3]), straight[..., 3:4]], axis=-1
    )
    return np.floor(np.clip(srgb, f32(0.0), f32(1.0)) * f32(255.0) + f32(0.5)).astype(
        np.uint8
    )
