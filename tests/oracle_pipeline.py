"""Scalar NumPy oracle for the full mesh draw-call pipeline (pipeline.draw_mesh).

Mirrors build_attrs + visibility + deferred shading with identical formulas/op order
(FORMULAS.md). Vertex-level prep is vectorized np.float32 (same op order as the jnp
code); the per-pixel work is scalar loops.
"""

from __future__ import annotations

import numpy as np

import oracle

f32 = np.float32


def _normalize(v):
    # d > 0 guard: zero-length vectors pass through (ambient-lit), matching
    # shading.normalize_exact and the fused kernel (FORMULAS.md "Lighting").
    d = np.sum(v * v, axis=-1, keepdims=True).astype(f32)
    return (v / np.sqrt(np.where(d > 0, d, f32(1.0)))).astype(f32)


def _light_term(normals, light_dir, ambient):
    n = _normalize(np.asarray(normals, f32))
    l = _normalize(np.asarray(light_dir, f32).reshape(1, -1))[0]
    ndl = np.sum(n * l, axis=-1).astype(f32)
    ndl = np.maximum(ndl, f32(0.0))
    return (f32(ambient) + (f32(1.0) - f32(ambient)) * ndl).astype(f32)


def _transform_points(points3, m):
    out = np.empty((points3.shape[0], 4), f32)
    for i in range(points3.shape[0]):
        out[i] = oracle.transform_point(
            m, [points3[i, 0], points3[i, 1], points3[i, 2], 1.0]
        )
    return out


def _transform_dirs(dirs3, m):
    m = np.asarray(m, f32)
    x = dirs3[:, 0:1]
    y = dirs3[:, 1:2]
    z = dirs3[:, 2:3]
    return np.concatenate(
        [
            (m[0, 0] * x + m[0, 1] * y) + m[0, 2] * z,
            (m[1, 0] * x + m[1, 1] * y) + m[1, 2] * z,
            (m[2, 0] * x + m[2, 1] * y) + m[2, 2] * z,
        ],
        axis=-1,
    ).astype(f32)


class MeshOracle:
    """Holds the np mirror of one draw call; call render() to apply it."""

    def __init__(self, verts, uv, normals, faces, model, mvp, normal_mat,
                 texture, light_dir, ambient, color, shading, sampling,
                 cull_backfaces, height, width):
        self.h, self.w = height, width
        self.faces = np.asarray(faces)
        self.texture = np.asarray(texture, f32)
        self.sampling = sampling
        self.shading = shading
        self.ambient = f32(ambient)
        self.light_dir = np.asarray(light_dir, f32)
        self.cull = cull_backfaces

        self.screen = oracle.vertex_transform(verts, mvp, width, height)

        faces = self.faces
        T = faces.shape[0]
        q = self.screen[faces][:, :, 3].astype(f32)
        uvq = (np.asarray(uv, f32)[faces] * q[..., None]).astype(f32)
        color = np.asarray(color, f32)

        world = _transform_points(np.asarray(verts, f32), model)[:, :3].astype(f32)
        wnormals = _transform_dirs(np.asarray(normals, f32), normal_mat)

        zeros3 = np.zeros((T, 3, 3), f32)
        if shading == "flat":
            w0 = world[faces[:, 0]]
            w1 = world[faces[:, 1]]
            w2 = world[faces[:, 2]]
            face_n = np.cross(w1 - w0, w2 - w0).astype(f32)
            term = _light_term(face_n, self.light_dir, self.ambient)  # [T]
            corner = np.broadcast_to(color, (T, 3, 4)).copy()
            corner[..., :3] = (corner[..., :3] * term[:, None, None]).astype(f32)
            nq = zeros3
        elif shading == "gouraud":
            vterm = _light_term(
                wnormals[faces].reshape(-1, 3), self.light_dir, self.ambient
            ).reshape(T, 3)
            corner = np.broadcast_to(color, (T, 3, 4)).copy()
            corner[..., :3] = (corner[..., :3] * vterm[..., None]).astype(f32)
            nq = zeros3
        elif shading == "phong":
            corner = np.broadcast_to(color, (T, 3, 4)).astype(f32)
            nq = (wnormals[faces] * q[..., None]).astype(f32)
        elif shading == "none":
            corner = np.broadcast_to(color, (T, 3, 4)).astype(f32)
            nq = zeros3
        else:
            raise ValueError(shading)

        rgbaq = (corner * q[..., None]).astype(f32)
        self.attrs = np.concatenate(
            [q[..., None], uvq, rgbaq, nq, np.zeros((T, 3, 3), f32)], axis=-1
        ).astype(f32)  # [T, 3, 16]

    def _shade_fragment(self, t, b):
        """Shade triangle t's fragment with barycentrics b -> premultiplied src."""
        one = f32(1.0)
        a = self.attrs[t]  # [3, 16]
        ip = oracle.interp(b, a[0], a[1], a[2])
        qf = ip[0]
        inv_qf = one / (qf if qf != 0 else one)
        u = ip[1] * inv_qf
        v = ip[2] * inv_qf
        rgba = (ip[3:7] * inv_qf).astype(f32)
        if self.sampling == "nearest":
            texel = oracle.sample_nearest(self.texture, u, v)
        else:
            texel = oracle.sample_bilinear(self.texture, u, v)
        src = (texel * rgba).astype(f32)
        if self.shading == "phong":
            n = (ip[7:10] * inv_qf).astype(f32)
            term = _light_term(n[None, :], self.light_dir, self.ambient)[0]
            src = src.copy()
            src[:3] = (src[:3] * term).astype(f32)
        return src

    def render(self, fb_color, fb_depth):
        """Apply the draw call: returns (new_color, new_depth) f32 arrays."""
        h, w = self.h, self.w
        zbuf, tri = oracle.rasterize(
            self.screen, self.faces, h, w, cull_backfaces=self.cull
        )
        new_color = fb_color.copy()
        new_depth = fb_depth.copy()
        one = f32(1.0)
        for iy in range(h):
            for ix in range(w):
                t = tri[iy, ix]
                if t < 0 or not (zbuf[iy, ix] < fb_depth[iy, ix]):
                    continue
                to = oracle.TriOracle(
                    self.screen[self.faces[t, 0]],
                    self.screen[self.faces[t, 1]],
                    self.screen[self.faces[t, 2]],
                    w, h, self.cull,
                )
                px = f32(ix) + f32(0.5)
                py = f32(iy) + f32(0.5)
                _, _, b = to.coverage(px, py)
                src = self._shade_fragment(t, b)
                dst = new_color[iy, ix]
                new_color[iy, ix] = src + dst * (one - src[3])
                new_depth[iy, ix] = zbuf[iy, ix]
        return new_color, new_depth

    def render_sequential(self, fb_color, fb_depth):
        """Reference forward-loop semantics (SURVEY.md CS-2 ★HOT LOOP): per
        triangle IN SUBMISSION ORDER, per pixel: coverage -> z-test against the
        CURRENT depth -> shade -> blend -> depth WRITE. For opaque geometry this
        equals render(); for overlapping TRANSLUCENT triangles it stacks them in
        submission order — the oracle for pipeline.draw_mesh_ordered."""
        h, w = self.h, self.w
        new_color = fb_color.copy()
        new_depth = fb_depth.copy()
        one = f32(1.0)
        for t in range(self.faces.shape[0]):
            to = oracle.TriOracle(
                self.screen[self.faces[t, 0]],
                self.screen[self.faces[t, 1]],
                self.screen[self.faces[t, 2]],
                w, h, self.cull,
            )
            if not to.valid:
                continue
            for iy in range(to.by0, to.by1 + 1):
                for ix in range(to.bx0, to.bx1 + 1):
                    px = f32(ix) + f32(0.5)
                    py = f32(iy) + f32(0.5)
                    inside, z, b = to.coverage(px, py)
                    if not inside or not (z < new_depth[iy, ix]):
                        continue
                    src = self._shade_fragment(t, b)
                    dst = new_color[iy, ix]
                    new_color[iy, ix] = src + dst * (one - src[3])
                    new_depth[iy, ix] = z
        return new_color, new_depth
