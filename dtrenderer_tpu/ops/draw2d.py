"""2D primitives: line, rectangle, circle, transformed bitmap blit.

TPU-native counterpart of the reference's 2D raster entry points (SURVEY.md §2 #4:
DTRRender_Line (Bresenham), DTRRender_Rectangle, DTRRender_Circle, DTRRender_Bitmap
with scaled/rotated blit + nearest/bilinear sampling, all honoring
DTRRenderTransform {rotation, scale, anchor}). Instead of marching pixels, every op is
a full-frame masked coverage test + premultiplied source-over blend — embarrassingly
parallel VPU work that XLA fuses into a couple of kernels per call. Painter's order =
Python call order. These ops write color only (no depth), matching the reference's 2D
path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dtrenderer_tpu.ops import sampling
from dtrenderer_tpu.ops.fb import Framebuffer
from dtrenderer_tpu.utils.color import blend_over

F32 = jnp.float32


class Transform2D(NamedTuple):
    """Mirror of the reference's DTRRenderTransform {rotation, scale, anchor}.

    rotation: radians CCW (screen y-down, so visually clockwise); scale: [2] or
    scalar; anchor: [2] in [0,1] of the primitive's extent (0.5,0.5 = center).
    """
    rotation: jnp.ndarray
    scale: jnp.ndarray
    anchor: jnp.ndarray


def transform2d(rotation=0.0, scale=1.0, anchor=(0.5, 0.5)) -> Transform2D:
    return Transform2D(
        rotation=jnp.asarray(rotation, F32),
        scale=jnp.broadcast_to(jnp.asarray(scale, F32), (2,)),
        anchor=jnp.asarray(anchor, F32),
    )


def _pixel_grid(fb: Framebuffer):
    h, w = fb.depth.shape
    px = (jnp.arange(w, dtype=F32) + F32(0.5))[None, :]
    py = (jnp.arange(h, dtype=F32) + F32(0.5))[:, None]
    return jnp.broadcast_to(px, (h, w)), jnp.broadcast_to(py, (h, w))


def _composite(fb: Framebuffer, mask, src_rgba) -> Framebuffer:
    """Blend src (premultiplied [4] or [H,W,4]) where mask, color only."""
    src = jnp.broadcast_to(jnp.asarray(src_rgba, F32), fb.color.shape)
    blended = blend_over(src, fb.color)
    new_color = jnp.where(mask[..., None], blended, fb.color)
    return Framebuffer(color=new_color, depth=fb.depth)


def _inv_transform_coords(px, py, pos, size, t: Transform2D):
    """Map framebuffer pixel centers into the primitive's local [0,size] box.

    The primitive of extent `size` is anchored at `pos` by `t.anchor`, scaled then
    rotated about the anchor point.
    """
    pos = jnp.asarray(pos, F32)
    size = jnp.asarray(size, F32)
    c = jnp.cos(-t.rotation)
    s = jnp.sin(-t.rotation)
    dx = px - pos[0]
    dy = py - pos[1]
    rx = c * dx - s * dy
    ry = s * dx + c * dy
    lx = rx / (t.scale[0] * 1.0) + t.anchor[0] * size[0]
    ly = ry / (t.scale[1] * 1.0) + t.anchor[1] * size[1]
    return lx, ly


def fill_rect(fb: Framebuffer, min_xy, max_xy, color, t: Transform2D | None = None):
    """DTRRender_Rectangle: [min, max) rect, optionally rotated/scaled about anchor."""
    px, py = _pixel_grid(fb)
    mn = jnp.asarray(min_xy, F32)
    mx = jnp.asarray(max_xy, F32)
    if t is None:
        mask = (px >= mn[0]) & (px < mx[0]) & (py >= mn[1]) & (py < mx[1])
    else:
        size = mx - mn
        pos = mn + t.anchor * size
        lx, ly = _inv_transform_coords(px, py, pos, size, t)
        mask = (lx >= 0) & (lx < size[0]) & (ly >= 0) & (ly < size[1])
    return _composite(fb, mask, color)


def line(fb: Framebuffer, p0, p1, color):
    """DTRRender_Line: 1px DDA line (vectorized Bresenham-equivalent coverage).

    A pixel lies on the line iff its major-axis coordinate is in range and its
    minor-axis integer coordinate equals round(DDA(major)).
    """
    p0 = jnp.asarray(p0, F32)
    p1 = jnp.asarray(p1, F32)
    h, w = fb.depth.shape
    ix = jnp.broadcast_to(jnp.arange(w, dtype=F32)[None, :], (h, w))
    iy = jnp.broadcast_to(jnp.arange(h, dtype=F32)[:, None], (h, w))
    dx = p1[0] - p0[0]
    dy = p1[1] - p0[1]

    def axis_mask(maj, mnr, maj0, mnr0, dmaj, dmnr):
        slope = dmnr / jnp.where(dmaj == 0, F32(1.0), dmaj)
        expect = jnp.floor(mnr0 + (maj - maj0) * slope + F32(0.5))
        lo = jnp.minimum(maj0, maj0 + dmaj)
        hi = jnp.maximum(maj0, maj0 + dmaj)
        return (mnr == expect) & (maj >= jnp.floor(lo)) & (maj <= jnp.ceil(hi))

    x_major = jnp.abs(dx) >= jnp.abs(dy)
    mx = axis_mask(ix, iy, jnp.floor(p0[0]), jnp.floor(p0[1]), dx, dy)
    my = axis_mask(iy, ix, jnp.floor(p0[1]), jnp.floor(p0[0]), dy, dx)
    mask = jnp.where(x_major, mx, my)
    return _composite(fb, mask, color)


def fill_circle(fb: Framebuffer, center, radius, color):
    px, py = _pixel_grid(fb)
    c = jnp.asarray(center, F32)
    d2 = (px - c[0]) ** 2 + (py - c[1]) ** 2
    mask = d2 <= jnp.asarray(radius, F32) ** 2
    return _composite(fb, mask, color)


def circle_outline(fb: Framebuffer, center, radius, color, thickness=1.0):
    px, py = _pixel_grid(fb)
    c = jnp.asarray(center, F32)
    r = jnp.asarray(radius, F32)
    th = jnp.asarray(thickness, F32)
    d = jnp.sqrt((px - c[0]) ** 2 + (py - c[1]) ** 2)
    mask = jnp.abs(d - r) <= th * F32(0.5)
    return _composite(fb, mask, color)


def blit(
    fb: Framebuffer,
    bitmap,
    pos,
    t: Transform2D | None = None,
    sampling_mode: str = "nearest",
    tint=(1.0, 1.0, 1.0, 1.0),
):
    """DTRRender_Bitmap: blit a premultiplied f32 RGBA bitmap [bh, bw, 4] at pos,
    honoring Transform2D (rotation/scale/anchor) and alpha blending.

    Inverse-maps every framebuffer pixel into bitmap space and samples — rotation
    and scaling come for free, like the reference's transformed blit.
    """
    if t is None:
        t = transform2d(anchor=(0.0, 0.0))
    bh, bw = bitmap.shape[0], bitmap.shape[1]
    size = jnp.asarray([bw, bh], F32)
    px, py = _pixel_grid(fb)
    lx, ly = _inv_transform_coords(px, py, jnp.asarray(pos, F32), size, t)
    inside = (lx >= 0) & (lx < size[0]) & (ly >= 0) & (ly < size[1])

    # Bitmap space: ly is a row from the TOP (screen convention), so v = 1 - ly/bh.
    u = lx / size[0]
    v = F32(1.0) - ly / size[1]
    texel = sampling.sample(bitmap, u, v, sampling_mode)
    src = texel * jnp.asarray(tint, F32)
    src = jnp.where(inside[..., None], src, jnp.zeros((4,), F32))
    blended = blend_over(src, fb.color)
    new_color = jnp.where(inside[..., None], blended, fb.color)
    return Framebuffer(color=new_color, depth=fb.depth)
