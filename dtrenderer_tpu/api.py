"""DTRenderer-shaped public API surface.

Mirrors the reference's `DTRRender_*` call set and semantics (SURVEY.md §2 #4: Clear,
Line, Rectangle, Circle, Bitmap, Text, Triangle, Mesh, with DTRRenderTransform
{rotation, scale, anchor} on 2D primitives) so a user of the reference finds the same
verbs here — but everything is functional: each call takes and returns a RenderState
whose framebuffer lives on device, and a frame is just a Python function of
(state, inputs) that JAX traces once and replays (the analog of the reference's
hot-reloadable DTR_Update: state survives, code retraces — SURVEY.md §5
"checkpoint/resume").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dtrenderer_tpu.ops import draw2d, fb as fblib, geometry, pipeline, text as textlib
from dtrenderer_tpu.ops.fb import Framebuffer
from dtrenderer_tpu.ops.raster_ref import rasterize_ref
from dtrenderer_tpu.ops.shading import Light, make_light
from dtrenderer_tpu.assets.font import Font, bake_builtin_font, encode_text
from dtrenderer_tpu.ops.draw2d import Transform2D, transform2d

__all__ = [
    "RenderState", "Transform2D", "transform2d", "new_state", "clear",
    "render_line", "render_rectangle", "render_circle", "render_bitmap",
    "render_triangle", "render_mesh", "render_text", "finish_frame", "make_light",
]


class RenderState(NamedTuple):
    """The per-frame render target (PlatformRenderBuffer + z-buffer analog)."""
    fb: Framebuffer

    @property
    def width(self) -> int:
        return self.fb.width

    @property
    def height(self) -> int:
        return self.fb.height


def new_state(width: int, height: int) -> RenderState:
    return RenderState(fb=fblib.create(height, width))


def clear(state: RenderState, color=(0, 0, 0, 1)) -> RenderState:
    return state._replace(fb=fblib.clear(state.fb, jnp.asarray(color, jnp.float32)))


def render_line(state: RenderState, p0, p1, color) -> RenderState:
    return state._replace(fb=draw2d.line(state.fb, p0, p1, color))


def render_rectangle(state: RenderState, min_xy, max_xy, color,
                     transform: Transform2D | None = None) -> RenderState:
    return state._replace(
        fb=draw2d.fill_rect(state.fb, min_xy, max_xy, color, transform)
    )


def render_circle(state: RenderState, center, radius, color,
                  filled: bool = True) -> RenderState:
    f = draw2d.fill_circle if filled else draw2d.circle_outline
    return state._replace(fb=f(state.fb, center, radius, color))


def render_bitmap(state: RenderState, bitmap, pos,
                  transform: Transform2D | None = None,
                  sampling_mode: str = "nearest",
                  tint=(1.0, 1.0, 1.0, 1.0)) -> RenderState:
    return state._replace(
        fb=draw2d.blit(state.fb, bitmap, pos, transform, sampling_mode, tint)
    )


def render_text(state: RenderState, s, pos, color=(1, 1, 1, 1),
                font: Font | None = None, scale: int = 1,
                proportional: bool = False) -> RenderState:
    font = font or bake_builtin_font(12)
    codes = encode_text(s) if isinstance(s, str) else s
    draw = (textlib.draw_text_proportional if proportional
            else textlib.draw_text)
    return state._replace(fb=draw(state.fb, font, codes, pos, color, scale))


def render_triangle(state: RenderState, p0, p1, p2, color=(1, 1, 1, 1),
                    uv0=(0, 0), uv1=(1, 0), uv2=(0, 1), texture=None,
                    sampling_mode: str = "nearest",
                    cull_backfaces: bool = False) -> RenderState:
    """DTRRender_Triangle analog for direct screen-space triangles.

    p0..p2: (x, y) or (x, y, z[, q]) screen coords; z defaults to 0.5, q to 1
    (pass per-corner q for perspective-correct interpolation of uv). Optional
    texture (premultiplied linear f32 [th,tw,4]) modulated by `color`;
    depth-tested against the state's z-buffer; alpha blended.
    """
    import jax.numpy as jnp

    from dtrenderer_tpu.ops.pipeline import shade_deferred
    from dtrenderer_tpu.ops.shading import make_light

    fb = state.fb
    h, w = fb.depth.shape

    corners = []
    for p in (p0, p1, p2):
        p = list(p)
        while len(p) < 4:
            p.append({2: 0.5, 3: 1.0}[len(p)])
        corners.append(p[:4])
    c = jnp.asarray(corners, jnp.float32)  # [3, 4] (sx, sy, sz, q)
    setup = geometry.triangle_setup_from_corners(
        c[0:1], c[1:2], c[2:3], w, h, cull_backfaces
    )
    z, tri = rasterize_ref(setup.coef, setup.valid, h, w)

    # per-corner attrs [1, 3, 16]: q, u*q, v*q, rgba*q, n*q(0), pad
    q = c[:, 3:4]  # [3, 1]
    uv = jnp.asarray([uv0, uv1, uv2], jnp.float32)  # [3, 2]
    rgba = jnp.broadcast_to(jnp.asarray(color, jnp.float32), (3, 4))
    attrs = jnp.concatenate(
        [q, uv * q, rgba * q, jnp.zeros((3, 9), jnp.float32)], axis=-1
    )[None]  # [1, 3, 16]
    tex = texture if texture is not None else jnp.ones((1, 1, 4), jnp.float32)
    out = shade_deferred(
        fb, z, tri, setup.coef, attrs, tex, sampling_mode, "none", make_light()
    )
    return state._replace(fb=out)


def render_mesh(state: RenderState, mesh, model, view_proj, **kwargs):
    """DTRRender_Mesh analog; kwargs forwarded to ops.pipeline.draw_mesh.

    With return_counters=True, returns (state, FrameCounters) — counters are
    device scalars (incl. bin_overflow) usable inside jitted frames."""
    out = pipeline.draw_mesh(state.fb, mesh, model, view_proj, **kwargs)
    if kwargs.get("return_counters"):
        fb, counters = out
        return state._replace(fb=fb), counters
    return state._replace(fb=out)


def render_mesh_ordered(state: RenderState, mesh, model, view_proj, **kwargs):
    """Submission-order mesh draw (the reference's sequential per-pixel blend
    + depth-write semantics — required for TRANSLUCENT geometry; kwargs
    forwarded to ops.pipeline.draw_mesh_ordered: engine="tile"/"scan"/"auto",
    raster_opts, return_counters). Opaque meshes should use render_mesh
    (bit-identical for opaque, faster)."""
    out = pipeline.draw_mesh_ordered(state.fb, mesh, model, view_proj,
                                     **kwargs)
    if kwargs.get("return_counters"):
        fb, counters = out
        return state._replace(fb=fb), counters
    return state._replace(fb=out)


def render_meshes(state: RenderState, view_proj, draws, **kwargs):
    """Batched scene submission: all opaque meshes in one fused kernel call.

    draws: sequence of pipeline.DrawSpec. Bit-identical to sequential
    render_mesh calls for opaque geometry (order-independent depth resolve).
    With return_counters=True, returns (state, FrameCounters)."""
    out = pipeline.draw_meshes(state.fb, view_proj, draws, **kwargs)
    if kwargs.get("return_counters"):
        fb, counters = out
        return state._replace(fb=fb), counters
    return state._replace(fb=out)


def finish_frame(state: RenderState) -> jnp.ndarray:
    """Pack to display sRGB u8 [H, W, 4] (the StretchDIBits-blit analog)."""
    return fblib.pack(state.fb)
