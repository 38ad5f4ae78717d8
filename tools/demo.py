"""Demo scene runner — the analog of the reference's per-frame demo app
(SURVEY.md §2 #3: rotating textured+lit mesh, alpha-blended transformed bitmaps,
primitive demos, debug HUD). Renders N frames through the public API and writes PNGs.

Usage: python tools/demo.py [--out /tmp/demo.png] [--w 800] [--h 600] [--frames 1]
       [--backend ref|pallas] [--scene demo|cube|obj]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dtrenderer_tpu import api
from dtrenderer_tpu.assets.font import bake_builtin_font, encode_text
from dtrenderer_tpu.debug import DebugHud
from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.utils import math3d as m3
from dtrenderer_tpu.utils.color import rgba


def demo_frame(state, t: float, cube_mesh, sphere_mesh, tex, grad, backend: str):
    h, w = state.height, state.width
    proj = m3.perspective(np.pi / 3, w / h, 0.1, 100.0)
    light = api.make_light((0.4, 0.6, 1.0), 0.15)

    state = api.clear(state, rgba(0.06, 0.07, 0.12, 1.0))

    # 3D scene: textured flat-lit cube (config-2 style), Gouraud+bilinear sphere
    # (config-3 style), Phong cube (config-4 style).
    m_cube = m3.model_matrix(
        (-1.4, 0.2, -5.0), m3.mat4mul(m3.rotate_y(t * 1.1), m3.rotate_x(t * 0.7))
    )
    m_sphere = m3.model_matrix((1.5, -0.2, -6.0), m3.rotate_y(t * 0.6), 1.4)
    m_cube2 = m3.model_matrix(
        (0.1, 1.2, -7.5), m3.mat4mul(m3.rotate_y(t * 0.9), m3.rotate_z(t * 0.4)), 0.8
    )
    counters = None
    if backend == "fused":
        # one batched submission; sampling is per-draw (flat cube: nearest,
        # like the reference's blocky texture look; rest bilinear)
        from dtrenderer_tpu.ops.pipeline import DrawSpec

        state, counters = api.render_meshes(
            state, proj,
            [
                DrawSpec(cube_mesh, m_cube, texture=tex, shading="flat",
                         sampling="nearest"),
                DrawSpec(sphere_mesh, m_sphere, texture=grad, shading="gouraud"),
                DrawSpec(cube_mesh, m_cube2, color=rgba(0.9, 0.4, 0.9, 1.0),
                         shading="phong"),
            ],
            light=light, sampling_mode="bilinear", return_counters=True,
        )
    else:
        state = api.render_mesh(
            state, cube_mesh, m_cube, proj, texture=tex, light=light,
            shading="flat", sampling_mode="nearest", backend=backend,
        )
        state = api.render_mesh(
            state, sphere_mesh, m_sphere, proj, texture=grad, light=light,
            shading="gouraud", sampling_mode="bilinear", backend=backend,
        )
        state = api.render_mesh(
            state, cube_mesh, m_cube2, proj, color=rgba(0.9, 0.4, 0.9, 1.0),
            light=light, shading="phong", backend=backend,
        )

    # 2D primitive demos: alpha-blended rects (one rotated), line, circle, blit.
    state = api.render_rectangle(state, (20, h - 90), (120, h - 20),
                                 rgba(0.9, 0.2, 0.2, 0.6))
    state = api.render_rectangle(
        state, (70, h - 110), (180, h - 60), rgba(0.2, 0.6, 0.9, 0.5),
        api.transform2d(rotation=t * 0.8),
    )
    state = api.render_line(state, (w - 180, h - 30), (w - 30, h - 100),
                            rgba(1, 1, 0.3, 1))
    state = api.render_circle(state, (w - 100, h - 140), 28, rgba(0.3, 0.9, 0.4, 0.8))
    bmp = primitives.checkerboard(16, 4, (1, 0.5, 0.1, 0.9), (0.1, 0.3, 1.0, 0.9))
    state = api.render_bitmap(
        state, bmp, (w - 220, 40),
        api.transform2d(rotation=-t, scale=3.0), sampling_mode="bilinear",
    )
    return state, counters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/demo.png")
    ap.add_argument("--w", type=int, default=800)
    ap.add_argument("--h", type=int, default=600)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--backend", default="fused", choices=["ref", "pallas", "fused"])
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    cube_mesh = primitives.cube()
    sphere_mesh = primitives.uv_sphere(24, 32)
    tex = primitives.checkerboard(64, 8, (1.0, 0.85, 0.3, 1.0), (0.15, 0.15, 0.5, 1.0))
    grad = primitives.gradient_texture(64)
    hud = DebugHud(bake_builtin_font(14))
    # proportional footer: per-glyph advances from the native TTF metrics
    # (the reference's stbtt text model, SURVEY.md §2 #5)
    sans_font = bake_builtin_font(16, family="sans")

    # The whole frame is ONE jitted function of (state, t) — the DTR_Update analog:
    # traced once, replayed per frame; state pytree flows through.
    @jax.jit
    def frame_fn(state, t):
        state, counters = demo_frame(state, t, cube_mesh, sphere_mesh, tex,
                                     grad, args.backend)
        return state, api.finish_frame(state), counters

    state = api.new_state(args.w, args.h)
    img = None
    t0 = time.perf_counter()
    _ = jax.block_until_ready(frame_fn(state, jnp.float32(0.0)))
    print(f"compile+first frame: {(time.perf_counter() - t0) * 1000:.0f} ms")
    for i in range(args.frames):
        t0 = time.perf_counter()
        t = 0.6 + i * 0.03
        state, img_dev, counters = frame_fn(state, jnp.float32(t))
        img_dev = jax.block_until_ready(img_dev)
        hud.end_frame_timing()
        hud.push_text("dtrenderer_tpu demo  backend=%s" % args.backend)
        state = state._replace(fb=hud.render(state.fb, counters))
        from dtrenderer_tpu.ops.text import draw_text_proportional

        fb2 = draw_text_proportional(
            state.fb, sans_font,
            encode_text("Proportional text: iiii WWWW (native TTF metrics)"),
            (8, args.h - sans_font.cell_h - 6), (1.0, 0.95, 0.7, 1.0))
        state = state._replace(fb=fb2)
        img = np.asarray(api.finish_frame(state))
        dt = (time.perf_counter() - t0) * 1000
        print(f"frame {i}: {dt:8.1f} ms  ({args.w}x{args.h})")

    from PIL import Image

    out = args.out
    Image.fromarray(img, "RGBA").save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
