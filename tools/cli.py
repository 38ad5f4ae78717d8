"""Scene runner CLI — renders any BASELINE config or the demo scene to PNG/NPY.

The runtime-flags analog of the reference's compile-time #define config
(SURVEY.md §5 "Config / flag system"): resolution, scene, backend, sampling/shading
overrides, frame count, device-mesh shape all become flags.

Examples:
  python tools/cli.py --scene 3 --frames 5 --out /tmp/c3.png
  python tools/cli.py --scene 4 --backend pallas --w 1920 --h 1080
  python tools/cli.py --scene 5 --rows 8            # shard 4K frame over 8 devices
  python tools/cli.py --scene 4 --rows 4 --cols 2   # 2D (rows x cols) tiles
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="demo",
                    help="demo | 1..5 (BASELINE configs) | path/to/mesh.obj")
    ap.add_argument("--w", type=int, default=None)
    ap.add_argument("--h", type=int, default=None)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--out", default="/tmp/frame.png")
    ap.add_argument("--backend", default="fused", choices=["ref", "pallas", "fused"])
    ap.add_argument("--rows", type=int, default=0,
                    help="shard the framebuffer into N row bands over devices")
    ap.add_argument("--cols", type=int, default=1,
                    help="also shard into M column bands (rows x cols 2D tiles)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tris", type=int, default=1_000_000,
                    help="triangle count for scene 5")
    ap.add_argument("--save-npy", action="store_true",
                    help="also dump the raw f32 framebuffer")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dtrenderer_tpu.models import scenes
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.fb import Framebuffer
    from dtrenderer_tpu.utils.color import pack_srgb_u8

    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.scene == "demo":
        import tools.demo as demo_mod  # reuse the demo scene

        sys.argv = ["demo", "--out", args.out, "--frames", str(args.frames),
                    "--backend", args.backend]
        if args.w:
            sys.argv += ["--w", str(args.w)]
        if args.h:
            sys.argv += ["--h", str(args.h)]
        demo_mod.main()
        return

    if args.scene.endswith(".obj"):
        from dtrenderer_tpu.assets.obj import load_obj
        from dtrenderer_tpu.models.scenes import SceneSpec, _clear, make_config3
        from dtrenderer_tpu.ops.pipeline import draw_mesh
        from dtrenderer_tpu.ops.shading import make_light
        from dtrenderer_tpu.utils import math3d as m3
        from dtrenderer_tpu.models import primitives

        w, h = args.w or 800, args.h or 600
        mesh = load_obj(args.scene)
        # auto-frame: center + scale to unit-ish box
        v = np.asarray(mesh.verts)
        center = (v.max(0) + v.min(0)) / 2
        radius = float(np.linalg.norm(v - center, axis=1).max())
        proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.05 * radius,
                                          100.0 * radius))
        light = make_light((0.4, 0.6, 1.0), 0.15)
        tex = primitives.gradient_texture(64)

        def frame(color, depth, t):
            fb = _clear(color, depth, [0.05, 0.05, 0.08, 1.0])
            mdl = m3.mat4mul(
                m3.mat4mul(m3.translate((0, 0, -2.8 * radius)), m3.rotate_y(t)),
                m3.translate(-center))
            fb = draw_mesh(fb, mesh, mdl, proj, texture=tex, light=light,
                           shading="gouraud", sampling_mode="bilinear",
                           backend=args.backend)
            return fb.color, fb.depth

        spec = scenes.SceneSpec(os.path.basename(args.scene), w, h,
                                mesh.num_tris, frame)
    else:
        n = int(args.scene)
        kw = {}
        if args.w:
            kw["width"] = args.w
        if args.h:
            kw["height"] = args.h
        if n == 5:
            kw["n_tris"] = args.tris
        spec = scenes.ALL_CONFIGS[n](backend=args.backend, **kw)

    print(f"scene {spec.name}: {spec.width}x{spec.height}, {spec.n_tris} tris, "
          f"backend={args.backend}", file=sys.stderr)

    if args.rows > 1 or args.cols > 1:
        from dtrenderer_tpu.parallel import shard

        dmesh = shard.make_mesh(frames=1, rows=max(args.rows, 1),
                                cols=args.cols)

        def band_fn(band_fb, t, y0, fh, fw, x0):
            c, d = spec.frame(band_fb.color, band_fb.depth, t,
                              y_offset=y0, frame_height=fh, frame_width=fw,
                              x_offset=x0)
            return Framebuffer(c, d)

        fbs = shard.create_sharded_fb(spec.height, spec.width, dmesh, batch=1)
        step = jax.jit(lambda fb, t: shard.render_frames_sharded(
            band_fn, fb, dmesh, t[None]))
        t0 = time.perf_counter()
        out = step(fbs, jnp.float32(0.6))
        np.asarray(out.color[0])
        print(f"first frame (incl. compile): "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        for i in range(1, args.frames):
            # Same semantics as the unsharded branch: each frame renders fresh
            # from the cleared framebuffer (spec.frame clears first regardless).
            out = step(fbs, jnp.float32(0.6 + 0.05 * i))
        color = np.asarray(out.color[0])
    else:
        fb0 = fblib.create(spec.height, spec.width)
        step = jax.jit(spec.frame)
        t0 = time.perf_counter()
        color, depth = step(fb0.color, fb0.depth, jnp.float32(0.6))
        color_np = np.asarray(color)
        print(f"first frame (incl. compile): "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        for i in range(1, args.frames):
            t0 = time.perf_counter()
            color, depth = step(fb0.color, fb0.depth, jnp.float32(0.6 + 0.05 * i))
            color_np = np.asarray(color)
            print(f"frame {i}: {(time.perf_counter()-t0)*1000:.1f} ms "
                  f"(incl. host fetch)", file=sys.stderr)
        color = color_np

    img = np.asarray(pack_srgb_u8(jnp.asarray(color)))
    from PIL import Image

    Image.fromarray(img, "RGBA").save(args.out)
    print(f"wrote {args.out}")
    if args.save_npy:
        np.save(args.out + ".npy", color)
        print(f"wrote {args.out}.npy")


if __name__ == "__main__":
    main()
