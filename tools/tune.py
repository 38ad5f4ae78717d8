"""Kernel tuning sweep: tile size x bin capacity on representative scenes.

Run on the TPU; writes results to stdout. Used to pick raster_opts defaults.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from dtrenderer_tpu.models import primitives, scenes
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_meshes
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3
    from dtrenderer_tpu.utils.benchlib import device_time

    h, w = 1080, 1920
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    sphere = primitives.uv_sphere(24, 32)
    tex = primitives.checkerboard(64, 8)
    models = [
        jnp.asarray(m3.model_matrix((x, y, -3.2), m3.rotate_y(0.3 * (x + y)), 1.05))
        for x in (-1.2, 0.0, 1.2) for y in (-0.7, 0.7)
    ]

    def bench_frame(opts):
        def frame(color, depth, t):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
            fb = draw_meshes(
                fb, proj,
                [DrawSpec(sphere, mdl, texture=tex, shading="phong")
                 for mdl in models],
                light=light, sampling_mode="bilinear", raster_opts=opts,
            )
            return fb.color, fb.depth
        return frame

    fb0 = fblib.create(h, w)
    t = jnp.float32(0.5)
    combos = [
        dict(tile_h=32, tile_w=128, capacity=512),
        dict(tile_h=16, tile_w=128, capacity=512),
        dict(tile_h=8, tile_w=128, capacity=256),
        dict(tile_h=16, tile_w=256, capacity=512),
    ]
    for opts in combos:
        t0 = time.time()
        try:
            dt = device_time(bench_frame(opts), fb0.color, fb0.depth, t, iters=8)
            print(f"bench-scene {opts}: {dt*1000:.2f} ms "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"bench-scene {opts}: FAILED {str(e)[:120]}", flush=True)

    # small-triangle stress: 200k soup at 1080p
    for opts in [dict(tile_h=32, tile_w=128, capacity=1024, small_span=8),
                 dict(tile_h=16, tile_w=128, capacity=512, small_span=8),
                 dict(tile_h=8, tile_w=128, capacity=256, small_span=8)]:
        spec = scenes.make_config5(width=w, height=h, n_tris=200_000)
        soup = primitives.random_triangle_soup(200_000, rng_seed=11, extent=1.6)
        gtex = primitives.gradient_texture(64)
        mdl0 = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))

        def frame(color, depth, t, opts=opts):
            from dtrenderer_tpu.ops.pipeline import draw_mesh

            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.04, 1.0], jnp.float32))
            fb = draw_mesh(fb, soup, mdl0, proj, texture=gtex, light=light,
                           shading="gouraud", sampling_mode="nearest",
                           backend="fused", raster_opts=opts, near_clip=False)
            return fb.color, fb.depth

        t0 = time.time()
        try:
            dt = device_time(frame, fb0.color, fb0.depth, t, iters=6)
            print(f"soup-200k {opts}: {dt*1000:.2f} ms -> "
                  f"{200_000/dt/1e6:.1f} Mtris/s (wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"soup-200k {opts}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
