"""Soup-scene (triangle throughput) config sweep on the TPU.

End-to-end frames (vertex -> binning -> fused kernel) across tile/capacity/
small_span/use_ybounds combinations. Drives the soup raster_opts in bench.py.
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
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import DrawSpec, audit_scene, draw_meshes
    from dtrenderer_tpu.utils import math3d as m3
    from dtrenderer_tpu.utils.benchlib import device_time

    h, w = 1080, 1920
    soup = primitives.random_triangle_soup(200_000, rng_seed=11, extent=1.6)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    fb0 = fblib.create(h, w)

    def make(opts):
        def frame(color, depth, t):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0],
                                             jnp.float32))
            rot_t = m3.rotate_y(t - jnp.float32(0.5))
            fb = draw_meshes(fb, proj,
                             [DrawSpec(soup, m3.mat4mul(mdl, rot_t),
                                       shading="gouraud")],
                             sampling_mode="nearest", near_clip=False,
                             raster_opts=opts)
            return fb.color, fb.depth
        return frame

    combos = [
        dict(tile_h=16, capacity=512, small_span=8, use_ybounds=False,
             cols=3),
        dict(tile_h=16, capacity=512, small_span=8, use_ybounds=False,
             cols=5),
        dict(tile_h=8, capacity=640, small_span=8, cols=3),  # 1-slab fine bins
    ]
    for opts in combos:
        tag = (f"t{opts['tile_h']}c{opts['capacity']}s{opts['small_span']}"
               f"{'noyb' if opts.get('use_ybounds') is False else ''}")
        try:
            ov, mx, cap = audit_scene(
                proj, [DrawSpec(soup, mdl, shading="gouraud")], h, w,
                near_clip=False, raster_opts=opts)
            if ov:
                print(f"{tag:18s} OVERFLOW {ov} (max {mx}/{cap})", flush=True)
                continue
            t0 = time.time()
            dt = device_time(make(opts), fb0.color, fb0.depth,
                             jnp.float32(0.5), iters=8)
            print(f"{tag:18s} {dt*1000:8.2f} ms  {0.2/dt:6.2f} Mtris/s  "
                  f"(max {mx}/{cap}, wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag:18s} FAILED {str(e)[:130]}", flush=True)


if __name__ == "__main__":
    main()
