"""Phase/variant profiling for the fused kernel on the bench scene.

Times the production 1080p bench frame under controlled variants to attribute
cost: phase 1 only (skip_shading), sampling mode, phong on/off, chunk/cols
sweeps. Run on the TPU; each NEW variant pays a remote compile (1-10 min cold),
so keep the variant list short and the compilation cache warm.
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
    fb0 = fblib.create(h, w)
    t = jnp.float32(0.5)

    def make_frame(opts, shading="phong", sampling="bilinear"):
        def frame(color, depth, tt):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
            rot_t = m3.rotate_y(tt - jnp.float32(0.5))
            fb = draw_meshes(
                fb, proj,
                [DrawSpec(sphere, m3.mat4mul(mdl, rot_t), texture=tex,
                          shading=shading) for mdl in models],
                light=light, sampling_mode=sampling, raster_opts=opts,
            )
            return fb.color, fb.depth
        return frame

    base = dict(tile_h=64, tile_w=128, capacity=256)
    b32 = {**base, "batch_rows": 32}
    variants = [
        ("t64-b32 (bench)", make_frame(b32)),
        ("t64-b32-phase1", make_frame({**b32, "skip_shading": True})),
        ("t128c384-b32", make_frame(dict(tile_h=128, tile_w=128, capacity=384,
                                         batch_rows=32))),
        ("t32c256-b32", make_frame(dict(tile_h=32, tile_w=128, capacity=256,
                                        batch_rows=32))),
    ]
    for name, frame in variants:
        t0 = time.time()
        try:
            dt = device_time(frame, fb0.color, fb0.depth, t, iters=10)
            print(f"{name:24s} {dt*1000:8.2f} ms  (wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {str(e)[:140]}", flush=True)

    # ---- soup scene (triangle throughput) attribution ----
    n_tris = 200_000
    soup = primitives.random_triangle_soup(n_tris, rng_seed=11, extent=1.6)
    mdl_s = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))

    def make_soup(opts):
        def frame(color, depth, tt):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
            rot_t = m3.rotate_y(tt - jnp.float32(0.5))
            fb = draw_meshes(fb, proj,
                             [DrawSpec(soup, m3.mat4mul(mdl_s, rot_t),
                                       shading="gouraud")],
                             sampling_mode="nearest", near_clip=False,
                             raster_opts=opts)
            return fb.color, fb.depth
        return frame

    def bin_only(color, depth, tt):
        # vertex pipeline + binning cost alone (no kernel)
        from dtrenderer_tpu.ops.binning import bin_triangles
        from dtrenderer_tpu.ops.pipeline import prepare_draw
        rot_t = m3.rotate_y(tt - jnp.float32(0.5))
        model = m3.mat4mul(mdl_s, rot_t)
        mvp = m3.mat4mul(proj, model)
        setup, attrs10 = prepare_draw(soup, model, proj, mvp, model, light,
                                      (1.0, 1.0, 1.0, 1.0), "gouraud",
                                      w, h, True, False)
        T = setup.coef.shape[0]
        payload = jnp.concatenate(
            [jnp.zeros((T, 4), jnp.float32), attrs10.reshape(T, 30)], axis=1)
        bins = bin_triangles(setup.coef, setup.bbox, setup.valid, h, w,
                             tile_h=16, tile_w=128, capacity=512, small_span=8,
                             broad_cap=128, payload=payload,
                             n_slabs=1)
        return bins.setup, color

    soup_base = dict(tile_h=16, capacity=512, small_span=8, use_ybounds=False,
                     cols=2)
    svariants = [
        ("soup cols2", make_soup(soup_base)),
        ("soup cols2-batch16", make_soup({**soup_base, "batch_rows": 16})),
    ]
    for name, frame in svariants:
        t0 = time.time()
        try:
            dt = device_time(frame, fb0.color, fb0.depth, t, iters=8)
            print(f"{name:24s} {dt*1000:8.2f} ms  (wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
