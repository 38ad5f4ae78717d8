"""Config-5 (1M-tri soup @4K) stage attribution + variant sweep on the TPU.

Splits the 405 ms frame into prep / binning / phase-1 / full to find where the
time goes, then tries the candidate structural fixes (slab culling, tile size,
chunk) the attribution justifies. Each NEW variant is a remote compile
(1-10 min cold) — keep the list short, cache warm.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


def main():
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.binning import bin_triangles
    from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_meshes, prepare_draw
    from dtrenderer_tpu.ops.render_fused import pack_payload, plan_layout
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3

    h, w = 2160, 3840
    n_tris = 1_000_000
    soup = primitives.random_triangle_soup(n_tris, rng_seed=11, extent=1.6)
    tex = primitives.gradient_texture(64)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    light = make_light((0.3, 0.5, 1.0), 0.2)
    mdl0 = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    fb0 = fblib.create(h, w)

    def make_frame(opts):
        def frame(color, depth, t):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.04, 1], jnp.float32))
            rot_t = m3.rotate_y(t - jnp.float32(0.5))
            fb = draw_meshes(
                fb, proj,
                [DrawSpec(soup, m3.mat4mul(mdl0, rot_t), texture=tex,
                          shading="gouraud")],
                light=light, sampling_mode="nearest", near_clip=False,
                raster_opts=opts,
            )
            return fb.color, fb.depth
        return frame

    layout = plan_layout([dict(textured=True, phong=False,
                               corner_rgba_is_q=False, meta=(0, 64, 64))],
                         mixed_sampling=False)

    def prep_pack(t):
        model = m3.mat4mul(mdl0, m3.rotate_y(t - jnp.float32(0.5)))
        mvp = m3.mat4mul(proj, model)
        setup, attrs10 = prepare_draw(soup, model, proj, mvp, model, light,
                                      (1.0, 1.0, 1.0, 1.0), "gouraud",
                                      w, h, True, False)
        payload = pack_payload(attrs10, layout, (0, 64, 64), 0.0)
        return setup.coef, setup.bbox, setup.valid, payload

    def bin_only(tile_h, small_span, cap, n_slabs, pair_budget=None):
        def f(t):
            coef, bbox, valid, payload = prep_pack(t)
            bins = bin_triangles(coef, bbox, valid, h, w, tile_h=tile_h,
                                 tile_w=128, capacity=cap,
                                 small_span=small_span, broad_cap=128,
                                 payload=payload, n_slabs=n_slabs,
                                 pair_budget=pair_budget)
            return bins.setup, bins.counts
        return f

    # CURRENT production config-5 settings (models/scenes.make_config5):
    # cap 1536, small_span 8, flat_bins + 1.4x pair budget, t32, chunk 32,
    # no slab culling, cols=2. Post-round-3 split of the ~206 ms frame:
    # prep ~5 | binning ~62 | phase-1 ~79 | shading+merge ~60.
    budget = int(1.4 * n_tris)  # production config-5 setting (scenes.py)
    cfg = dict(capacity=1536, small_span=8, chunk=16, use_ybounds=False,
               cols=2, pair_budget=budget)

    def bin_flat(tile_h, small_span, cap):
        from dtrenderer_tpu.ops.binning import bin_triangles_flat

        def f(t):
            coef, bbox, valid, payload = prep_pack(t)
            fbins = bin_triangles_flat(coef, bbox, valid, h, w,
                                       tile_h=tile_h, tile_w=128,
                                       capacity=cap, small_span=small_span,
                                       broad_cap=128, payload=payload,
                                       pair_budget=budget)
            return fbins.table, fbins.counts, fbins.overflow
        return f

    # broad-count audit for small_span candidates (a span cut moves tris to
    # the broad list EVERY tile walks — must stay < broad_cap)
    setup0 = prep_pack(jnp.float32(0.5))
    bbox0, valid0 = setup0[1], setup0[2]
    for th, ss in ((32, 8),):
        tx0, ty0 = bbox0[:, 0] // 128, bbox0[:, 1] // th
        tx1, ty1 = bbox0[:, 2] // 128, bbox0[:, 3] // th
        cover = jnp.where(valid0, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
        nb = int(np.asarray(jnp.sum((cover > ss).astype(jnp.int32))))
        nmid = int(np.asarray(jnp.sum(
            ((cover > 2) & (cover <= ss)).astype(jnp.int32))))
        # host-side int64 accumulation: jnp.sum(dtype=int64) silently
        # downgrades to int32 under the default jax_enable_x64=False
        npairs = int(np.asarray(
            jnp.where(cover <= ss, cover, 0)).astype(np.int64).sum())
        print(f"audit t{th} ss{ss}: broads={nb} mids={nmid} "
              f"small_pairs={npairs}", flush=True)

    # ---- phase-2 attribution (VERDICT r3 #7): split the ~60 ms of
    # "shading+merge" into (a) the XLA depth-merge/blend (measured alone on
    # same-shaped inputs), (b) the in-kernel phase-2 work (full - phase1only
    # - merge). Run with: python tools/profile_4k.py --phase2
    def merge_only():
        from dtrenderer_tpu.ops import fb as fblib2
        from dtrenderer_tpu.utils.color import blend_over

        z0 = jnp.full((h, w), 1.0, jnp.float32)
        src0 = jnp.full((h, w, 4), 0.25, jnp.float32)
        fb0b = fblib2.create(h, w)

        def f(z, src, color, depth, t):
            zt = z + t * jnp.float32(1e-45)
            win = zt < depth
            blended = blend_over(src, color)
            return (jnp.where(win[..., None], blended, color),
                    jnp.where(win, zt, depth))

        return device_time(f, z0, src0, fb0b.color, fb0b.depth,
                           jnp.float32(0.5), iters=8, repeats=2)

    if "--phase2" in sys.argv:
        dt_m = merge_only()
        print(f"merge-only (XLA blend+where @4K)   {dt_m*1000:8.1f} ms",
              flush=True)

        # untextured variant: plan_layout drops uv+texmeta, the kernel skips
        # uv interp + LUT gathers — (full - untextured) attributes the
        # texture-side cost inside phase 2 (the rest is rgba interp + store).
        def make_frame_untex(opts):
            def frame(color, depth, t):
                fb = fblib.Framebuffer(color, depth)
                fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.04, 1],
                                                 jnp.float32))
                rot_t = m3.rotate_y(t - jnp.float32(0.5))
                fb = draw_meshes(
                    fb, proj,
                    [DrawSpec(soup, m3.mat4mul(mdl0, rot_t),
                              shading="gouraud")],
                    light=light, sampling_mode="nearest", near_clip=False,
                    raster_opts=opts,
                )
                return fb.color, fb.depth
            return frame

        for name, mk, opts in [
            ("full flat", make_frame, dict(cfg, flat_bins=True, chunk=32)),
            ("phase1-only flat", make_frame,
             dict(cfg, flat_bins=True, chunk=32, skip_shading=True)),
            ("untextured flat", make_frame_untex,
             dict(cfg, flat_bins=True, chunk=32)),
        ]:
            dt = device_time(mk(opts), fb0.color, fb0.depth,
                             jnp.float32(0.5), iters=4, repeats=2)
            print(f"{name:34s} {dt*1000:8.1f} ms", flush=True)
        return

    variants = [
        ("bin-only flat t32", bin_flat(32, 8, 1536), False),
        ("phase1 flat chunk16", make_frame(
            dict(cfg, flat_bins=True, skip_shading=True)), True),
        ("phase1 flat chunk32", make_frame(
            dict(cfg, flat_bins=True, skip_shading=True, chunk=32)), True),
        ("phase1 flat chunk8", make_frame(
            dict(cfg, flat_bins=True, skip_shading=True, chunk=8)), True),
        ("phase1 flat c16 cols4", make_frame(
            dict(cfg, flat_bins=True, skip_shading=True, cols=4)), True),
        ("full flat chunk32 cols4", make_frame(
            dict(cfg, flat_bins=True, chunk=32, cols=4)), True),
    ]
    for name, fn, takes_fb in variants:
        try:
            if takes_fb:
                dt = device_time(fn, fb0.color, fb0.depth, jnp.float32(0.5),
                                 iters=4, repeats=2)
            else:
                dt = device_time(fn, jnp.float32(0.5), iters=4, repeats=2)
            print(f"{name:26s} {dt*1000:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
