"""TPU hardware smoke gate: compile + run every Pallas kernel variant on the
real chip before trusting bench numbers or shipping kernel edits.

WHY THIS EXISTS: the automated suite runs Pallas in interpret mode on CPU
(tests/conftest.py), and interpret mode accepts programs Mosaic REJECTS on
hardware (lane-span gathers, shape casts — CLAUDE.md "Platform gotchas"). A
kernel edit can pass the whole suite and still fail to compile on the chip.
This script is the gate the interpret-mode suite cannot be: it hardware-
compiles the production kernels at their tuned configurations and runs one
frame each, checking output sanity.

Usage:  timeout 1800 python tools/tpu_smoke.py          (~2 min warm-cache,
        first-ever run pays remote compiles: minutes per program)
Run it: before any bench.py run, after ANY edit to ops/render_fused.py,
        ops/raster_pallas.py, or ops/binning.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def check(name, fn):
    t0 = time.perf_counter()
    fn()
    print(f"  ok: {name}  ({time.perf_counter() - t0:.1f}s)", file=sys.stderr)


def main():
    assert jax.default_backend() == "tpu", (
        f"tpu_smoke must run on the TPU (got {jax.default_backend()}); "
        "interpret mode cannot catch Mosaic failures")
    print(f"tpu_smoke: {jax.devices()}", file=sys.stderr)

    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_mesh, draw_meshes
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3

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

    def sane(fb):
        cov = int(np.asarray(jnp.sum(jnp.isfinite(fb.depth), dtype=jnp.int32)))
        mx = float(np.asarray(jnp.max(fb.color)))
        assert cov > 1000 and np.isfinite(mx), f"degenerate output cov={cov}"

    # 1. fused kernel, bench config (phong + bilinear, tile 64x128 cap 256)
    def fused_bench():
        @jax.jit
        def f(color, depth):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0, 0, 0, 1], jnp.float32))
            return draw_meshes(
                fb, proj,
                [DrawSpec(sphere, m, texture=tex, shading="phong")
                 for m in models],
                light=light, sampling_mode="bilinear",
                raster_opts=dict(tile_h=64, tile_w=128, capacity=256,
                                 batch_rows=32),
            )
        out = jax.block_until_ready(f(fb0.color, fb0.depth))
        sane(out)

    # 2. fused kernel, soup config (gouraud/nearest, tile 16x128 cap 512)
    def fused_soup():
        soup = primitives.random_triangle_soup(200_000, rng_seed=11, extent=1.6)
        mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))

        @jax.jit
        def f(color, depth):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0, 0, 0, 1], jnp.float32))
            return draw_meshes(
                fb, proj, [DrawSpec(soup, mdl, shading="gouraud")],
                sampling_mode="nearest", near_clip=False,
                raster_opts=dict(tile_h=16, capacity=512, small_span=8,
                                 use_ybounds=False, cols=2, batch_rows=16),
            )
        out = jax.block_until_ready(f(fb0.color, fb0.depth))
        sane(out)

    # 3. fused kernel, MIXED per-draw sampling (dedicated Mosaic path)
    def fused_mixed():
        cube = primitives.cube()
        m1 = jnp.asarray(m3.model_matrix((-1, 0, -4), m3.rotate_y(0.5)))

        @jax.jit
        def f(color, depth):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0, 0, 0, 1], jnp.float32))
            return draw_meshes(
                fb, proj,
                [DrawSpec(cube, m1, texture=tex, sampling="nearest"),
                 DrawSpec(sphere, models[0], texture=tex, shading="phong",
                          sampling="bilinear")],
                light=light, sampling_mode="bilinear",
                raster_opts=dict(tile_h=64, tile_w=128, capacity=256),
            )
        out = jax.block_until_ready(f(fb0.color, fb0.depth))
        sane(out)

    # 4. pallas visibility kernel + deferred shading (fallback path)
    def pallas_vis():
        @jax.jit
        def f(color, depth):
            fb = fblib.Framebuffer(color, depth)
            fb = fblib.clear(fb, jnp.asarray([0, 0, 0, 1], jnp.float32))
            return draw_mesh(fb, sphere, models[0], proj, texture=tex,
                             light=light, shading="gouraud",
                             sampling_mode="bilinear", backend="pallas")
        out = jax.block_until_ready(f(fb0.color, fb0.depth))
        sane(out)

    # 5. ON-HARDWARE parity: fused vs pure-jnp ref at small res. Catches
    # Mosaic-only numeric divergence (e.g. a wrong slab/chunk cull) that the
    # interpret-mode suite is structurally blind to.
    def parity():
        from dtrenderer_tpu.utils.color import pack_srgb_u8

        ph, pw = 128, 256
        pproj = jnp.asarray(m3.perspective(np.pi / 3, pw / ph, 0.1, 100.0))
        soup = primitives.random_triangle_soup(3_000, rng_seed=5, extent=1.0)
        mdl = jnp.asarray(m3.model_matrix((0, 0, -2.2), m3.rotate_y(0.4)))
        pfb = fblib.create(ph, pw)
        clear = jnp.asarray([0.03, 0.03, 0.06, 1], jnp.float32)

        @jax.jit
        def f_fused(color, depth):
            fb = fblib.clear(fblib.Framebuffer(color, depth), clear)
            return draw_mesh(fb, soup, mdl, pproj, shading="gouraud",
                             backend="fused", near_clip=False,
                             raster_opts=dict(capacity=2048))

        @jax.jit
        def f_ref(color, depth):
            fb = fblib.clear(fblib.Framebuffer(color, depth), clear)
            return draw_mesh(fb, soup, mdl, pproj, shading="gouraud",
                             backend="ref", near_clip=False)

        a = jax.block_until_ready(f_fused(pfb.color, pfb.depth))
        b = jax.block_until_ready(f_ref(pfb.color, pfb.depth))
        ua = np.asarray(pack_srgb_u8(a.color)).astype(np.int32)
        ub = np.asarray(pack_srgb_u8(b.color)).astype(np.int32)
        bad = (np.abs(ua - ub) > 1).sum()
        assert bad == 0, f"{bad} u8 channels diverge >1 between fused and ref"
        za, zb = np.asarray(a.depth), np.asarray(b.depth)
        assert np.array_equal(np.isfinite(za), np.isfinite(zb)), "coverage diff"

    # 6. flat-bins kernel (per-tile HBM DMA of the sorted-prefix table +
    # shared broad block): ON-HARDWARE parity vs the dense setup path —
    # interpret mode cannot validate the DMA/alignment rules Mosaic enforces.
    def flat_parity():
        ph, pw = 128, 256
        pproj = jnp.asarray(m3.perspective(np.pi / 3, pw / ph, 0.1, 100.0))
        soup = primitives.random_triangle_soup(3_000, rng_seed=5, extent=1.0)
        mdl = jnp.asarray(m3.model_matrix((0, 0, -2.2), m3.rotate_y(0.4)))
        pfb = fblib.create(ph, pw)
        clear = jnp.asarray([0.03, 0.03, 0.06, 1], jnp.float32)

        def run(opts):
            @jax.jit
            def f(color, depth):
                fb = fblib.clear(fblib.Framebuffer(color, depth), clear)
                return draw_mesh(fb, soup, mdl, pproj, texture=tex,
                                 light=light, shading="gouraud",
                                 sampling_mode="bilinear", backend="fused",
                                 near_clip=False, raster_opts=opts)
            return jax.block_until_ready(f(pfb.color, pfb.depth))

        base = dict(tile_h=16, capacity=512, small_span=4, cols=2,
                    batch_rows=16)
        a = run(base)
        b = run(dict(base, flat_bins=True, pair_budget=8_000))
        assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth)), (
            "flat-bins depth diverges from dense on hardware")
        assert np.array_equal(np.asarray(a.color), np.asarray(b.color)), (
            "flat-bins color diverges from dense on hardware")

    # 7. slab-window flat bins (per-8-row-slab DMA windows, the flat path's
    # slab culling): ON-HARDWARE parity vs dense — exercises the 5-D window
    # scratch, per-slab DMA issue/wait, and multi-source phase-2 gathers.
    def flat_slab_parity():
        ph, pw = 128, 256
        pproj = jnp.asarray(m3.perspective(np.pi / 3, pw / ph, 0.1, 100.0))
        soup = primitives.random_triangle_soup(3_000, rng_seed=5, extent=1.0)
        mdl = jnp.asarray(m3.model_matrix((0, 0, -2.2), m3.rotate_y(0.4)))
        pfb = fblib.create(ph, pw)
        clear = jnp.asarray([0.03, 0.03, 0.06, 1], jnp.float32)

        def run(opts):
            @jax.jit
            def f(color, depth):
                fb = fblib.clear(fblib.Framebuffer(color, depth), clear)
                return draw_mesh(fb, soup, mdl, pproj, texture=tex,
                                 light=light, shading="gouraud",
                                 sampling_mode="bilinear", backend="fused",
                                 near_clip=False, raster_opts=opts)
            return jax.block_until_ready(f(pfb.color, pfb.depth))

        a = run(dict(tile_h=32, capacity=1024, small_span=16, cols=2,
                     batch_rows=32))
        b = run(dict(tile_h=32, capacity=512, small_span=16, cols=2,
                     batch_rows=32, flat_bins=True, flat_slabs=True,
                     pair_budget=12_000, chunk=16))
        assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth)), (
            "flat slab-window depth diverges from dense on hardware")
        assert np.array_equal(np.asarray(a.color), np.asarray(b.color)), (
            "flat slab-window color diverges from dense on hardware")

    # 8. ordered (translucency) tile kernel: ON-HARDWARE parity vs the scan
    # engine — sequential per-tile blend, single-row static slices, ordered
    # binning windows.
    def ordered_parity():
        from dtrenderer_tpu.ops.pipeline import draw_mesh_ordered
        from dtrenderer_tpu.utils.color import pack_srgb_u8

        ph, pw = 128, 256
        pproj = jnp.asarray(m3.perspective(np.pi / 3, pw / ph, 0.1, 100.0))
        soup = primitives.random_triangle_soup(1_500, rng_seed=5, extent=1.0)
        mdl = jnp.asarray(m3.model_matrix((0, 0, -2.2), m3.rotate_y(0.4)))
        pfb = fblib.create(ph, pw)
        clear = jnp.asarray([0.03, 0.03, 0.06, 1], jnp.float32)

        def run(engine):
            @jax.jit
            def f(color, depth):
                fb = fblib.clear(fblib.Framebuffer(color, depth), clear)
                return draw_mesh_ordered(
                    fb, soup, mdl, pproj, texture=tex, light=light,
                    color=(0.8, 0.5, 0.4, 0.55), shading="gouraud",
                    sampling_mode="bilinear", near_clip=False, engine=engine,
                    raster_opts=(dict(capacity=1024) if engine == "tile"
                                 else None))
            return jax.block_until_ready(f(pfb.color, pfb.depth))

        a, b = run("scan"), run("tile")
        ua = np.asarray(pack_srgb_u8(a.color)).astype(np.int32)
        ub = np.asarray(pack_srgb_u8(b.color)).astype(np.int32)
        bad = (np.abs(ua - ub) > 0).sum()
        assert bad == 0, f"{bad} u8 channels diverge between ordered engines"
        assert np.array_equal(np.isfinite(np.asarray(a.depth)),
                              np.isfinite(np.asarray(b.depth)))

    check("fused/bench-config", fused_bench)
    check("fused/soup-config", fused_soup)
    check("fused/mixed-sampling", fused_mixed)
    check("pallas-visibility", pallas_vis)
    check("fused-vs-ref-parity(hw)", parity)
    check("fused/flat-bins-parity(hw)", flat_parity)
    check("fused/flat-slab-parity(hw)", flat_slab_parity)
    check("ordered-tile-vs-scan(hw)", ordered_parity)

    # 9. ordered tile kernel with a BIG (over the fused budget, within the
    # 8 MB LUT ceiling) texture: the round-5 auto-route lift keeps such
    # draws on the tile engine — must compile and match the scan on chip.
    def ordered_big_lut():
        from dtrenderer_tpu.ops.pipeline import draw_mesh_ordered
        from dtrenderer_tpu.ops.render_fused import (TEX_BUDGET_TEXELS,
                                                     TEX_LUT_MAX_TEXELS)
        from dtrenderer_tpu.utils.color import pack_srgb_u8

        ph, pw = 64, 128
        pproj = jnp.asarray(m3.perspective(np.pi / 3, pw / ph, 0.1, 100.0))
        soup = primitives.random_triangle_soup(300, rng_seed=9, extent=1.0)
        mdl = jnp.asarray(m3.model_matrix((0, 0, -2.2), m3.rotate_y(0.4)))
        # 704^2 = 495616 texels: strictly over the fused path's 256K budget
        # (512^2 sits exactly AT it and routes small) and under the 512K
        # ordered-LUT ceiling, so auto must take the tile engine.
        big = primitives.checkerboard(704, 32)
        n_texels = big.shape[0] * big.shape[1]
        assert TEX_BUDGET_TEXELS < n_texels <= TEX_LUT_MAX_TEXELS
        pfb = fblib.create(ph, pw)
        clear = jnp.asarray([0.03, 0.03, 0.06, 1], jnp.float32)

        def run(engine):
            @jax.jit
            def f(color, depth):
                fb = fblib.clear(fblib.Framebuffer(color, depth), clear)
                return draw_mesh_ordered(
                    fb, soup, mdl, pproj, texture=big, light=light,
                    color=(0.8, 0.5, 0.4, 0.55), shading="gouraud",
                    sampling_mode="bilinear", near_clip=False, engine=engine)
            return jax.block_until_ready(f(pfb.color, pfb.depth))

        a, b = run("scan"), run("auto")  # auto must take the tile engine
        ua = np.asarray(pack_srgb_u8(a.color)).astype(np.int32)
        ub = np.asarray(pack_srgb_u8(b.color)).astype(np.int32)
        bad = (np.abs(ua - ub) > 0).sum()
        assert bad == 0, f"{bad} u8 channels diverge (big-LUT ordered)"

    check("ordered-big-lut(hw)", ordered_big_lut)

    from dtrenderer_tpu.utils import hwgate

    stamp = hwgate.write_stamp()
    print(f"tpu_smoke: ALL KERNELS COMPILE, RUN, AND MATCH ON HARDWARE "
          f"(stamp: {stamp})")


if __name__ == "__main__":
    main()
