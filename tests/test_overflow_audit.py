"""Bin-capacity audits for the shipped benchmark configurations.

Binning capacity overflow silently drops triangles (reported via Bins.overflow);
every scene/benchmark configuration this repo ships must audit to ZERO overflow
with its chosen raster_opts. This caught real silent drops in early soup tuning.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops.pipeline import DrawSpec, audit_scene
from dtrenderer_tpu.ops.shading import make_light
from dtrenderer_tpu.utils import math3d as m3


def test_bench_scene_capacity():
    h, w = 1080, 1920
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    sphere = primitives.uv_sphere(24, 32)
    models = [
        jnp.asarray(m3.model_matrix((x, y, -3.2), m3.rotate_y(0.3 * (x + y)), 1.05))
        for x in (-1.2, 0.0, 1.2) for y in (-0.7, 0.7)
    ]
    draws = [DrawSpec(sphere, mdl, shading="phong") for mdl in models]
    overflow, maxcount, cap = audit_scene(
        proj, draws, h, w, raster_opts=dict(tile_h=64, tile_w=128, capacity=256)
    )
    assert overflow == 0, f"bench scene overflows ({overflow})"
    assert maxcount <= cap * 0.8, f"headroom too small: {maxcount}/{cap}"


def test_soup_scene_capacity():
    # the config-5-style 200k soup at 1080p with its tuned raster_opts
    h, w = 1080, 1920
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    soup = primitives.random_triangle_soup(200_000, rng_seed=11, extent=1.6)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    overflow, maxcount, cap = audit_scene(
        proj, [DrawSpec(soup, mdl, shading="gouraud")], h, w, near_clip=False,
        raster_opts=dict(tile_h=16, capacity=512, small_span=8),
    )
    assert overflow == 0, f"soup overflows at cap {cap}: {overflow}"


def test_audit_detects_overflow():
    h, w = 256, 256
    proj = jnp.asarray(m3.perspective(np.pi / 3, 1.0, 0.1, 100.0))
    soup = primitives.random_triangle_soup(20_000, rng_seed=3, extent=0.5)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -1.2)))
    overflow, maxcount, cap = audit_scene(
        proj, [DrawSpec(soup, mdl)], h, w, near_clip=False,
        raster_opts=dict(tile_h=32, capacity=128, small_span=8),
    )
    assert overflow > 0, "dense scene at tiny capacity must report overflow"


def test_audit_bands_flags_skewed_scene_before_render():
    """A band-SKEWED scene (all triangles in one band) must be caught by the
    host-side audit_bands pre-flight — not discovered via the render-time
    overflow counter after the banded image already diverged. An evenly
    spread scene passes the same audit."""
    from dtrenderer_tpu.ops.pipeline import audit_bands

    h, w = 512, 512
    proj = jnp.asarray(m3.perspective(np.pi / 3, 1.0, 0.1, 100.0))

    # skewed: a small soup squashed into the top ~1/8 of the frame
    soup = primitives.random_triangle_soup(4_000, rng_seed=5, extent=0.4)
    mdl_skew = jnp.asarray(
        m3.model_matrix((0.0, 1.0, -2.0), scale_v=(1.0, 0.1, 1.0)))
    rep = audit_bands(proj, [DrawSpec(soup, mdl_skew)], h, w, n_bands=8,
                      near_clip=False,
                      raster_opts=dict(tile_h=32, capacity=512, small_span=8))
    assert rep["shard_overflow"] > 0 and not rep["ok"], (
        f"skewed scene must be flagged host-side: {rep}")
    # the flagged band really is the hot one
    assert max(rep["band_tris"]) > rep["shard_budget"]

    # spread: the same soup at full extent audits clean
    mdl_even = jnp.asarray(m3.model_matrix((0.0, 0.0, -1.6)))
    rep2 = audit_bands(proj, [DrawSpec(soup, mdl_even)], h, w, n_bands=8,
                       near_clip=False,
                       raster_opts=dict(tile_h=32, capacity=512, small_span=8,
                                        pair_budget=3 * 4_000))
    assert rep2["ok"], f"even scene should audit clean: {rep2}"
    assert rep2["pair_budget"] is not None and rep2["pair_overflow"] == 0

    # and an explicit (raised) shard_budget clears the skewed audit — the
    # knob the report tells the user to turn
    rep3 = audit_bands(proj, [DrawSpec(soup, mdl_skew)], h, w, n_bands=8,
                       near_clip=False,
                       raster_opts=dict(tile_h=32, capacity=512, small_span=8,
                                        shard_budget=2 * 4_000))
    assert rep3["shard_overflow"] == 0


def test_overflow_flows_out_of_jitted_production_path():
    """Overflow must surface from the PUBLIC API (draw_mesh / draw_meshes with
    return_counters) as a device scalar inside jit — not only via the host-side
    opt-in audit — so production frames can report drops instead of silently
    losing geometry."""
    import jax

    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import draw_mesh, draw_meshes

    h, w = 256, 256
    proj = jnp.asarray(m3.perspective(np.pi / 3, 1.0, 0.1, 100.0))
    soup = primitives.random_triangle_soup(20_000, rng_seed=3, extent=0.5)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -1.2)))
    tiny = dict(tile_h=32, capacity=128, small_span=8)

    @jax.jit
    def frame(color, depth):
        fb = fblib.Framebuffer(color=color, depth=depth)
        out, counters = draw_mesh(
            fb, soup, mdl, proj, backend="fused", near_clip=False,
            raster_opts=tiny, return_counters=True,
        )
        return out.color, counters

    fb0 = fblib.create(h, w)
    _, counters = frame(fb0.color, fb0.depth)
    assert int(counters.bin_overflow) > 0, "over-capacity draw must report drops"

    # batched path reports too, and a sane capacity reports zero
    @jax.jit
    def frame2(color, depth):
        fb = fblib.Framebuffer(color=color, depth=depth)
        out, counters = draw_meshes(
            fb, proj, [DrawSpec(soup, mdl)], near_clip=False,
            raster_opts=tiny, return_counters=True,
        )
        return out.color, counters

    _, counters2 = frame2(fb0.color, fb0.depth)
    assert int(counters2.bin_overflow) > 0

    @jax.jit
    def frame3(color, depth):
        fb = fblib.Framebuffer(color=color, depth=depth)
        out, counters = draw_mesh(
            fb, soup, mdl, proj, backend="fused", near_clip=False,
            raster_opts=dict(tile_h=32, capacity=2048, small_span=8),
            return_counters=True,
        )
        return out.color, counters

    _, counters3 = frame3(fb0.color, fb0.depth)
    assert int(counters3.bin_overflow) == 0


@pytest.mark.parametrize("mode", ["legacy_dense", "legacy_flat", "shared"])
def test_audit_bands_agrees_with_render_time_overflow(mode):
    """audit_bands runs THE REAL binning with THE SAME per-band opts the
    banded render derives (render_fused.prepare_draw_bins +
    pipeline._legacy_band_opts / the shared bin_triangles_flat(row_bands=)),
    so audit verdict and render-time overflow must agree EXACTLY — for a
    clean budget and for a deliberately starved one, in every banded mode.
    This test breaks the moment the audit and the render path desynchronize
    (VERDICT r4 weak #4)."""
    import functools

    import jax

    from dtrenderer_tpu.models import scenes
    from dtrenderer_tpu.ops import fb as fblib

    h, w, n_tris, n_bands = 128, 256, 2000, 8
    base = dict(tile_h=8, capacity=512, small_span=8, chunk=8, cols=1)
    if mode == "legacy_dense":
        # flat_bins=False overrides make_config5's production default so the
        # DENSE per-band path runs (otherwise the shared path would ignore
        # shard_budget). ~1000 tris survive backface culling -> ~125+/band:
        # budget 32 starves the compaction.
        base = dict(base, flat_bins=False)
        cases = [dict(base), dict(base, shard_budget=32)]
    elif mode == "legacy_flat":
        base = dict(base, flat_bins=True, band_shared=False)
        cases = [dict(base, pair_budget=8192), dict(base, pair_budget=1024)]
    else:
        base = dict(base, flat_bins=True)
        cases = [dict(base, pair_budget=8192),
                 dict(base, pair_budget=1024, capacity=128)]

    for extra in cases:
        spec = scenes.make_config5(width=w, height=h, n_tris=n_tris,
                                   extra_opts=dict(extra, row_bands=n_bands))
        rep = spec.bands_audit(n_bands)
        fb0 = fblib.create(h, w)
        _, _, ov = jax.jit(functools.partial(
            spec.frame, return_counters=True))(fb0.color, fb0.depth,
                                               jnp.float32(0.5))
        ov = int(np.asarray(ov))
        assert rep["ok"] == (ov == 0), (
            f"audit ok={rep['ok']} but render overflow={ov} ({mode}, "
            f"{extra}): audit and render have desynchronized — {rep}")
        # the starved case must actually exercise the disagreement risk
    assert not rep["ok"], f"the starved case should overflow ({mode})"
