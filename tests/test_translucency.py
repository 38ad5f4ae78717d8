"""Reference-order translucency within a draw (VERDICT r1 missing #3 / next #7).

The reference's sequential per-pixel loop stacks overlapping translucent triangles
in submission order with depth writes (SURVEY.md CS-2). pipeline.draw_mesh_ordered
reproduces those semantics on device; MeshOracle.render_sequential is its scalar
oracle. For opaque geometry the ordered path must agree with the order-free paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dtrenderer_tpu.models.mesh import make_mesh
from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.pipeline import (
    DrawSpec, draw_mesh, draw_mesh_ordered, draw_meshes,
)
from dtrenderer_tpu.ops.shading import make_light
from dtrenderer_tpu.utils import math3d as m3
from dtrenderer_tpu.utils.color import pack_srgb_u8

import oracle
from oracle_pipeline import MeshOracle

H, W = 60, 80
CLEAR = (0.05, 0.05, 0.1, 1.0)


def _two_overlapping_tris():
    """ONE mesh with two overlapping translucent triangles at different depths:
    the far one submitted FIRST, so the near one must blend over it and both
    must contribute where they overlap (prefix-minima stacking)."""
    verts = np.array(
        [
            # far triangle (z = -0.2 relative), submitted first
            [-0.7, -0.6, -0.2], [0.7, -0.5, -0.2], [0.0, 0.7, -0.2],
            # near triangle, overlapping the middle
            [-0.5, -0.3, 0.2], [0.6, -0.2, 0.2], [0.1, 0.5, 0.2],
        ],
        np.float32,
    )
    normals = np.tile([[0, 0, 1]], (6, 1)).astype(np.float32)
    return make_mesh(verts, None, normals,
                     np.array([[0, 1, 2], [3, 4, 5]], np.int32))


def _run(mesh, color, shading="none", sampl="nearest", texture=None):
    model = np.asarray(m3.translate([0, 0, -2.0]), np.float32)
    proj = np.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0), np.float32)
    mvp = (proj @ model).astype(np.float32)
    light = make_light((0.3, 0.5, 1.0), 0.15)

    fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb = draw_mesh_ordered(
        fb, mesh, jnp.asarray(model), jnp.asarray(proj), mvp=jnp.asarray(mvp),
        texture=texture, light=light, color=color, shading=shading,
        sampling_mode=sampl,
    )

    mo = MeshOracle(
        np.asarray(mesh.verts), np.asarray(mesh.uv), np.asarray(mesh.normals),
        np.asarray(mesh.faces), model, mvp, model,
        np.asarray(texture) if texture is not None else np.ones((1, 1, 4), np.float32),
        (0.3, 0.5, 1.0), 0.15, color, shading, sampl, True, H, W,
    )
    ref_c0 = np.broadcast_to(np.asarray(CLEAR, np.float32), (H, W, 4)).copy()
    ref_z0 = np.full((H, W), np.inf, np.float32)
    ref_c, ref_z = mo.render_sequential(ref_c0, ref_z0)
    return fb, ref_c, ref_z


def _assert_u8(dev_color, ref_color, max_bad=0):
    dev_u8 = np.asarray(pack_srgb_u8(jnp.asarray(dev_color))).astype(np.int32)
    ref_u8 = oracle.pack_srgb_u8(ref_color).astype(np.int32)
    diff = np.abs(dev_u8 - ref_u8)
    bad = (diff > 1).sum()
    assert bad <= max_bad, f"{bad} channels differ by >1 (max {diff.max()})"


def test_overlapping_translucent_tris_one_mesh_match_oracle():
    mesh = _two_overlapping_tris()
    fb, ref_c, ref_z = _run(mesh, (0.9, 0.4, 0.2, 0.45))
    _assert_u8(fb.color, ref_c)
    dev_z = np.asarray(fb.depth)
    finite = np.isfinite(ref_z)
    assert np.array_equal(np.isfinite(dev_z), finite)
    np.testing.assert_allclose(dev_z[finite], ref_z[finite], rtol=1e-4)
    # sanity: the overlap region actually shows BOTH layers (deferred single-
    # winner shading could not produce this color)
    dev_u8 = np.asarray(pack_srgb_u8(fb.color))
    fb1 = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    model = np.asarray(m3.translate([0, 0, -2.0]), np.float32)
    proj = np.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0), np.float32)
    fb1 = draw_mesh(fb1, mesh, jnp.asarray(model), jnp.asarray(proj),
                    color=(0.9, 0.4, 0.2, 0.45), shading="none", backend="ref")
    single_u8 = np.asarray(pack_srgb_u8(fb1.color))
    assert not np.array_equal(dev_u8, single_u8)


def test_ordered_translucent_textured_gouraud():
    mesh = _two_overlapping_tris()
    tex = primitives.checkerboard(8, 2)
    fb, ref_c, _ = _run(mesh, (0.8, 0.8, 0.9, 0.6), shading="gouraud",
                        sampl="bilinear", texture=tex)
    _assert_u8(fb.color, ref_c)


def test_ordered_translucent_phong_vs_oracle_and_scan():
    """Per-pixel Phong through the ORDERED path: tile engine vs the scalar
    sequential-blend oracle (the default engine is tile — _run covers it) AND
    tile vs scan cross-engine at packed u8 (the kernel's with_phong branch)."""
    sphere = primitives.uv_sphere(10, 12)
    tex = primitives.checkerboard(8, 2)
    fb, ref_c, _ = _run(sphere, (0.9, 0.7, 0.5, 0.55), shading="phong",
                        sampl="bilinear", texture=tex)
    _assert_u8(fb.color, ref_c)

    model = jnp.asarray(m3.translate([0, 0, -2.0]))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    light = make_light((0.3, 0.5, 1.0), 0.15)

    def run(engine):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        return draw_mesh_ordered(fb, sphere, model, proj, texture=tex,
                                 light=light, color=(0.9, 0.7, 0.5, 0.55),
                                 shading="phong", sampling_mode="bilinear",
                                 engine=engine)

    a, b = run("tile"), run("scan")
    assert np.array_equal(np.asarray(pack_srgb_u8(a.color)),
                          np.asarray(pack_srgb_u8(b.color)))

    # WHITE phong: plan_layout drops the rgba channels entirely
    # (corner_rgba_is_q) — the tile kernel's has_rgba=False reconstruction
    # must still match the scan engine at packed u8.
    def run_white(engine):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        return draw_mesh_ordered(fb, sphere, model, proj, texture=tex,
                                 light=light, shading="phong",
                                 sampling_mode="bilinear", engine=engine)

    aw, bw = run_white("tile"), run_white("scan")
    assert np.array_equal(np.asarray(pack_srgb_u8(aw.color)),
                          np.asarray(pack_srgb_u8(bw.color)))


def test_ordered_equals_unordered_for_opaque():
    """For opaque geometry the ordered path is bit-identical to the deferred
    ref path (the order-free split's exactness claim, FORMULAS.md)."""
    cube = primitives.cube()
    model = jnp.asarray(m3.model_matrix((0, 0, -4.0), m3.rotate_y(0.7)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    tex = primitives.checkerboard(8, 2)

    fb_a = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_a = draw_mesh(fb_a, cube, model, proj, texture=tex, light=light,
                     shading="gouraud", sampling_mode="bilinear", backend="ref")
    fb_b = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_b = draw_mesh_ordered(fb_b, cube, model, proj, texture=tex, light=light,
                             shading="gouraud", sampling_mode="bilinear")
    # packed-u8 equality (raw f32 may differ by XLA FMA contraction between the
    # two program shapes — the repo's parity convention, CLAUDE.md)
    assert np.array_equal(
        np.asarray(pack_srgb_u8(fb_a.color)), np.asarray(pack_srgb_u8(fb_b.color))
    )
    assert np.array_equal(np.asarray(fb_a.depth), np.asarray(fb_b.depth))


def test_draw_meshes_routes_translucent_specs():
    """draw_meshes renders translucent DrawSpecs in EXACT submission order
    (reference forward-loop semantics): a translucent draw submitted BEFORE an
    opaque one blends first and z-masks later opaque fragments behind it —
    equal to the manual sequential composition in the same order."""
    cube = primitives.cube()
    tmesh = _two_overlapping_tris()
    m_cube = jnp.asarray(m3.model_matrix((0.2, 0, -5.0), m3.rotate_y(0.4)))
    m_t = jnp.asarray(m3.translate([0, 0, -2.0]))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    tcolor = (0.9, 0.4, 0.2, 0.45)

    fb_a = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_a = draw_meshes(
        fb_a, proj,
        [
            DrawSpec(tmesh, m_t, color=tcolor, shading="none"),  # translucent
            DrawSpec(cube, m_cube, shading="gouraud"),           # opaque
        ],
        light=light, sampling_mode="nearest",
    )

    fb_b = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_b = draw_mesh_ordered(fb_b, tmesh, m_t, proj, light=light, color=tcolor,
                             shading="none", sampling_mode="nearest")
    fb_b = draw_meshes(fb_b, proj, [DrawSpec(cube, m_cube, shading="gouraud")],
                       light=light, sampling_mode="nearest")
    assert np.array_equal(np.asarray(fb_a.color), np.asarray(fb_b.color))
    assert np.array_equal(np.asarray(fb_a.depth), np.asarray(fb_b.depth))


def test_draw_meshes_interleaved_opaque_translucent_opaque():
    """Opaque-translucent-opaque interleaving equals the sequential
    draw_mesh / draw_mesh_ordered composition byte-exactly — the batched path
    partitions into maximal opaque runs rendered in submission order (the
    reference blends strictly in submission order; VERDICT round-2 gap)."""
    cube = primitives.cube()
    sphere = primitives.uv_sphere(6, 8)
    tmesh = _two_overlapping_tris()
    m_cube = jnp.asarray(m3.model_matrix((0.2, 0, -5.0), m3.rotate_y(0.4)))
    m_sph = jnp.asarray(m3.model_matrix((-0.4, 0.1, -3.0), m3.rotate_y(1.1)))
    m_t = jnp.asarray(m3.translate([0, 0, -2.0]))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    tcolor = (0.9, 0.4, 0.2, 0.45)

    fb_a = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_a = draw_meshes(
        fb_a, proj,
        [
            DrawSpec(cube, m_cube, shading="gouraud"),            # opaque
            DrawSpec(tmesh, m_t, color=tcolor, shading="none"),   # translucent
            DrawSpec(sphere, m_sph, color=(0.5, 0.8, 0.6, 1.0),
                     shading="gouraud"),                          # opaque
        ],
        light=light, sampling_mode="nearest",
    )

    fb_b = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_b = draw_mesh(fb_b, cube, m_cube, proj, light=light, shading="gouraud",
                     sampling_mode="nearest", backend="fused")
    fb_b = draw_mesh_ordered(fb_b, tmesh, m_t, proj, light=light, color=tcolor,
                             shading="none", sampling_mode="nearest")
    fb_b = draw_mesh(fb_b, sphere, m_sph, proj, light=light,
                     color=(0.5, 0.8, 0.6, 1.0), shading="gouraud",
                     sampling_mode="nearest", backend="fused")
    assert np.array_equal(np.asarray(fb_a.color), np.asarray(fb_b.color))
    assert np.array_equal(np.asarray(fb_a.depth), np.asarray(fb_b.depth))


def test_ordered_auto_engine_texture_routing():
    """engine="auto": textures beyond the full VMEM LUT ceiling
    (TEX_LUT_MAX_TEXELS) fall back to the exact scan engine; textures between
    the FUSED path's conservative budget and the ceiling stay on the tile
    engine (the ordered kernel's VMEM footprint is small, round 5). Raw f32
    output of the two engines differs by XLA FMA contraction, so BITWISE f32
    equality with a forced engine proves which route auto took."""
    mesh = _two_overlapping_tris()
    mdl = jnp.asarray(m3.model_matrix((0, 0, -1.5)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    from dtrenderer_tpu.ops.render_fused import (
        TEX_BUDGET_TEXELS, TEX_LUT_MAX_TEXELS,
    )

    def make_tex(side):
        return jnp.broadcast_to(
            jnp.linspace(0.1, 0.9, side, dtype=jnp.float32)[None, :, None],
            (side, side, 4))

    def run(engine, tex):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        return draw_mesh_ordered(fb, mesh, mdl, proj, texture=tex,
                                 color=(0.9, 0.5, 0.4, 0.5), shading="none",
                                 engine=engine)

    # over the LUT ceiling -> scan
    huge = make_tex(int(np.sqrt(TEX_LUT_MAX_TEXELS)) + 8)
    auto, scan = run("auto", huge), run("scan", huge)
    assert np.array_equal(np.asarray(auto.color), np.asarray(scan.color))
    assert np.array_equal(np.asarray(auto.depth), np.asarray(scan.depth))

    # between the fused budget and the ceiling -> tile (round-5 lift)
    mid = make_tex(int(np.sqrt(TEX_BUDGET_TEXELS)) + 8)
    auto_m, tile_m = run("auto", mid), run("tile", mid)
    assert np.array_equal(np.asarray(auto_m.color), np.asarray(tile_m.color))
    assert np.array_equal(np.asarray(auto_m.depth), np.asarray(tile_m.depth))
    # and the tile engine's blend is still exact vs the scan at packed u8
    from dtrenderer_tpu.utils.color import pack_srgb_u8

    scan_m = run("scan", mid)
    assert np.array_equal(np.asarray(pack_srgb_u8(tile_m.color)),
                          np.asarray(pack_srgb_u8(scan_m.color)))


def test_audit_ordered_preflight():
    """pipeline.audit_ordered must flag an over-tight tile-engine capacity
    HOST-SIDE (before a render silently corrupts the blend) and must agree
    with the render-time counters at both tight and sane settings."""
    from dtrenderer_tpu.ops.pipeline import audit_ordered

    soup = primitives.random_triangle_soup(2_000, rng_seed=9, extent=0.5)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -1.2)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))

    for opts in (dict(tile_h=16, capacity=128, small_span=8),
                 dict(tile_h=16, capacity=2048, small_span=8)):
        ov, max_count, cap = audit_ordered(
            proj, soup, mdl, H, W, near_clip=False, raster_opts=opts)
        assert cap == opts["capacity"]
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        _, c = draw_mesh_ordered(fb, soup, mdl, proj,
                                 color=(0.8, 0.4, 0.3, 0.5), shading="none",
                                 near_clip=False, engine="tile",
                                 raster_opts=opts, return_counters=True)
        assert ov == int(c.bin_overflow), (
            "audit disagrees with render-time drop counter")
    assert ov == 0 and max_count <= 2048  # the sane config passes clean


def test_draw_meshes_ordered_opts_passthrough():
    """draw_meshes(ordered_opts=, ordered_engine=) must reach the translucent
    singles: a deliberately tight tile-engine capacity shows up in the merged
    counters, and the scan engine (no binning) reports zero."""
    soup = primitives.random_triangle_soup(2_000, rng_seed=9, extent=0.5)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -1.2)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    draws = [DrawSpec(soup, mdl, color=(0.8, 0.4, 0.3, 0.5), shading="none")]

    def run(**kw):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        return draw_meshes(fb, proj, draws, near_clip=False,
                           return_counters=True, **kw)

    _, tight = run(ordered_opts=dict(tile_h=16, capacity=128, small_span=8))
    assert int(tight.bin_overflow) > 0
    out_t, sane = run(ordered_opts=dict(tile_h=16, capacity=2048,
                                        small_span=8))
    assert int(sane.bin_overflow) == 0
    out_s, scan = run(ordered_engine="scan")
    assert int(scan.bin_overflow) == 0
    assert np.array_equal(np.asarray(pack_srgb_u8(out_t.color)),
                          np.asarray(pack_srgb_u8(out_s.color)))


def test_ordered_tile_engine_counts_drops():
    """The tile engine's binning drops (capacity/budget) CHANGE the blend for
    every later triangle — they must surface as counters, and a sane capacity
    must report zero."""
    soup = primitives.random_triangle_soup(2_000, rng_seed=9, extent=0.5)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -1.2)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))

    def run(opts):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        return draw_mesh_ordered(fb, soup, mdl, proj,
                                 color=(0.8, 0.4, 0.3, 0.5), shading="none",
                                 near_clip=False, engine="tile",
                                 raster_opts=opts, return_counters=True)

    _, tight = run(dict(tile_h=16, capacity=128, small_span=8))
    assert int(tight.bin_overflow) > 0, "over-capacity ordered draw must count"
    out, sane = run(dict(tile_h=16, capacity=2048, small_span=8))
    assert int(sane.bin_overflow) == 0

    # zero-overflow tile engine == scan engine (packed u8; coverage exact)
    fb_s = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
    fb_s = draw_mesh_ordered(fb_s, soup, mdl, proj,
                             color=(0.8, 0.4, 0.3, 0.5), shading="none",
                             near_clip=False, engine="scan")
    assert np.array_equal(np.asarray(pack_srgb_u8(out.color)),
                          np.asarray(pack_srgb_u8(fb_s.color)))
    assert np.array_equal(np.isfinite(np.asarray(out.depth)),
                          np.isfinite(np.asarray(fb_s.depth)))


@pytest.mark.parametrize("window", [(8, 32), (16, 128), (64, 128), None])
def test_ordered_window_sizes_bit_equal(window):
    """draw_mesh_ordered must be bit-equal at ANY window size (the bbox
    window changes evaluation SHAPE, never values), including windows far
    smaller than some triangles (full-frame fallback) and None (always
    full-frame)."""
    soup = primitives.random_triangle_soup(60, rng_seed=33, extent=1.3)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.5), m3.rotate_y(0.4)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)

    def run(win):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray(CLEAR, jnp.float32))
        return draw_mesh_ordered(fb, soup, mdl, proj, light=light,
                                 color=(0.8, 0.4, 0.3, 0.5), shading="none",
                                 window=win, engine="scan")

    ref = run((H, W))  # window == frame: the pre-window code path
    got = run(window)
    assert np.array_equal(np.asarray(ref.color), np.asarray(got.color))
    assert np.array_equal(np.asarray(ref.depth), np.asarray(got.depth))
