"""Fused draw kernel vs the reference pipeline: bit-exact image parity.

The fused kernel (ops/render_fused.py) is the production hot path — the whole
reference per-pixel loop in one Pallas kernel. It must produce byte-identical packed
images to the deferred jnp path (which itself matches the scalar oracle, closing the
chain back to FORMULAS.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.pipeline import draw_mesh
from dtrenderer_tpu.ops.shading import make_light
from dtrenderer_tpu.utils import math3d as m3
from dtrenderer_tpu.utils.color import pack_srgb_u8

H, W = 64, 128
LIGHT = make_light((0.4, 0.6, 1.0), 0.15)
MODEL = jnp.asarray(m3.model_matrix((0, 0, -4.0), m3.rotate_y(0.7) @ m3.rotate_x(0.3)))
PROJ = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))


def _run(mesh, backend, shading, sampl, tex, clear=(0.05, 0.02, 0.1, 1)):
    fb = fblib.clear(fblib.create(H, W), jnp.asarray(clear, jnp.float32))
    return draw_mesh(
        fb, mesh, MODEL, PROJ, texture=tex, light=LIGHT, shading=shading,
        sampling_mode=sampl, backend=backend,
        raster_opts=dict(capacity=128) if backend == "fused" else None,
    )


@pytest.mark.parametrize("shading,sampl", [
    ("flat", "nearest"),
    ("gouraud", "bilinear"),
    ("phong", "bilinear"),
    ("none", "nearest"),
])
def test_fused_matches_ref_cube(shading, sampl):
    tex = primitives.checkerboard(16, 4)
    a = _run(primitives.cube(), "ref", shading, sampl, tex)
    b = _run(primitives.cube(), "fused", shading, sampl, tex)
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_fused_mono_rgb_gray_matches_ref():
    """The mono_rgb payload layout (gray opaque color -> ONE mono channel
    instead of 4 rgba) must stay byte-exact vs the full-layout ref backend,
    textured and untextured, gouraud and flat."""
    tex = primitives.checkerboard(16, 4)
    gray = (0.6, 0.6, 0.6, 1.0)
    for shading, t in (("gouraud", tex), ("flat", None), ("gouraud", None)):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.05, 0.02, 0.1, 1], jnp.float32))
        a = draw_mesh(fb, primitives.cube(), MODEL, PROJ, texture=t,
                      color=gray, light=LIGHT, shading=shading,
                      backend="ref")
        b = draw_mesh(fb, primitives.cube(), MODEL, PROJ, texture=t,
                      color=gray, light=LIGHT, shading=shading,
                      backend="fused", raster_opts=dict(capacity=128))
        assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
        assert np.array_equal(np.asarray(pack_srgb_u8(a.color)),
                              np.asarray(pack_srgb_u8(b.color))), shading


def test_fused_matches_ref_sphere_no_texture():
    a = _run(primitives.uv_sphere(8, 12), "ref", "phong", "nearest", None)
    b = _run(primitives.uv_sphere(8, 12), "fused", "phong", "nearest", None)
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_fused_multi_draw_depth_merge():
    mesh = primitives.cube()
    tex = primitives.checkerboard(16, 4)
    models = [
        jnp.asarray(m3.model_matrix((-0.5, 0, -5.0), m3.rotate_y(0.4))),
        jnp.asarray(m3.model_matrix((0.6, 0.2, -6.0), m3.rotate_y(1.1))),
    ]

    def run(backend):
        fb = fblib.clear(fblib.create(H, W), jnp.asarray([0, 0, 0, 1], jnp.float32))
        for mdl in models:
            fb = draw_mesh(fb, mesh, mdl, PROJ, texture=tex, light=LIGHT,
                           shading="gouraud", backend=backend,
                           raster_opts=dict(capacity=128) if backend == "fused"
                           else None)
        return fb

    a, b = run("ref"), run("fused")
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_fused_alpha_blend_over_background():
    mesh = primitives.cube()
    a = _run(mesh, "ref", "none", "nearest", None,  # translucent color
             clear=(0.2, 0.0, 0.0, 1.0))
    # give the draw a translucent color via the color argument
    fb_r = fblib.clear(fblib.create(H, W), jnp.asarray([0.2, 0, 0, 1], jnp.float32))
    fb_f = fblib.clear(fblib.create(H, W), jnp.asarray([0.2, 0, 0, 1], jnp.float32))
    from dtrenderer_tpu.utils.color import rgba

    col = rgba(0.1, 0.9, 0.2, 0.5)
    a = draw_mesh(fb_r, mesh, MODEL, PROJ, color=col, shading="none", backend="ref")
    b = draw_mesh(fb_f, mesh, MODEL, PROJ, color=col, shading="none",
                  backend="fused", raster_opts=dict(capacity=128))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_payload_layout_planner():
    """plan_layout picks the minimal bit-exact channel set per scene class."""
    from dtrenderer_tpu.ops.render_fused import (
        FULL_LAYOUT, PAYLOAD_CHANNELS, plan_layout,
    )

    # untextured gouraud soup: q + rgba only
    lay = plan_layout([dict(textured=False, phong=False,
                            corner_rgba_is_q=False, meta=(0, 1, 1))],
                      mixed_sampling=False)
    assert (not lay.has_uv and not lay.has_texmeta and not lay.has_flags
            and lay.has_rgba and not lay.has_normals)
    assert lay.n_payload == 3 * 5

    # single shared texture, all-phong, white color: q + uv + normals,
    # texmeta folded into compile-time constants
    lay = plan_layout([dict(textured=True, phong=True,
                            corner_rgba_is_q=True, meta=(0, 64, 64))] * 3,
                      mixed_sampling=False)
    assert lay.tex_const == (0, 64, 64) and not lay.has_texmeta
    assert not lay.has_rgba and lay.has_normals and lay.has_uv
    assert lay.n_payload == 3 * 6

    # mixed textures + mixed shading: per-tri texmeta + flags
    lay = plan_layout(
        [dict(textured=True, phong=True, corner_rgba_is_q=False,
              meta=(0, 16, 16)),
         dict(textured=True, phong=False, corner_rgba_is_q=False,
              meta=(256, 8, 8))],
        mixed_sampling=True)
    assert lay.has_texmeta and lay.has_flags and lay.tex_const is None
    assert lay == FULL_LAYOUT
    assert lay.n_payload == PAYLOAD_CHANNELS

    # mono rgb (round 5): GRAY opaque gouraud draws ship ONE mono channel
    # instead of 4 rgba — the config-5 textured white-gouraud case
    lay = plan_layout([dict(textured=True, phong=False,
                            corner_rgba_is_q=False, corner_rgba_mono=True,
                            meta=(0, 64, 64))], mixed_sampling=False)
    assert lay.has_rgba and lay.mono_rgb and lay.rgba_channels == 1
    assert lay.n_payload == 3 * (1 + 2 + 1)  # q, uv, mono per corner
    # a corner_rgba_is_q draw mixes into a mono scene (mono == 1 exactly);
    # a non-gray draw forces the full rgba block back
    lay = plan_layout([dict(textured=False, phong=False,
                            corner_rgba_is_q=False, corner_rgba_mono=True,
                            meta=(0, 1, 1)),
                       dict(textured=False, phong=True,
                            corner_rgba_is_q=True, meta=(0, 1, 1))],
                      mixed_sampling=False)
    assert lay.mono_rgb and lay.rgba_channels == 1
    lay = plan_layout([dict(textured=False, phong=False,
                            corner_rgba_is_q=False, corner_rgba_mono=False,
                            meta=(0, 1, 1))], mixed_sampling=False)
    assert lay.has_rgba and not lay.mono_rgb and lay.rgba_channels == 4


def test_fused_single_slab_tile_matches_ref():
    """tile_h=8 (one slab) drops the ybounds channels + slab culling entirely
    and ties-breaks by bin slot; the image must still match ref exactly."""
    tex = primitives.checkerboard(16, 4)
    a = _run(primitives.uv_sphere(10, 14), "ref", "gouraud", "bilinear", tex)
    fb = fblib.clear(fblib.create(H, W), jnp.asarray([0.05, 0.02, 0.1, 1],
                                                     jnp.float32))
    b = draw_mesh(fb, primitives.uv_sphere(10, 14), MODEL, PROJ, texture=tex,
                  light=LIGHT, shading="gouraud", sampling_mode="bilinear",
                  backend="fused",
                  raster_opts=dict(tile_h=8, capacity=128, small_span=8))
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_fused_multislab_no_ybounds_matches_ref():
    """use_ybounds=False on a MULTI-slab tile (tile_h=32: 4 slabs, no slab
    culling, tri-sorted bins with slot tie-break) must still match ref exactly
    — this is the bench soup/fill configuration."""
    tex = primitives.checkerboard(16, 4)
    a = _run(primitives.uv_sphere(10, 14), "ref", "phong", "bilinear", tex)
    fb = fblib.clear(fblib.create(H, W), jnp.asarray([0.05, 0.02, 0.1, 1],
                                                     jnp.float32))
    b = draw_mesh(fb, primitives.uv_sphere(10, 14), MODEL, PROJ, texture=tex,
                  light=LIGHT, shading="phong", sampling_mode="bilinear",
                  backend="fused",
                  raster_opts=dict(tile_h=32, capacity=128, small_span=16,
                                   use_ybounds=False))
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_fused_wide_shading_batch_matches_ref():
    """batch_rows=16 (2048-px shading batches, [16,128] vregs) must match ref
    exactly — pure batching change, same formulas."""
    tex = primitives.checkerboard(16, 4)
    a = _run(primitives.uv_sphere(10, 14), "ref", "phong", "bilinear", tex)
    fb = fblib.clear(fblib.create(H, W), jnp.asarray([0.05, 0.02, 0.1, 1],
                                                     jnp.float32))
    b = draw_mesh(fb, primitives.uv_sphere(10, 14), MODEL, PROJ, texture=tex,
                  light=LIGHT, shading="phong", sampling_mode="bilinear",
                  backend="fused",
                  raster_opts=dict(tile_h=32, capacity=128, small_span=16,
                                   batch_rows=16))
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_binning_slab_bounds_conservative():
    """Every slot whose triangle's y-range intersects an 8-row slab must fall
    inside that slab's [start, end) range (missing one would drop geometry;
    extras are harmless — the edge functions reject them)."""
    from dtrenderer_tpu.ops.binning import bin_triangles

    rng = np.random.default_rng(12)
    T, h, w = 400, 128, 256
    xs = rng.integers(0, w - 30, T).astype(np.int32)
    ys = rng.integers(0, h - 30, T).astype(np.int32)
    hs = rng.integers(1, 30, T).astype(np.int32)  # mixed tri heights
    bbox = np.stack([xs, ys, xs + rng.integers(1, 20, T), ys + hs],
                    axis=1).astype(np.int32)
    # a few BROAD triangles (span > small_span tiles) exercise the shared
    # broad-suffix range entry
    bbox[:3] = [[0, 0, 250, 120], [10, 5, 255, 127], [0, 60, 255, 127]]
    coef = rng.normal(size=(T, 16)).astype(np.float32)
    valid = np.ones((T,), bool)
    tile_h, n_slabs = 32, 4

    bins = bin_triangles(jnp.asarray(coef), jnp.asarray(bbox),
                         jnp.asarray(valid), h, w, tile_h=tile_h, tile_w=128,
                         capacity=256, small_span=8, n_slabs=n_slabs)
    counts = np.asarray(bins.counts)
    ids = np.asarray(bins.setup)[..., 16].view(np.int32)
    sb = np.asarray(bins.slab_bounds)
    # n_slabs small-triangle ranges + 1 shared broad-suffix range
    assert sb.shape == (h // tile_h, w // 128, n_slabs + 1, 2)
    for ty in range(h // tile_h):
        for tx in range(w // 128):
            n = counts[ty, tx]
            bs, be = sb[ty, tx, n_slabs]  # broad suffix [cnt_small, count)
            assert 0 <= bs <= be <= n
            slots = ids[ty, tx][:n]
            # y-sorted bins: y0 non-decreasing over the SMALL prefix
            y0s = bbox[slots[:bs], 1]
            assert (np.diff(y0s) >= 0).all()
            for s in range(n_slabs):
                lo = ty * tile_h + s * 8
                hi = lo + 7
                st, en = sb[ty, tx, s]
                assert 0 <= st <= en <= n
                for k in range(n):
                    tri = slots[k]
                    if bbox[tri, 1] <= hi and bbox[tri, 3] >= lo:
                        # every intersecting slot is covered by the slab's
                        # small range OR the shared broad suffix
                        assert (st <= k < en) or (bs <= k < be), (ty, tx, s, k)


def test_binning_packed_key_matches_fallback():
    """The packed single-key sort and the 2-key fallback must produce
    identical bins (force the fallback by monkeypatching the threshold is
    intrusive — instead compare against a brute-force NumPy binning)."""
    from dtrenderer_tpu.ops.binning import bin_triangles

    rng = np.random.default_rng(7)
    T, h, w = 500, 64, 256
    xs = rng.integers(0, w - 6, T).astype(np.int32)
    ys = rng.integers(0, h - 6, T).astype(np.int32)
    bbox = np.stack([xs, ys, xs + rng.integers(1, 6, T),
                     ys + rng.integers(1, 6, T)], axis=1).astype(np.int32)
    coef = rng.normal(size=(T, 16)).astype(np.float32)
    valid = np.ones((T,), bool)

    bins = bin_triangles(jnp.asarray(coef), jnp.asarray(bbox),
                         jnp.asarray(valid), h, w, tile_h=8, tile_w=128,
                         capacity=128, small_span=8)
    counts = np.asarray(bins.counts)
    ids = np.asarray(bins.setup)[..., 16].view(np.int32)
    n_tx = w // 128
    for ty in range(h // 8):
        for tx in range(n_tx):
            want = sorted(
                t for t in range(T)
                if bbox[t, 0] // 128 <= tx <= bbox[t, 2] // 128
                and bbox[t, 1] // 8 <= ty <= bbox[t, 3] // 8
            )
            got = list(ids[ty, tx][:counts[ty, tx]])
            assert got == want, (ty, tx)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_matches_ref_fuzz(seed):
    """Randomized scene parity: random meshes/soups, shading, sampling,
    texture, tile shapes — fused must stay byte-exact vs ref everywhere the
    hand-written cases don't reach."""
    rng = np.random.default_rng(seed)
    shading = rng.choice(["flat", "gouraud", "phong", "none"])
    sampl = rng.choice(["nearest", "bilinear"])
    if rng.random() < 0.7:
        tex = primitives.checkerboard(int(rng.choice([8, 16, 32])), 4)
    else:
        tex = None
    if rng.random() < 0.5:
        mesh = primitives.uv_sphere(int(rng.integers(6, 12)),
                                    int(rng.integers(8, 16)))
    else:
        mesh = primitives.random_triangle_soup(
            int(rng.integers(50, 300)), rng_seed=int(rng.integers(1e6)),
            extent=1.2)
    mdl = jnp.asarray(m3.model_matrix(
        (float(rng.uniform(-0.5, 0.5)), float(rng.uniform(-0.5, 0.5)),
         float(rng.uniform(-6, -3))),
        m3.rotate_y(float(rng.uniform(0, 6))), float(rng.uniform(0.6, 1.4))))
    opts = dict(
        tile_h=int(rng.choice([8, 16, 32])), capacity=256, small_span=8,
        use_ybounds=bool(rng.random() < 0.5),
        batch_rows=int(rng.choice([8, 16])),
    )
    if rng.random() < 0.4:
        # flat-bins production mode rides the same fuzz coverage (forces
        # use_ybounds off and, half the time, tiered emission via mid_cap)
        opts.update(flat_bins=True, pair_budget=8_192, use_ybounds=False)
        if rng.random() < 0.5:
            opts["mid_cap"] = 512
    clear = (0.03, 0.05, 0.08, 1)

    fb_r = fblib.clear(fblib.create(H, W), jnp.asarray(clear, jnp.float32))
    a = draw_mesh(fb_r, mesh, mdl, PROJ, texture=tex, light=LIGHT,
                  shading=shading, sampling_mode=sampl, backend="ref")
    fb_f = fblib.clear(fblib.create(H, W), jnp.asarray(clear, jnp.float32))
    b = draw_mesh(fb_f, mesh, mdl, PROJ, texture=tex, light=LIGHT,
                  shading=shading, sampling_mode=sampl, backend="fused",
                  raster_opts=opts)
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth)), (
        shading, sampl, opts)
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    ), (shading, sampl, opts)


def test_fused_broad_plus_small_y_sorted_matches_ref():
    """A huge (broad-binned) triangle underneath many small ones, rendered on
    the y-sorted slab-culled path: the shared broad-suffix range must reach
    every slab (missing it would hole out the floor)."""
    import dtrenderer_tpu.models.mesh as meshlib

    rng = np.random.default_rng(9)
    small = primitives.random_triangle_soup(120, rng_seed=21, extent=0.9)
    # one screen-filling floor triangle behind the soup
    floor_v = np.array([[-8, -8, -1.0], [8, -8, -1.0], [0, 8, -1.0]],
                       np.float32)
    floor = meshlib.make_mesh(floor_v)

    def run(backend):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.02, 0.02, 0.05, 1], jnp.float32))
        opts = (dict(tile_h=32, capacity=256, small_span=2, broad_cap=128)
                if backend == "fused" else None)
        fb = draw_mesh(fb, floor, MODEL, PROJ, color=(0.3, 0.5, 0.2, 1.0),
                       shading="none", backend=backend, raster_opts=opts,
                       cull_backfaces=False)
        fb = draw_mesh(fb, small, MODEL, PROJ, color=(0.8, 0.4, 0.4, 1.0),
                       shading="gouraud", light=LIGHT, backend=backend,
                       raster_opts=opts)
        return fb

    a, b = run("ref"), run("fused")
    da, db = np.asarray(a.depth), np.asarray(b.depth)
    # coverage exact; depth to FMA-contraction noise (cross-PROGRAM f32
    # bitwise equality is not meaningful — ARCHITECTURE.md "Correctness
    # chain"); packed u8 image byte-exact.
    assert np.array_equal(np.isfinite(da), np.isfinite(db))
    m = np.isfinite(da)
    assert np.allclose(da[m], db[m], rtol=1e-6, atol=0)
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )


def test_fused_tri_sorted_depth_tie_broad_vs_small():
    """Depth-tie contract on the TRI-SORTED path (use_ybounds=False) with
    broad triangles present: a z-tie between a small triangle and a lower-id
    BROAD triangle must pick the broad one (min id, FORMULAS.md) — the bins
    order [smalls][broads], so a bin-SLOT tie-break would wrongly pick the
    small triangle (advisor finding, round 2)."""
    import dtrenderer_tpu.models.mesh as meshlib

    # Identity view_proj; all vertices at z_ndc=-1 -> screen z is EXACTLY 0
    # for every covered pixel of both triangles (b*0 == 0), so they tie
    # everywhere they overlap. Triangle 0 spans the whole frame (broad at
    # small_span=2); triangle 1 covers a small patch. UVs send tri 0 to the
    # red half and tri 1 to the blue half of a 1x2 texture.
    verts = np.array([
        [-3.0, -3.0, -1.0], [3.0, -3.0, -1.0], [0.0, 3.0, -1.0],   # broad
        [-0.1, -0.05, -1.0], [0.1, -0.05, -1.0], [0.0, 0.05, -1.0],  # small
    ], np.float32)
    uv = np.array([[0.25, 0.5]] * 3 + [[0.75, 0.5]] * 3, np.float32)
    mesh = meshlib.make_mesh(verts, uv)
    tex = jnp.asarray(
        np.array([[[1, 0, 0, 1], [0, 0, 1, 1]]], np.float32))  # red | blue
    eye = jnp.eye(4, dtype=jnp.float32)

    def run(backend):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0, 0, 0, 1], jnp.float32))
        opts = None
        if backend == "fused":
            opts = dict(tile_h=8, capacity=128, small_span=2, broad_cap=128)
        return draw_mesh(fb, mesh, eye, eye, texture=tex, shading="none",
                         sampling_mode="nearest", backend=backend,
                         cull_backfaces=False, near_clip=False,
                         raster_opts=opts)

    a, b = run("ref"), run("fused")
    ca, cb = np.asarray(a.color), np.asarray(b.color)
    # the small triangle's patch must be RED in both (broad id 0 wins the tie)
    cy, cx = H // 2, W // 2
    assert ca[cy, cx, 0] == 1.0 and ca[cy, cx, 2] == 0.0, "ref must pick id 0"
    assert np.array_equal(ca, cb)
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))


def _bins_equal(a, b):
    """Bins equality on MEANINGFUL slots: counts, overflow, and every slot
    below count (padding carries garbage coef/payload by contract — only its
    id channel must be -1 in both)."""
    import jax

    ca, cb = np.asarray(a.counts), np.asarray(b.counts)
    assert np.array_equal(ca, cb), "counts differ"
    assert int(np.asarray(a.overflow)) == int(np.asarray(b.overflow))
    sa, sb = np.asarray(a.setup), np.asarray(b.setup)
    K = sa.shape[2]
    valid = np.arange(K)[None, None, :] < ca[..., None]
    assert np.array_equal(sa[valid], sb[valid]), "valid slot rows differ"
    ids_a = np.asarray(jax.numpy.asarray(sa[..., 16]).view(np.int32))
    ids_b = sb[..., 16].view(np.int32)
    assert np.all(ids_a[~valid] == -1) and np.all(ids_b[~valid] == -1), (
        "padding slots must carry id -1")
    if a.slab_bounds is not None or b.slab_bounds is not None:
        assert np.array_equal(np.asarray(a.slab_bounds),
                              np.asarray(b.slab_bounds))


@pytest.mark.parametrize("n_slabs", [1, 4])
def test_binning_pair_budget_matches_default(n_slabs):
    """The prefix-gather binning path (pair_budget) must produce EXACTLY the
    same bins as the default path — counts, valid slot rows, padding-id
    contract, slab bounds, overflow."""
    from dtrenderer_tpu.ops.binning import bin_triangles
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.shading import make_light

    soup = primitives.random_triangle_soup(3_000, rng_seed=13, extent=1.2)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -3.0), m3.rotate_y(0.3)))
    setup, attrs = prepare_draw(soup, mdl, PROJ, m3.mat4mul(PROJ, mdl), mdl,
                                make_light(), (1, 1, 1, 1), "gouraud",
                                W, H, True, False)
    payload = attrs.reshape(attrs.shape[0], -1)[:, :7]
    kw = dict(tile_h=32, tile_w=128, capacity=2048, small_span=4,
              broad_cap=64, payload=payload, n_slabs=n_slabs)
    base = bin_triangles(setup.coef, setup.bbox, setup.valid, H, W, **kw)
    pref = bin_triangles(setup.coef, setup.bbox, setup.valid, H, W,
                         pair_budget=8_000, **kw)
    _bins_equal(base, pref)
    assert int(np.asarray(pref.overflow)) == 0


def test_binning_pair_budget_too_small_counts_overflow():
    from dtrenderer_tpu.ops.binning import bin_triangles
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.shading import make_light

    soup = primitives.random_triangle_soup(2_000, rng_seed=13, extent=1.2)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -3.0), m3.rotate_y(0.3)))
    setup, _ = prepare_draw(soup, mdl, PROJ, m3.mat4mul(PROJ, mdl), mdl,
                            make_light(), (1, 1, 1, 1), "gouraud",
                            W, H, True, False)
    tiny = bin_triangles(setup.coef, setup.bbox, setup.valid, H, W,
                         tile_h=32, capacity=256, small_span=4,
                         pair_budget=128)
    assert int(np.asarray(tiny.overflow)) > 0, (
        "a too-small pair_budget must COUNT its drops, never hide them")


def test_fused_pair_budget_image_identical():
    """End-to-end: a fused render with pair_budget on equals the default path
    byte-for-byte."""
    soup = primitives.random_triangle_soup(2_500, rng_seed=17, extent=1.1)

    def run(opts):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.02, 0.02, 0.05, 1], jnp.float32))
        return draw_mesh(fb, soup, MODEL, PROJ, shading="gouraud",
                         backend="fused", near_clip=False, raster_opts=opts)

    a = run(dict(capacity=512, small_span=4))
    b = run(dict(capacity=512, small_span=4, pair_budget=7_000))
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))


@pytest.mark.parametrize("opts", [
    dict(tile_h=8, capacity=128, small_span=4, broad_cap=64,
         pair_budget=4096, flat_bins=True, mid_cap=512),
    dict(tile_h=32, capacity=256, small_span=4, broad_cap=64,
         pair_budget=4096, flat_bins=True, cols=1, chunk=16),
    dict(tile_h=16, capacity=128, small_span=4, broad_cap=64,
         pair_budget=4096, flat_bins=True, cols=2, batch_rows=16,
         mid_cap=512),
    # slab windows: per-8-row-slab exact ranges (the flat path's slab
    # culling), per-slab capacity, value-carrying sort (no packed-key cap).
    # small_span is at SLAB granularity (spans grow ~n_slabs-fold vs tile
    # granularity) — keep it high enough that the mid mesh stays small on
    # both paths, or the paths legitimately drop different triangles.
    dict(tile_h=32, capacity=256, small_span=16, broad_cap=128,
         pair_budget=16384, flat_bins=True, flat_slabs=True, mid_cap=512),
    dict(tile_h=16, capacity=128, small_span=16, broad_cap=128,
         pair_budget=16384, flat_bins=True, flat_slabs=True, cols=2,
         chunk=16, batch_rows=8, mid_cap=512),
])
def test_fused_flat_bins_image_identical(opts):
    """flat_bins (per-tile HBM DMA of the sorted-prefix table + shared broad
    block) must be byte-identical to the dense setup path — including a
    screen-filling broad triangle under a soup, textured+gouraud plus an
    untextured phong draw (different payload layouts)."""
    import dtrenderer_tpu.models.mesh as meshlib

    soup = primitives.random_triangle_soup(500, rng_seed=23, extent=1.0)
    # mid-size triangles (cover 3..small_span tiles at small tile_h),
    # exercising the two-tier (compacted mid matrix) emission end to end
    r = np.random.default_rng(27)
    c_ = r.uniform(-1.0, 1.0, (60, 1, 3)).astype(np.float32)
    o_ = r.uniform(-0.35, 0.35, (60, 3, 3)).astype(np.float32)
    mids = meshlib.make_mesh((c_ + o_).reshape(-1, 3))
    mdl_mid = jnp.asarray(m3.model_matrix((0, 0, -2.0), m3.rotate_y(0.4)))
    floor_v = np.array([[-8, -8, -1.0], [8, -8, -1.0], [0, 8, -1.0]],
                       np.float32)
    floor = meshlib.make_mesh(floor_v)
    tex = primitives.checkerboard(16, 4)

    def run(o):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.02, 0.02, 0.05, 1], jnp.float32))
        fb = draw_mesh(fb, floor, MODEL, PROJ, color=(0.3, 0.5, 0.2, 1.0),
                       shading="none", backend="fused", raster_opts=o,
                       cull_backfaces=False)
        fb = draw_mesh(fb, soup, MODEL, PROJ, texture=tex, light=LIGHT,
                       shading="gouraud", sampling_mode="bilinear",
                       backend="fused", raster_opts=o)
        fb = draw_mesh(fb, primitives.uv_sphere(6, 8), MODEL, PROJ,
                       light=LIGHT, shading="phong", backend="fused",
                       raster_opts=o)
        fb = draw_mesh(fb, mids, mdl_mid, PROJ, color=(0.9, 0.6, 0.3, 1.0),
                       light=LIGHT, shading="flat", backend="fused",
                       raster_opts=o)
        return fb

    base = {k: v for k, v in opts.items()
            if k not in ("pair_budget", "flat_bins", "flat_slabs")}
    a, b = run(base), run(opts)
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))


@pytest.mark.parametrize("opts", [
    dict(capacity=256),                                    # dense setup path
    dict(tile_h=32, capacity=256, small_span=4, broad_cap=64,
         pair_budget=4096, flat_bins=True),                # flat single window
    dict(tile_h=32, capacity=256, small_span=16, broad_cap=128,
         pair_budget=16384, flat_bins=True, flat_slabs=True,
         mid_cap=512),                                     # slab windows (n_win=4)
    dict(tile_h=32, capacity=256, small_span=16, broad_cap=128,
         pair_budget=16384, flat_bins=True, row_bands=2),  # shared banded path
])
def test_fused_slot_k_image_identical(opts):
    """Phase-2 slot-gather block width (slot_k) is bit-exact by construction
    (disjoint per-chunk masks, one winner slot per lane) — verify against the
    k=1 reference on every phase-2 source kind: the dense payload block, the
    flat window (lane offset delta), slab windows, and the broad block.
    k=3 does not divide typical chunk counts, so it exercises the clamped
    over-the-end block reads too."""
    soup = primitives.random_triangle_soup(1_200, rng_seed=31, extent=1.1)
    floor_v = np.array([[-8, -8, -1.0], [8, -8, -1.0], [0, 8, -1.0]],
                       np.float32)
    import dtrenderer_tpu.models.mesh as meshlib

    floor = meshlib.make_mesh(floor_v)  # broad triangle (shared broad block)
    tex = primitives.checkerboard(16, 4)

    def run(o):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.02, 0.02, 0.05, 1], jnp.float32))
        fb = draw_mesh(fb, floor, MODEL, PROJ, color=(0.3, 0.5, 0.2, 1.0),
                       shading="none", backend="fused", raster_opts=o,
                       cull_backfaces=False)
        return draw_mesh(fb, soup, MODEL, PROJ, texture=tex, light=LIGHT,
                         shading="gouraud", sampling_mode="bilinear",
                         backend="fused", raster_opts=o)

    a = run(dict(opts, slot_k=1))
    for k in (3, 4):
        b = run(dict(opts, slot_k=k))
        assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth)), k
        assert np.array_equal(np.asarray(a.color), np.asarray(b.color)), k


def test_flat_binning_matches_dense_sets():
    """bin_triangles_flat's per-tile ranges must carry the same id sets and
    counts as the dense bins' small prefixes, and the same broad list."""
    from dtrenderer_tpu.ops.binning import bin_triangles, bin_triangles_flat
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.shading import make_light

    soup = primitives.random_triangle_soup(800, rng_seed=29, extent=1.2)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -3.0), m3.rotate_y(0.4)))
    setup, attrs = prepare_draw(soup, mdl, PROJ, m3.mat4mul(PROJ, mdl), mdl,
                                make_light(), (1, 1, 1, 1), "gouraud",
                                W, H, True, False)
    payload = attrs.reshape(attrs.shape[0], -1)[:, :7]
    kw = dict(tile_h=8, tile_w=128, capacity=128, small_span=4, broad_cap=64,
              payload=payload)
    dense = bin_triangles(setup.coef, setup.bbox, setup.valid, H, W,
                          broad_cap=0, **{k: v for k, v in kw.items()
                                          if k != "broad_cap"})
    flat = bin_triangles_flat(setup.coef, setup.bbox, setup.valid, H, W,
                              pair_budget=4096, **kw)
    # dense with broad_cap=0 -> counts are the small counts (same scene has
    # no broad triangles at this extent; overflow must agree at 0)
    assert int(np.asarray(dense.overflow)) == 0
    assert int(np.asarray(flat.overflow)) == 0
    cd = np.asarray(dense.counts)
    cf = np.asarray(flat.counts)
    assert np.array_equal(cd, cf)
    table = np.asarray(flat.table)
    starts = np.asarray(flat.starts)
    ids_dense = np.asarray(dense.setup)[..., 16].view(np.int32)
    for ty in range(cd.shape[0]):
        for tx in range(cd.shape[1]):
            n = cd[ty, tx]
            rows = table[starts[ty, tx]:starts[ty, tx] + n]
            ids_f = rows[:, 16].view(np.int32)
            assert np.array_equal(np.sort(ids_f),
                                  np.sort(ids_dense[ty, tx, :n])), (ty, tx)
            # payload channels ride the same rows
            pf = rows[:, 17:24]
            # channel-major copy agrees with the row-major table (rows past
            # the payload count are sublane padding)
            cm = np.asarray(flat.table_cm)
            np.testing.assert_array_equal(
                cm[:7, starts[ty, tx]:starts[ty, tx] + n].T, pf)


def test_flat_slab_windows_match_dense_sets():
    """Slab-window flat binning: each (tile, 8-row slab) window must hold
    EXACTLY the tile's small triangles whose bbox touches that slab (no
    misses — a miss would cull a visible triangle; supersets are allowed
    only via slab-boundary straddlers, which touch by definition), and the
    union over a tile's slabs must equal the dense tile set."""
    from dtrenderer_tpu.ops.binning import bin_triangles, bin_triangles_flat
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.shading import make_light

    soup = primitives.random_triangle_soup(800, rng_seed=29, extent=1.2)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -3.0), m3.rotate_y(0.4)))
    setup, attrs = prepare_draw(soup, mdl, PROJ, m3.mat4mul(PROJ, mdl), mdl,
                                make_light(), (1, 1, 1, 1), "gouraud",
                                W, H, True, False)
    payload = attrs.reshape(attrs.shape[0], -1)[:, :7]
    tile_h, n_slabs = 32, 4
    kw = dict(tile_h=tile_h, tile_w=128, small_span=8, broad_cap=0,
              payload=payload)
    # dense capacity is per TILE; flat slab capacity is per SLAB — give both
    # enough headroom that nothing is capacity-dropped (asserted below)
    dense = bin_triangles(setup.coef, setup.bbox, setup.valid, H, W,
                          capacity=512, **kw)
    flat = bin_triangles_flat(setup.coef, setup.bbox, setup.valid, H, W,
                              capacity=256, pair_budget=8192,
                              n_slabs=n_slabs, **kw)
    assert int(np.asarray(dense.overflow)) == 0
    assert int(np.asarray(flat.overflow)) == 0
    bbox = np.asarray(setup.bbox)
    table = np.asarray(flat.table)
    starts = np.asarray(flat.starts)
    counts = np.asarray(flat.counts)
    ids_dense = np.asarray(dense.setup)[..., 16].view(np.int32)
    cd = np.asarray(dense.counts)
    n_ty, n_tx = cd.shape
    assert counts.shape == (n_ty * n_slabs, n_tx)
    for ty in range(n_ty):
        for tx in range(n_tx):
            union = set()
            for s in range(n_slabs):
                r = ty * n_slabs + s
                n = counts[r, tx]
                ids = table[starts[r, tx]:starts[r, tx] + n, 16].view(np.int32)
                # every row's bbox must overlap this slab's pixel rows
                lo, hi = ty * tile_h + s * 8, ty * tile_h + s * 8 + 7
                for i in ids:
                    assert bbox[i, 1] <= hi and bbox[i, 3] >= lo, (
                        f"tri {i} in window ({ty},{s},{tx}) misses rows "
                        f"[{lo},{hi}]: bbox y {bbox[i, 1]}..{bbox[i, 3]}")
                union |= set(int(i) for i in ids)
            assert union == set(
                int(i) for i in ids_dense[ty, tx, :cd[ty, tx]]), (ty, tx)


def test_flat_binning_budget_overflow_counted():
    """Pairs beyond pair_budget must be dropped AND counted, never silent."""
    from dtrenderer_tpu.ops.binning import bin_triangles_flat
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.shading import make_light

    soup = primitives.random_triangle_soup(800, rng_seed=29, extent=1.2)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -3.0), m3.rotate_y(0.4)))
    setup, attrs = prepare_draw(soup, mdl, PROJ, m3.mat4mul(PROJ, mdl), mdl,
                                make_light(), (1, 1, 1, 1), "gouraud",
                                W, H, True, False)
    payload = attrs.reshape(attrs.shape[0], -1)[:, :7]
    tight = bin_triangles_flat(setup.coef, setup.bbox, setup.valid, H, W,
                               tile_h=8, tile_w=128, capacity=128,
                               small_span=4, broad_cap=64, payload=payload,
                               pair_budget=128)
    assert int(np.asarray(tight.overflow)) > 0


@pytest.mark.parametrize("extra", [
    dict(),
    dict(flat_bins=True, pair_budget=8_000),
])
def test_fused_row_bands_image_identical(extra):
    """row_bands banding (sequential per-band fused calls, shared prep, auto
    band compaction) must be byte-identical to the unbanded frame — dense
    and flat paths both."""
    soup = primitives.random_triangle_soup(2_000, rng_seed=31, extent=1.1)

    def run(o):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.02, 0.02, 0.05, 1], jnp.float32))
        return draw_mesh(fb, soup, MODEL, PROJ, shading="gouraud",
                         backend="fused", near_clip=False, raster_opts=o)

    base = dict(tile_h=8, capacity=256, small_span=4, **extra)
    a = run(base)
    b = run(dict(base, row_bands=2))
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))


def test_flat_binning_mid_cap_overflow_counted():
    """Two-tier span emission: triangles covering >2 tiles route through the
    compacted mid matrix; a too-small mid_cap must COUNT its dropped pairs."""
    from dtrenderer_tpu.ops.binning import bin_triangles_flat
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.shading import make_light

    # medium triangles (edge ~0.3-0.7 world units at z=-2): cover 3-8 tiles
    # at tile_h=8, routing through the compacted mid matrix (tier 2)
    import dtrenderer_tpu.models.mesh as meshlib
    r = np.random.default_rng(27)
    centers = r.uniform(-1.0, 1.0, (1200, 1, 3)).astype(np.float32)
    offs = r.uniform(-0.35, 0.35, (1200, 3, 3)).astype(np.float32)
    soup = meshlib.make_mesh((centers + offs).reshape(-1, 3))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.0), m3.rotate_y(0.4)))
    setup, attrs = prepare_draw(soup, mdl, PROJ, m3.mat4mul(PROJ, mdl), mdl,
                                make_light(), (1, 1, 1, 1), "gouraud",
                                W, H, True, False)
    payload = attrs.reshape(attrs.shape[0], -1)[:, :7]

    def run(cap):
        return bin_triangles_flat(
            setup.coef, setup.bbox, setup.valid, H, W, tile_h=8, tile_w=128,
            capacity=2048, small_span=8, broad_cap=128, payload=payload,
            pair_budget=32_768, mid_cap=cap)

    roomy = run(2_048)
    tight = run(128)
    assert int(np.asarray(roomy.overflow)) == 0
    assert int(np.asarray(tight.overflow)) > 0, (
        "mid_cap drops must be counted, never hidden")


def test_fused_flat_broad_cap_zero_matches_dense():
    """broad_cap=0 must DROP broad triangles (counted) on the flat path
    exactly like the dense path — a kept broad would also break the
    tie_by_id=False slot-order==id-order contract."""
    import dtrenderer_tpu.models.mesh as meshlib

    soup = primitives.random_triangle_soup(300, rng_seed=23, extent=1.0)
    floor_v = np.array([[-8, -8, -1.0], [8, -8, -1.0], [0, 8, -1.0]],
                       np.float32)
    floor = meshlib.make_mesh(floor_v)  # screen-filling: broad at any tile

    def run(o):
        fb = fblib.clear(fblib.create(H, W),
                         jnp.asarray([0.02, 0.02, 0.05, 1], jnp.float32))
        fb = draw_mesh(fb, floor, MODEL, PROJ, color=(0.3, 0.5, 0.2, 1.0),
                       shading="none", backend="fused", raster_opts=o,
                       cull_backfaces=False)
        fb = draw_mesh(fb, soup, MODEL, PROJ, light=LIGHT,
                       shading="gouraud", backend="fused", raster_opts=o)
        return fb

    base = dict(tile_h=8, capacity=256, small_span=4, broad_cap=0)
    a = run(base)
    b = run(dict(base, flat_bins=True, pair_budget=4096))
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))
    # the screen-filling floor must NOT have rendered on either path (it is
    # broad and broad_cap is 0): uncovered corners keep the clear color
    corner = np.asarray(a.color)[0, 0]
    np.testing.assert_allclose(corner, [0.02, 0.02, 0.05, 1], rtol=1e-6)


def test_emit_pair_keys_tiered_equals_single_tier():
    """The two-tier emission's SORTED key set must be identical to the
    naive [T, small_span] slot matrix — the invariant that makes tiering
    invisible to every consumer (bins, counts, images)."""
    from dtrenderer_tpu.ops.binning import _emit_pair_keys

    r = np.random.default_rng(41)
    T, ss, n_tx, n_ty = 500, 8, 6, 7
    n_tiles = n_tx * n_ty
    tx0 = jnp.asarray(r.integers(0, n_tx, T), jnp.int32)
    ty0 = jnp.asarray(r.integers(0, n_ty, T), jnp.int32)
    # spans biased small but covering the full 1..ss range (and beyond-span
    # "broads" excluded via the small mask, like the real caller)
    span_w = jnp.asarray(np.minimum(r.geometric(0.6, T), 4), jnp.int32)
    span_h = jnp.asarray(np.minimum(r.geometric(0.6, T), 4), jnp.int32)
    span_w = jnp.minimum(span_w, n_tx - tx0)
    span_h = jnp.minimum(span_h, n_ty - ty0)
    n_cover = span_w * span_h
    small = (n_cover > 0) & (n_cover <= ss) & jnp.asarray(
        r.random(T) < 0.9)
    n_cover = jnp.where(small, n_cover, 0)
    rank_vec = jnp.arange(T, dtype=jnp.int32)

    tiered, ovf = _emit_pair_keys(small, n_cover, tx0, ty0, span_w, rank_vec,
                                  T, n_tiles, n_tx, ss, mid_cap=256)
    # rebuild the naive [T, ss] matrix for the ground truth
    s = jnp.arange(ss, dtype=jnp.int32)[None, :]
    sw = jnp.maximum(span_w, 1)[:, None]
    tile = (ty0[:, None] + s // sw) * n_tx + (tx0[:, None] + s % sw)
    in_span = small[:, None] & (s < n_cover[:, None])
    SENT = np.int32(n_tiles * (T + 1))
    naive = np.where(np.asarray(in_span),
                     np.asarray(tile) * (T + 1) + np.arange(T)[:, None],
                     SENT).ravel()

    assert int(np.asarray(ovf)) == 0
    a = np.sort(np.asarray(tiered))
    b = np.sort(naive)
    # identical REAL keys; tiered has fewer sentinel slots by construction
    a_real = a[a < SENT]
    b_real = b[b < SENT]
    assert np.array_equal(a_real, b_real)
