"""Multi-device sharded rendering tests (8 virtual CPU devices, see conftest).

Validates the P-THREAD replacement (SURVEY.md §2): framebuffer row-band decomposition
over the device mesh produces bit-identical images to single-device rendering, and the
frames x rows 2D mesh (data-parallel batch of frames) works end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.pipeline import draw_mesh
from dtrenderer_tpu.parallel import shard
from dtrenderer_tpu.utils import math3d as m3


@pytest.fixture(scope="module")
def cube_scene():
    mesh = primitives.cube()
    h, w = 64, 128
    model = jnp.asarray(m3.model_matrix((0, 0, -4.0), m3.rotate_y(0.6)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    tex = primitives.checkerboard(16, 4)
    return mesh, model, proj, tex, h, w


def test_row_sharded_matches_single(cube_scene):
    mesh, model, proj, tex, h, w = cube_scene
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    dmesh = shard.make_mesh(frames=1, rows=8)

    fb1 = fblib.clear(fblib.create(h, w), jnp.asarray([0.1, 0, 0, 1], jnp.float32))
    single = draw_mesh(fb1, mesh, model, proj, texture=tex, shading="gouraud")

    fb8 = shard.create_sharded_fb(h, w, dmesh)
    fb8 = fblib.Framebuffer(
        color=fb8.color + jnp.asarray([0.1, 0, 0, 1], jnp.float32),
        depth=fb8.depth,
    )
    multi = shard.draw_mesh_sharded(fb8, mesh, model, proj, dmesh,
                                    texture=tex, shading="gouraud")

    assert np.array_equal(np.asarray(single.depth), np.asarray(multi.depth))
    assert np.array_equal(np.asarray(single.color), np.asarray(multi.color))


def test_frames_x_rows_mesh(cube_scene):
    mesh, model, proj, tex, h, w = cube_scene
    dmesh = shard.make_mesh(frames=2, rows=4)
    batch = 2
    angles = jnp.asarray([0.3, 1.1], jnp.float32)

    def band_fn(band_fb, angle, y0, fh, fw):
        mdl = m3.model_matrix((0, 0, -4.0), m3.rotate_y(angle))
        return draw_mesh(
            band_fb, mesh, mdl, proj, texture=tex, shading="gouraud",
            frame_height=fh, frame_width=fw, y_offset=y0,
        )

    fb = shard.create_sharded_fb(h, w, dmesh, batch=batch)
    out = shard.render_frames_sharded(band_fn, fb, dmesh, angles)
    colors = np.asarray(out.color)

    # Each frame must equal its single-device render.
    for i, ang in enumerate([0.3, 1.1]):
        fb1 = fblib.create(h, w)
        mdl = m3.model_matrix((0, 0, -4.0), m3.rotate_y(jnp.float32(ang)))
        ref = draw_mesh(fb1, mesh, mdl, proj, texture=tex, shading="gouraud")
        assert np.array_equal(colors[i], np.asarray(ref.color)), f"frame {i}"

    # Frames differ from each other (the angle actually matters).
    assert not np.array_equal(colors[0], colors[1])


def test_2d_rows_x_cols_sharded_matches_single(cube_scene):
    """The 2D (rows x cols) framebuffer decomposition: each device owns a
    rows x cols rectangle, offsets flow through x_offset, and the image is
    bit-identical to the single-device render (SURVEY.md §5 distributed-comm
    analog; the round-3 docstring advertised this without implementing it)."""
    mesh, model, proj, tex, h, w = cube_scene
    dmesh = shard.make_mesh(frames=1, rows=4, cols=2)
    assert dmesh.shape["rows"] == 4 and dmesh.shape["cols"] == 2

    fb1 = fblib.create(h, w)
    single = draw_mesh(fb1, mesh, model, proj, texture=tex, shading="gouraud")

    fb8 = shard.create_sharded_fb(h, w, dmesh)
    multi = shard.draw_mesh_sharded(fb8, mesh, model, proj, dmesh,
                                    texture=tex, shading="gouraud")
    assert np.array_equal(np.asarray(single.depth), np.asarray(multi.depth))
    assert np.array_equal(np.asarray(single.color), np.asarray(multi.color))


def test_2d_frames_x_rows_x_cols_mesh(cube_scene):
    """frames x rows x cols: data-parallel frames, each frame tiled 2D; the
    per-tile band function receives its x0 column offset."""
    mesh, model, proj, tex, h, w = cube_scene
    dmesh = shard.make_mesh(frames=2, rows=2, cols=2)
    batch = 2
    angles = jnp.asarray([0.3, 1.1], jnp.float32)

    def band_fn(band_fb, angle, y0, fh, fw, x0):
        mdl = m3.model_matrix((0, 0, -4.0), m3.rotate_y(angle))
        return draw_mesh(
            band_fb, mesh, mdl, proj, texture=tex, shading="gouraud",
            frame_height=fh, frame_width=fw, y_offset=y0, x_offset=x0,
        )

    fb = shard.create_sharded_fb(h, w, dmesh, batch=batch)
    out = shard.render_frames_sharded(band_fn, fb, dmesh, angles)
    colors = np.asarray(out.color)
    for i, ang in enumerate([0.3, 1.1]):
        fb1 = fblib.create(h, w)
        mdl = m3.model_matrix((0, 0, -4.0), m3.rotate_y(jnp.float32(ang)))
        ref = draw_mesh(fb1, mesh, mdl, proj, texture=tex, shading="gouraud")
        assert np.array_equal(colors[i], np.asarray(ref.color)), f"frame {i}"


def test_shard_budget_compaction_bit_exact():
    """Per-band triangle pre-compaction (raster_opts.shard_budget) must keep the
    sharded image bit-identical to single-device while each band bins only its
    own triangles (the multi-chip binning-redundancy fix, VERDICT r1 #4)."""
    h, w = 64, 128
    soup = primitives.random_triangle_soup(1_200, rng_seed=7, extent=1.2)
    model = jnp.asarray(m3.model_matrix((0, 0, -2.5), m3.rotate_y(0.3)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    dmesh = shard.make_mesh(frames=1, rows=8)
    # capacity must clear the (dense tiny-frame) scene — bin overflow would drop
    # DIFFERENT triangles under different tilings and mask the comparison.
    # tile_h=8 keeps interpret-mode kernel cost down (1 slab, small bins).
    opts = dict(tile_h=8, capacity=512, small_span=8, shard_budget=512)

    # budget must exceed every band's in-shard count (asserted via counters)
    bh = h // 8
    for band in range(8):
        _, c = draw_mesh(
            fblib.create(bh, w), soup, model, proj, shading="gouraud",
            backend="fused", near_clip=False, frame_height=h, frame_width=w,
            y_offset=band * bh, raster_opts=opts, return_counters=True,
        )
        assert int(c.bin_overflow) == 0, f"band {band} overflows the budget"

    fb1 = fblib.create(h, w)
    single = draw_mesh(fb1, soup, model, proj, shading="gouraud",
                       backend="fused", near_clip=False,
                       raster_opts=dict(tile_h=8, capacity=512, small_span=8))

    fb8 = shard.create_sharded_fb(h, w, dmesh)
    multi = shard.draw_mesh_sharded(
        fb8, soup, model, proj, dmesh, shading="gouraud", backend="fused",
        near_clip=False, raster_opts=opts,
    )
    assert np.array_equal(np.asarray(single.depth), np.asarray(multi.depth))
    assert np.array_equal(np.asarray(single.color), np.asarray(multi.color))


def test_shard_budget_overflow_counted():
    """An undersized shard_budget must COUNT its drops (never silent)."""
    from dtrenderer_tpu.ops.pipeline import draw_mesh as dm

    h, w = 64, 128
    soup = primitives.random_triangle_soup(1_200, rng_seed=7, extent=1.2)
    model = jnp.asarray(m3.model_matrix((0, 0, -2.5), m3.rotate_y(0.3)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    fb1 = fblib.create(h, w)
    _, counters = dm(fb1, soup, model, proj, shading="gouraud",
                     backend="fused", near_clip=False,
                     raster_opts=dict(tile_h=8, capacity=256, small_span=8,
                                      shard_budget=128),
                     return_counters=True)
    assert int(counters.bin_overflow) > 0


def test_shared_crossband_binning_sharded_matches_single():
    """Scene-level coverage for the round-5 SHARED cross-band binning: one
    full-frame partition sort (bin_triangles_flat(row_bands=N)) whose
    per-band windows feed each device's kernel via raster_opts band_index.
    Must equal both the per-band-binning sharded render (bit-exact: same
    depth/shading contracts) and the single-device frame (packed u8 — cross
    program shapes, CLAUDE.md)."""
    from dtrenderer_tpu.utils.color import pack_srgb_u8

    h, w = 128, 128
    rows = 8
    soup = primitives.random_triangle_soup(4_000, rng_seed=13, extent=1.4)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.6), m3.rotate_y(0.3)))
    dmesh = shard.make_mesh(frames=1, rows=rows)
    base = dict(tile_h=8, capacity=512, small_span=8, flat_bins=True,
                pair_budget=4 * 4_000)

    def run(o):
        fb = shard.create_sharded_fb(h, w, dmesh)
        out = jax.jit(lambda f: shard.draw_mesh_sharded(
            f, soup, mdl, proj, device_mesh=dmesh, shading="gouraud",
            near_clip=False, backend="fused", raster_opts=o))(fb)
        return np.asarray(out.color)

    shared = run(dict(base, row_bands=rows))
    per_band = run(base)
    assert np.array_equal(shared, per_band), (
        "shared-table sharded render != per-band binning sharded render")

    # DISTRIBUTED shared binning: 1/N triangle-sliced emission + one
    # all_to_all of band buckets + local merge/gather per device
    # (binning.bin_triangles_flat_distributed) — the program the banded
    # bench's sum/N projection describes. Kept-pair sets equal the shared
    # pass at zero overflow, so the image must be bit-exact.
    distributed = run(dict(base, row_bands=rows, band_distributed=True))
    assert np.array_equal(distributed, shared), (
        "distributed cross-band binning != shared-table render")

    single = draw_mesh(fblib.create(h, w), soup, mdl, proj, shading="gouraud",
                       near_clip=False, backend="fused", raster_opts=base)
    assert np.array_equal(
        np.asarray(pack_srgb_u8(jnp.asarray(shared))),
        np.asarray(pack_srgb_u8(single.color)))


def test_ordered_translucent_sharded_matches_single():
    """The reference's sequential blend semantics survive the framebuffer
    decomposition: a TRANSLUCENT mesh drawn via draw_mesh_ordered_sharded
    (per-band ordered tile kernels with frame offsets) equals the
    single-device ordered render — pixel ownership is disjoint, so per-band
    submission order IS global order (VERDICT r4 missing #1)."""
    from dtrenderer_tpu.ops.pipeline import draw_mesh_ordered
    from dtrenderer_tpu.utils.color import pack_srgb_u8

    h, w = 128, 128
    rows = 8
    mesh = primitives.uv_sphere(12, 16)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.6), m3.rotate_y(0.4), 1.3))
    col = (0.8, 0.5, 0.9, 0.5)
    dmesh = shard.make_mesh(frames=1, rows=rows)
    opts = dict(tile_h=16, capacity=512)

    fb = shard.create_sharded_fb(h, w, dmesh)
    out = jax.jit(lambda f: shard.draw_mesh_ordered_sharded(
        f, mesh, mdl, proj, device_mesh=dmesh, color=col, shading="gouraud",
        engine="tile", raster_opts=opts))(fb)

    # The reference render takes its y_offset as a TRACED argument: on CPU
    # interpret mode, a CONCRETE offset lets XLA constant-fold the kernel's
    # off_ref reads and reassociate the downstream f32 arithmetic (~1-2 ulp
    # diffs vs the runtime-offset program); with both sides traced — exactly
    # what shard_map's axis_index forces — the images are BIT-exact. On real
    # hardware offsets are SMEM runtime inputs either way.
    single, counters = jax.jit(lambda y0: draw_mesh_ordered(
        fblib.create(h, w), mesh, mdl, proj, color=col, shading="gouraud",
        engine="tile", raster_opts=opts, y_offset=y0,
        return_counters=True))(jnp.int32(0))
    assert int(np.asarray(counters.bin_overflow)) == 0
    assert np.array_equal(np.asarray(out.color), np.asarray(single.color))
    assert np.array_equal(np.asarray(out.depth), np.asarray(single.depth))
    # the blend really happened (translucent over background != background)
    assert not np.array_equal(np.asarray(out.color),
                              np.asarray(shard.create_sharded_fb(h, w, dmesh).color))
