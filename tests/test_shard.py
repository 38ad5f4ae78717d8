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
