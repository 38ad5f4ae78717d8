"""Pallas tile-kernel raster vs the jnp reference raster: bit-exact visibility parity.

The TPU analog of the reference's SIMDTriangle-vs-SlowTriangle self-check
(SURVEY.md §4.5). Runs in Pallas interpret mode on the CPU test platform.
"""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.ops import geometry
from dtrenderer_tpu.ops.raster_ref import rasterize_ref
from dtrenderer_tpu.ops.raster_pallas import rasterize_pallas

KW = dict(tile_h=32, tile_w=128, capacity=128, small_span=8, broad_cap=32)


def _random_screen_tris(rng, n_tris, h, w, size=25):
    c = np.stack([rng.uniform(-10, w + 10, n_tris), rng.uniform(-10, h + 10, n_tris)], 1)[:, None, :]
    off = rng.uniform(-size, size, (n_tris, 3, 2))
    screen = np.zeros((n_tris * 3, 4), np.float32)
    screen[:, :2] = (c + off).reshape(-1, 2)
    screen[:, 2] = rng.uniform(0, 1, n_tris * 3)
    screen[:, 3] = 1.0
    faces = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return screen, faces


def _compare(screen, faces, h, w, cull=False, **kw):
    setup = geometry.triangle_setup(
        jnp.asarray(screen), jnp.asarray(faces), w, h, cull_backfaces=cull
    )
    z1, t1 = rasterize_ref(setup.coef, setup.valid, h, w)
    z2, t2, _ = rasterize_pallas(setup.coef, setup.bbox, setup.valid, h, w, **{**KW, **kw})
    assert (np.asarray(t1) == np.asarray(t2)).all(), (
        f"{(np.asarray(t1) != np.asarray(t2)).sum()} tri-id mismatches"
    )
    assert np.array_equal(np.asarray(z1), np.asarray(z2)), "depth not bit-exact"


def test_small_triangles(rng):
    screen, faces = _random_screen_tris(rng, 50, 96, 256)
    _compare(screen, faces, 96, 256)


def test_mixed_sizes_broad_path(rng):
    # include triangles spanning many tiles (forced through the broad list)
    screen, faces = _random_screen_tris(rng, 30, 96, 256)
    big, bigf = _random_screen_tris(rng, 4, 96, 256, size=150)
    screen = np.concatenate([screen, big])
    faces = np.concatenate([faces, bigf + 90])
    _compare(screen, faces, 96, 256)


def test_depth_ties(rng):
    screen, faces = _random_screen_tris(rng, 30, 64, 128)
    screen[:, 0] = 64 + (screen[:, 0] - 64) * 0.2
    screen[:, 1] = 32 + (screen[:, 1] - 32) * 0.2
    screen[:, 2] = np.round(screen[:, 2] * 3) / 3
    _compare(screen, faces, 64, 128)


def test_band_offsets_match_full_frame(rng):
    screen, faces = _random_screen_tris(rng, 40, 96, 256)
    setup = geometry.triangle_setup(
        jnp.asarray(screen), jnp.asarray(faces), 256, 96, cull_backfaces=False
    )
    z_full, t_full, _ = rasterize_pallas(setup.coef, setup.bbox, setup.valid, 96, 256, **KW)
    for y0, bh in [(0, 32), (32, 32), (64, 32)]:
        z_b, t_b, _ = rasterize_pallas(
            setup.coef, setup.bbox, setup.valid, bh, 256, y_offset=y0, **KW
        )
        assert np.array_equal(np.asarray(t_full)[y0:y0 + bh], np.asarray(t_b))
        assert np.array_equal(np.asarray(z_full)[y0:y0 + bh], np.asarray(z_b))


def test_overflow_reported(rng):
    # tiny capacity -> overflow counter fires (no silent drop)
    from dtrenderer_tpu.ops.binning import bin_triangles

    screen, faces = _random_screen_tris(rng, 60, 64, 128)
    setup = geometry.triangle_setup(
        jnp.asarray(screen), jnp.asarray(faces), 128, 64, cull_backfaces=False
    )
    bins = bin_triangles(
        setup.coef, setup.bbox, setup.valid, 64, 128,
        tile_h=32, tile_w=128, capacity=16, small_span=8, broad_cap=8,
    )
    assert int(bins.overflow) > 0


def test_pipeline_pallas_backend_matches_ref(rng):
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import draw_mesh
    from dtrenderer_tpu.utils import math3d as m3

    mesh = primitives.cube()
    h, w = 64, 128
    model = jnp.asarray(m3.model_matrix((0, 0, -4.0), m3.rotate_y(0.7)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    tex = primitives.checkerboard(16, 4)

    def run(backend):
        fb = fblib.clear(fblib.create(h, w), jnp.asarray([0, 0, 0, 1], jnp.float32))
        return draw_mesh(fb, mesh, model, proj, texture=tex, shading="gouraud",
                         backend=backend)

    a = run("ref")
    b = run("pallas")
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))


def test_binning_large_tile_by_tri_domain(rng):
    # (n_tiles+1)*T >= 2^31 would overflow any packed int32 sort key (and JAX
    # silently truncates int64 under jax_enable_x64=False) — the two-key
    # lax.sort must handle this domain exactly.
    from dtrenderer_tpu.ops.binning import bin_triangles

    h, w = 4096, 1920
    T = 300_000
    n_tiles = (h // 8) * (w // 128)
    assert (n_tiles + 1) * T >= 2**31, "test no longer exercises the large domain"
    coef = jnp.zeros((T, 16), jnp.float32)
    xs = rng.uniform(0, w - 4, T).astype(np.int32)
    ys = rng.uniform(0, h - 4, T).astype(np.int32)
    bbox = jnp.stack([xs, ys, xs + 3, ys + 3], axis=1).astype(jnp.int32)
    valid = jnp.ones((T,), bool)
    bins = bin_triangles(coef, bbox, valid, h, w, tile_h=8, tile_w=128,
                         capacity=256, small_span=4, broad_cap=128)
    counts = np.asarray(bins.counts)
    assert counts.sum() > T  # every tri lands in >=1 tile
    assert int(bins.overflow) == 0
    # spot-check one bin's ids are valid and unique
    setup = np.asarray(bins.setup)
    ids = setup[..., 16].view(np.int32)
    tile = np.unravel_index(counts.argmax(), counts.shape)
    n = counts[tile]
    got = ids[tile][:n]
    assert (got >= 0).all() and (got < T).all()
    assert len(np.unique(got)) == n
