"""raster_ref (jnp device path) vs the scalar NumPy oracle: visibility parity.

Mirrors the reference's implicit SlowTriangle-vs-SIMDTriangle oracle relationship
(SURVEY.md §4.5) as an explicit automated test.
"""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.ops import geometry
from dtrenderer_tpu.ops.raster_ref import rasterize_ref
from dtrenderer_tpu.utils import math3d as m3

import oracle
from conftest import assert_ulp


def _random_screen_tris(rng, n_tris, h, w):
    """Random triangles directly in screen space (some off-screen, some degenerate)."""
    n = n_tris * 3
    screen = np.empty((n, 4), np.float32)
    screen[:, 0] = rng.uniform(-20, w + 20, n)
    screen[:, 1] = rng.uniform(-20, h + 20, n)
    screen[:, 2] = rng.uniform(0.0, 1.0, n)
    screen[:, 3] = rng.uniform(0.5, 2.0, n)
    faces = np.arange(n, dtype=np.int32).reshape(n_tris, 3)
    # make a couple degenerate
    if n_tris > 3:
        screen[faces[1, 1]] = screen[faces[1, 0]]
        screen[faces[2]] = screen[faces[2, 0]]
    return screen, faces


def _compare(screen, faces, h, w, cull):
    setup = geometry.triangle_setup(
        jnp.asarray(screen), jnp.asarray(faces), w, h, cull_backfaces=cull
    )
    z_dev, tri_dev = rasterize_ref(setup.coef, setup.valid, h, w)
    z_ref, tri_ref = oracle.rasterize(screen, faces, h, w, cull_backfaces=cull)
    tri_dev = np.asarray(tri_dev)
    mism = tri_dev != tri_ref
    assert not mism.any(), (
        f"tri-id mismatch at {np.argwhere(mism)[:5]} "
        f"dev={tri_dev[mism][:5]} ref={tri_ref[mism][:5]}"
    )
    # XLA contracts mul+add chains into FMAs; near triangle edges the edge
    # functions cancel, so interpolated depth can differ from the strictly-
    # ordered NumPy oracle by ~1e-5 relative. Winning triangle ids must still
    # match exactly (asserted above), and the 1-ULP image bar is enforced on
    # packed u8 output in test_pipeline.py.
    z_dev = np.asarray(z_dev)
    fin = np.isfinite(z_ref)
    assert np.array_equal(fin, np.isfinite(z_dev)), "coverage mismatch"
    np.testing.assert_allclose(z_dev[fin], z_ref[fin], rtol=1e-4, atol=1e-6)


def test_single_flat_triangle(rng):
    screen = np.array(
        [
            [100.0, 40.0, 0.5, 1.0],
            [40.0, 160.0, 0.5, 1.0],
            [180.0, 150.0, 0.5, 1.0],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2]], np.int32)
    _compare(screen, faces, 200, 220, cull=True)


def test_random_triangles_nocull(rng):
    screen, faces = _random_screen_tris(rng, 40, 96, 128)
    _compare(screen, faces, 96, 128, cull=False)


def test_random_triangles_cull(rng):
    screen, faces = _random_screen_tris(rng, 40, 96, 128)
    _compare(screen, faces, 96, 128, cull=True)


def test_overlapping_depth_order(rng):
    # Stacked triangles with varied depths: z-test tie/ordering semantics.
    screen, faces = _random_screen_tris(rng, 24, 64, 64)
    # force heavy overlap: pull all verts toward center
    screen[:, 0] = 32 + (screen[:, 0] - 32) * 0.3
    screen[:, 1] = 32 + (screen[:, 1] - 32) * 0.3
    # quantize depths so ties actually occur
    screen[:, 2] = np.round(screen[:, 2] * 4) / 4
    _compare(screen, faces, 64, 64, cull=False)


def test_projected_cube_visibility(rng):
    # Full vertex pipeline: model -> MVP -> screen, compare against oracle pipeline.
    verts = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float32,
    )
    quads = [
        (0, 1, 2, 3), (5, 4, 7, 6), (4, 0, 3, 7),
        (1, 5, 6, 2), (3, 2, 6, 7), (4, 5, 1, 0),
    ]
    faces = np.array(
        [t for (a, b, c, d) in quads for t in ((a, b, c), (a, c, d))], np.int32
    )
    h, w = 120, 160
    model = m3.model_matrix((0, 0, -4), m3.rotate_y(0.6) @ m3.rotate_x(0.4))
    proj = m3.perspective(np.pi / 3, w / h, 0.1, 100.0)
    mvp = np.asarray(proj @ model)

    screen_dev = geometry.vertex_transform(jnp.asarray(verts), jnp.asarray(mvp), w, h)
    screen_ref = oracle.vertex_transform(verts, mvp, w, h)
    assert_ulp(np.asarray(screen_dev), screen_ref, max_ulp=2, msg="vertex transform")

    _compare(screen_ref, faces, h, w, cull=True)
