"""Fill-rule exactness: shared edges paint every pixel exactly once.

This is the property the FORMULAS.md top-left rule exists for; the reference had no
such test (SURVEY.md §4: no automated suite) — we add it as part of the rebuild's
test strategy.
"""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.ops import geometry
from dtrenderer_tpu.ops.raster_ref import rasterize_ref


def _screen(verts):
    """[N, (x, y)] -> screen array [N,4] with z=0.5, q=1."""
    v = np.asarray(verts, np.float32)
    out = np.zeros((v.shape[0], 4), np.float32)
    out[:, :2] = v
    out[:, 2] = 0.5
    out[:, 3] = 1.0
    return jnp.asarray(out)


def _coverage_count(verts, faces, h, w):
    """Rasterize each triangle alone and count per-pixel total coverage."""
    total = np.zeros((h, w), np.int32)
    for f in faces:
        setup = geometry.triangle_setup(
            _screen(verts), jnp.asarray([f], jnp.int32), w, h, cull_backfaces=False
        )
        _, tri = rasterize_ref(setup.coef, setup.valid, h, w)
        total += np.asarray(tri) >= 0
    return total


def test_shared_edge_quad_no_double_coverage():
    # Quad split along a diagonal: every interior pixel covered exactly once.
    verts = [(4.0, 4.0), (60.0, 4.0), (60.0, 44.0), (4.0, 44.0)]
    faces = [(0, 1, 2), (0, 2, 3)]
    total = _coverage_count(verts, faces, 48, 64)
    assert total.max() == 1, "double-covered pixels on shared edge"
    # interior sanity: the quad body is covered
    assert total[20, 30] == 1
    assert total.sum() >= (56 - 1) * (40 - 1) - 60  # approx quad area


def test_triangle_fan_exact_cover(rng):
    # A fan of triangles around a shared center: shared edges in many orientations.
    cx, cy = 32.0, 24.0
    n = 12
    angs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = [(cx + 20 * np.cos(a), cy + 18 * np.sin(a)) for a in angs]
    verts = [(cx, cy)] + ring
    faces = [(0, 1 + i, 1 + (i + 1) % n) for i in range(n)]
    total = _coverage_count(verts, faces, 48, 64)
    assert total.max() == 1, "double coverage across fan edges"
    assert total[int(cy), int(cx)] == 1, "center pixel uncovered"


def test_pixel_center_on_integer_edges():
    # Axis-aligned box from (8,8) to (24,16): top/left edges own their pixels,
    # bottom/right do not (half-open raster convention).
    verts = [(8.0, 8.0), (24.0, 8.0), (24.0, 16.0), (8.0, 16.0)]
    faces = [(0, 1, 2), (0, 2, 3)]
    total = _coverage_count(verts, faces, 32, 32)
    ys, xs = np.nonzero(total)
    assert ys.min() == 8 and ys.max() == 15
    assert xs.min() == 8 and xs.max() == 23
    assert total.sum() == 16 * 8
