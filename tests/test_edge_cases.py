"""Edge-case hardening: degenerate inputs the reference would hit too
(empty scenes, single triangles, NaN vertices, tiny frames, huge meshes offscreen)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.models.mesh import make_mesh
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.pipeline import draw_mesh
from dtrenderer_tpu.utils import math3d as m3

H, W = 32, 128
PROJ = jnp.asarray(m3.perspective(np.pi / 3, W / H, 0.1, 50.0))


def _fb():
    return fblib.clear(fblib.create(H, W), jnp.asarray([0, 0, 0, 1], jnp.float32))


@pytest.mark.parametrize("backend", ["ref", "fused"])
def test_single_triangle_mesh(backend):
    mesh = make_mesh(np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]],
                              np.float32))
    out = draw_mesh(_fb(), mesh, m3.model_matrix((0, 0, -2)), PROJ,
                    backend=backend,
                    raster_opts=dict(capacity=128) if backend == "fused" else None)
    assert np.isfinite(np.asarray(out.depth)).sum() > 10


@pytest.mark.parametrize("backend", ["ref", "fused"])
def test_nan_vertices_do_not_poison(backend):
    verts = np.array(
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0],
         [np.nan, 0.1, 0], [0.2, np.nan, 0], [0.3, 0.4, np.nan]],
        np.float32,
    )
    mesh = make_mesh(verts, None, np.tile([[0, 0, 1]], (6, 1)).astype(np.float32),
                     np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    out = draw_mesh(_fb(), mesh, m3.model_matrix((0, 0, -2)), PROJ,
                    backend=backend,
                    raster_opts=dict(capacity=128) if backend == "fused" else None)
    color = np.asarray(out.color)
    assert np.isfinite(color).all(), "NaN leaked into the framebuffer"
    assert np.isfinite(np.asarray(out.depth)).sum() > 10, "good tri was dropped"


@pytest.mark.parametrize("backend", ["ref", "fused"])
def test_fully_offscreen_mesh(backend):
    mesh = primitives.cube()
    out = draw_mesh(_fb(), mesh, m3.model_matrix((100.0, 0, -5)), PROJ,
                    backend=backend,
                    raster_opts=dict(capacity=128) if backend == "fused" else None)
    assert not np.isfinite(np.asarray(out.depth)).any()
    assert np.allclose(np.asarray(out.color)[..., :3], 0.0)


def test_zero_area_frame_mesh_far_away():
    # sub-pixel mesh: must not crash, may cover 0-2 px
    mesh = primitives.cube()
    out = draw_mesh(_fb(), mesh, m3.model_matrix((0, 0, -45.0), scale_v=0.01),
                    PROJ, backend="fused", raster_opts=dict(capacity=128))
    assert np.isfinite(np.asarray(out.color)).all()


def test_mesh_larger_than_capacity_overflows_not_crashes():
    # 4000 tris crammed into a few tiles at tiny capacity: renders (partially),
    # never crashes or NaNs.
    soup = primitives.random_triangle_soup(4000, rng_seed=5, extent=0.3)
    out = draw_mesh(_fb(), soup, m3.model_matrix((0, 0, -1.0)), PROJ,
                    cull_backfaces=False, near_clip=False, backend="fused",
                    raster_opts=dict(capacity=128, small_span=8, broad_cap=128))
    assert np.isfinite(np.asarray(out.color)).all()
