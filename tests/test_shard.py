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
