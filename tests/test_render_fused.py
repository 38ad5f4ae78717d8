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
