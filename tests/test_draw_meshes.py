"""Batched scene submission (draw_meshes): bit-exact vs sequential fused draws.

Order-independence of the depth resolve (FORMULAS.md) makes merging all opaque draws
into one fused kernel invocation exact, including per-draw textures via the packed
LUT and mixed phong/gouraud shading via the per-triangle flag."""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_mesh, draw_meshes
from dtrenderer_tpu.ops.shading import make_light
from dtrenderer_tpu.utils import math3d as m3
from dtrenderer_tpu.utils.color import pack_srgb_u8


def test_batched_matches_sequential_fused():
    h, w = 64, 128
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    tex1 = primitives.checkerboard(16, 4)
    tex2 = primitives.gradient_texture(8)
    cube = primitives.cube()
    sphere = primitives.uv_sphere(8, 12)
    m1 = jnp.asarray(m3.model_matrix((-0.5, 0, -5.0), m3.rotate_y(0.4)))
    m2 = jnp.asarray(m3.model_matrix((0.6, 0.2, -6.0), m3.rotate_y(1.1)))
    clear = jnp.asarray([0.03, 0.02, 0.08, 1], jnp.float32)

    fb_a = fblib.clear(fblib.create(h, w), clear)
    fb_a = draw_mesh(fb_a, cube, m1, proj, texture=tex1, light=light,
                     shading="gouraud", sampling_mode="bilinear",
                     backend="fused", raster_opts=dict(capacity=128))
    fb_a = draw_mesh(fb_a, sphere, m2, proj, texture=tex2, light=light,
                     shading="phong", sampling_mode="bilinear",
                     backend="fused", raster_opts=dict(capacity=128))

    fb_b = fblib.clear(fblib.create(h, w), clear)
    fb_b = draw_meshes(
        fb_b, proj,
        [
            DrawSpec(cube, m1, texture=tex1, shading="gouraud"),
            DrawSpec(sphere, m2, texture=tex2, shading="phong"),
        ],
        light=light, sampling_mode="bilinear",
        raster_opts=dict(capacity=128),
    )

    assert np.array_equal(np.asarray(fb_a.depth), np.asarray(fb_b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(fb_a.color)), np.asarray(pack_srgb_u8(fb_b.color))
    )


def test_batched_matches_ref_path():
    # draw_meshes vs the plain jnp deferred path (transitively: the oracle).
    h, w = 48, 128
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    light = make_light((0.2, 0.7, 1.0), 0.2)
    cube = primitives.cube()
    tex = primitives.checkerboard(8, 2)
    m1 = jnp.asarray(m3.model_matrix((0, 0, -4.5), m3.rotate_y(0.9)))
    clear = jnp.asarray([0, 0, 0, 1], jnp.float32)

    fb_a = fblib.clear(fblib.create(h, w), clear)
    fb_a = draw_mesh(fb_a, cube, m1, proj, texture=tex, light=light,
                     shading="gouraud", sampling_mode="nearest", backend="ref")
    fb_b = fblib.clear(fblib.create(h, w), clear)
    fb_b = draw_meshes(fb_b, proj, [DrawSpec(cube, m1, texture=tex,
                                             shading="gouraud")],
                       light=light, sampling_mode="nearest",
                       raster_opts=dict(capacity=128))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(fb_a.color)), np.asarray(pack_srgb_u8(fb_b.color))
    )


def test_mixed_sampling_matches_sequential():
    """Per-draw sampling (DrawSpec.sampling) in ONE batched submission must match
    sequential fused draws with those modes byte-exactly (VERDICT r1 #8)."""
    h, w = 64, 128
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    tex1 = primitives.checkerboard(16, 4)
    tex2 = primitives.gradient_texture(8)
    cube = primitives.cube()
    sphere = primitives.uv_sphere(8, 12)
    m1 = jnp.asarray(m3.model_matrix((-0.5, 0, -5.0), m3.rotate_y(0.4)))
    m2 = jnp.asarray(m3.model_matrix((0.6, 0.2, -6.0), m3.rotate_y(1.1)))
    clear = jnp.asarray([0.03, 0.02, 0.08, 1], jnp.float32)

    fb_a = fblib.clear(fblib.create(h, w), clear)
    fb_a = draw_mesh(fb_a, cube, m1, proj, texture=tex1, light=light,
                     shading="gouraud", sampling_mode="nearest",
                     backend="fused", raster_opts=dict(capacity=128))
    fb_a = draw_mesh(fb_a, sphere, m2, proj, texture=tex2, light=light,
                     shading="phong", sampling_mode="bilinear",
                     backend="fused", raster_opts=dict(capacity=128))

    fb_b = fblib.clear(fblib.create(h, w), clear)
    fb_b = draw_meshes(
        fb_b, proj,
        [
            DrawSpec(cube, m1, texture=tex1, shading="gouraud",
                     sampling="nearest"),
            DrawSpec(sphere, m2, texture=tex2, shading="phong",
                     sampling="bilinear"),
        ],
        light=light, sampling_mode="bilinear",  # overridden per draw
        raster_opts=dict(capacity=128),
    )

    assert np.array_equal(np.asarray(fb_a.depth), np.asarray(fb_b.depth))
    assert np.array_equal(np.asarray(fb_a.color), np.asarray(fb_b.color))


def test_shared_texture_objects_dedup_in_lut():
    """The same texture object used by many DrawSpecs occupies ONE LUT region."""
    from dtrenderer_tpu.ops.render_fused import make_texture_lut

    tex = primitives.checkerboard(16, 4)
    lut, meta = make_texture_lut([tex, tex, tex])
    assert meta[0] == meta[1] == meta[2]
    assert lut.shape[1] == ((16 * 16 + 127) // 128) * 128


def test_large_texture_falls_back_and_renders_correctly():
    """A texture too big for the VMEM LUT must auto-route to the pallas+deferred
    path and still render (parity vs the ref backend), not fail Mosaic/assert."""
    h, w = 48, 128
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    light = make_light((0.2, 0.7, 1.0), 0.2)
    cube = primitives.cube()
    big = primitives.gradient_texture(1024)  # 1M texels > 256K budget
    m1 = jnp.asarray(m3.model_matrix((0, 0, -4.5), m3.rotate_y(0.9)))
    clear = jnp.asarray([0, 0, 0, 1], jnp.float32)

    fb_a = fblib.clear(fblib.create(h, w), clear)
    fb_a = draw_mesh(fb_a, cube, m1, proj, texture=big, light=light,
                     shading="gouraud", sampling_mode="bilinear", backend="ref")
    fb_b = fblib.clear(fblib.create(h, w), clear)
    fb_b = draw_mesh(fb_b, cube, m1, proj, texture=big, light=light,
                     shading="gouraud", sampling_mode="bilinear",
                     backend="fused")  # auto-falls back to pallas+deferred
    assert np.array_equal(np.asarray(fb_a.color), np.asarray(fb_b.color))

    # batched path: sequential fallback, still correct
    fb_c = fblib.clear(fblib.create(h, w), clear)
    fb_c = draw_meshes(fb_c, proj, [DrawSpec(cube, m1, texture=big)],
                       light=light, sampling_mode="bilinear")
    assert np.array_equal(np.asarray(fb_a.color), np.asarray(fb_c.color))
