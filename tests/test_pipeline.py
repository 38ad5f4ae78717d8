"""Full mesh-pipeline parity: draw_mesh (jnp deferred) vs MeshOracle (scalar forward).

Covers BASELINE configs 1-4 semantics at small resolutions: flat triangle, textured
cube (nearest), Gouraud + bilinear, per-pixel Phong. Final images compared at u8 ±1
(the ≤1-ULP-per-channel bar applied at the packed output).
"""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.pipeline import draw_mesh
from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.utils import math3d as m3
from dtrenderer_tpu.utils.color import pack_srgb_u8

import oracle
from oracle_pipeline import MeshOracle


def _run_both(mesh, model_np, proj_np, texture, color, shading, sampl,
              h, w, light_dir=(0.3, 0.5, 1.0), ambient=0.15, cull=True,
              clear=(0.05, 0.05, 0.1, 1.0), backend="ref"):
    from dtrenderer_tpu.ops.shading import make_light

    mvp_np = (proj_np @ model_np).astype(np.float32)
    fb = fblib.clear(fblib.create(h, w), jnp.asarray(clear, jnp.float32))
    fb = draw_mesh(
        fb,
        mesh,
        model=jnp.asarray(model_np),
        view_proj=jnp.asarray(proj_np),
        mvp=jnp.asarray(mvp_np),
        texture=texture,
        light=make_light(light_dir, ambient),
        color=color,
        shading=shading,
        sampling_mode=sampl,
        cull_backfaces=cull,
        backend=backend,
    )
    dev_color = np.asarray(fb.color)
    dev_depth = np.asarray(fb.depth)

    mo = MeshOracle(
        np.asarray(mesh.verts), np.asarray(mesh.uv), np.asarray(mesh.normals),
        np.asarray(mesh.faces), model_np.astype(np.float32), mvp_np,
        model_np.astype(np.float32),
        np.asarray(texture) if texture is not None else np.ones((1, 1, 4), np.float32),
        light_dir, ambient, color, shading, sampl, cull, h, w,
    )
    ref_color0 = np.broadcast_to(np.asarray(clear, np.float32), (h, w, 4)).copy()
    ref_depth0 = np.full((h, w), np.inf, np.float32)
    ref_color, ref_depth = mo.render(ref_color0, ref_depth0)
    return dev_color, dev_depth, ref_color, ref_depth


def _assert_images_close(dev_color, ref_color, max_u8_diff=1, max_bad=0):
    dev_u8 = np.asarray(pack_srgb_u8(jnp.asarray(dev_color))).astype(np.int32)
    ref_u8 = oracle.pack_srgb_u8(ref_color).astype(np.int32)
    diff = np.abs(dev_u8 - ref_u8)
    bad = (diff > max_u8_diff).sum()
    assert bad <= max_bad, (
        f"{bad} channels differ by >{max_u8_diff} (max diff {diff.max()})"
    )


def test_config1_flat_triangle():
    # Single flat-shaded triangle (BASELINE config 1 at reduced res).
    verts = np.array([[-0.6, -0.5, 0.0], [0.6, -0.4, 0.0], [0.0, 0.6, 0.0]],
                     np.float32)
    mesh = __import__("dtrenderer_tpu.models.mesh", fromlist=["make_mesh"]).make_mesh(
        verts, None, np.tile([[0, 0, 1]], (3, 1)).astype(np.float32),
        np.array([[0, 1, 2]], np.int32),
    )
    model = np.asarray(m3.translate([0, 0, -2.0]), np.float32)
    proj = np.asarray(m3.perspective(np.pi / 3, 80 / 60, 0.1, 50.0), np.float32)
    dev_c, dev_z, ref_c, ref_z = _run_both(
        mesh, model, proj, None, (0.9, 0.3, 0.2, 1.0), "flat", "nearest", 60, 80
    )
    assert np.isfinite(dev_z).any(), "triangle rendered nothing"
    _assert_images_close(dev_c, ref_c)


def test_config2_textured_cube_nearest():
    mesh = primitives.cube()
    tex = primitives.checkerboard(32, 8, (1.0, 0.8, 0.2, 1.0), (0.1, 0.1, 0.4, 1.0))
    model = np.asarray(
        m3.model_matrix((0, 0, -4.5), m3.rotate_y(0.7) @ m3.rotate_x(0.5)), np.float32
    )
    proj = np.asarray(m3.perspective(np.pi / 3, 80 / 64, 0.1, 50.0), np.float32)
    dev_c, dev_z, ref_c, ref_z = _run_both(
        mesh, model, proj, tex, (1.0, 1.0, 1.0, 1.0), "flat", "nearest", 64, 80
    )
    cov = np.isfinite(np.asarray(dev_z)).mean()
    assert cov > 0.1, "cube too small / missing"
    _assert_images_close(dev_c, ref_c)


def test_config3_gouraud_bilinear_sphere():
    mesh = primitives.uv_sphere(8, 12)
    tex = primitives.gradient_texture(32)
    model = np.asarray(
        m3.model_matrix((0, 0, -3.5), m3.rotate_y(0.3)), np.float32
    )
    proj = np.asarray(m3.perspective(np.pi / 3, 72 / 56, 0.1, 50.0), np.float32)
    dev_c, dev_z, ref_c, ref_z = _run_both(
        mesh, model, proj, tex, (1.0, 1.0, 1.0, 1.0), "gouraud", "bilinear", 56, 72
    )
    _assert_images_close(dev_c, ref_c)


def test_config4_phong_cube():
    mesh = primitives.cube()
    model = np.asarray(
        m3.model_matrix((0.2, -0.1, -4.0), m3.rotate_y(0.9) @ m3.rotate_x(0.3)),
        np.float32,
    )
    proj = np.asarray(m3.perspective(np.pi / 3, 64 / 48, 0.1, 50.0), np.float32)
    dev_c, dev_z, ref_c, ref_z = _run_both(
        mesh, model, proj, None, (0.7, 0.7, 0.9, 1.0), "phong", "nearest", 48, 64
    )
    _assert_images_close(dev_c, ref_c)


def test_two_meshes_depth_merge():
    # Two overlapping cubes drawn in separate calls: cross-draw-call z-test.
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.ops import fb as fblib2

    mesh = primitives.cube()
    h, w = 48, 64
    proj = np.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0), np.float32)
    models = [
        np.asarray(m3.model_matrix((-0.5, 0, -5.0), m3.rotate_y(0.4)), np.float32),
        np.asarray(m3.model_matrix((0.6, 0.2, -6.0), m3.rotate_y(1.1)), np.float32),
    ]
    colors = [(0.9, 0.2, 0.2, 1.0), (0.2, 0.9, 0.3, 1.0)]

    fb = fblib2.clear(fblib2.create(h, w), jnp.asarray([0, 0, 0, 1], jnp.float32))
    ref_c = np.zeros((h, w, 4), np.float32)
    ref_c[..., 3] = 1.0
    ref_z = np.full((h, w), np.inf, np.float32)
    for model, col in zip(models, colors):
        mvp = (proj @ model).astype(np.float32)
        fb = draw_mesh(
            fb, mesh, model=jnp.asarray(model), view_proj=jnp.asarray(proj),
            mvp=jnp.asarray(mvp), color=col, shading="gouraud",
            light=make_light((0.3, 0.5, 1.0), 0.15),
        )
        mo = MeshOracle(
            np.asarray(mesh.verts), np.asarray(mesh.uv), np.asarray(mesh.normals),
            np.asarray(mesh.faces), model, mvp, model,
            np.ones((1, 1, 4), np.float32), (0.3, 0.5, 1.0), 0.15, col,
            "gouraud", "nearest", True, h, w,
        )
        ref_c, ref_z = mo.render(ref_c, ref_z)
    _assert_images_close(np.asarray(fb.color), ref_c)
