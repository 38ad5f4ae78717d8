"""Near-plane clipping tests (geometry.clip_near + pipeline integration).

The reference has no clipping stage (SURVEY.md CS-2); geometry crossing the camera
plane simply breaks. Here: triangles clip 1->2 statically, fully-in-front geometry is
bit-identical with clipping on or off, and a camera inside a box still sees walls.
"""

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops import fb as fblib, geometry
from dtrenderer_tpu.ops.pipeline import draw_mesh
from dtrenderer_tpu.utils import math3d as m3
from dtrenderer_tpu.utils.color import pack_srgb_u8


def test_clip_near_counts():
    eps = 1e-4
    # one corner behind (w < eps): 2 output tris
    c = jnp.asarray([[[0, 0, 0, 1.0], [1, 0, 0, 1.0], [0, 1, 0, -0.5]]], jnp.float32)
    a = jnp.zeros((1, 3, 9), jnp.float32)
    c2, a2, v2 = geometry.clip_near(c, a)
    assert np.asarray(v2).tolist() == [[True, True]]
    # two corners behind: 1 output tri
    c = jnp.asarray([[[0, 0, 0, 1.0], [1, 0, 0, -1.0], [0, 1, 0, -0.5]]], jnp.float32)
    c2, a2, v2 = geometry.clip_near(c, a)
    assert np.asarray(v2).tolist() == [[True, False]]
    # all behind: none
    c = jnp.asarray([[[0, 0, 0, -1.0], [1, 0, 0, -1.0], [0, 1, 0, -0.5]]], jnp.float32)
    c2, a2, v2 = geometry.clip_near(c, a)
    assert np.asarray(v2).tolist() == [[False, False]]
    # all in front: slot0 == input exactly
    c = jnp.asarray([[[0, 0, 0, 1.0], [1, 0, 0, 2.0], [0, 1, 0, 0.5]]], jnp.float32)
    c2, a2, v2 = geometry.clip_near(c, a)
    assert np.asarray(v2).tolist() == [[True, False]]
    assert np.array_equal(np.asarray(c2)[0, 0], np.asarray(c)[0])


def test_clip_attrs_interpolated():
    # attr varies 0 -> 1 along the edge that crosses the plane; at w=eps the
    # lerped attr must equal the crossing parameter t.
    eps = float(geometry.NEAR_EPS)
    wA, wB = 1.0, -1.0
    t = (eps - wA) / (wB - wA)
    c = jnp.asarray([[[0, 0, 0, wA], [2, 0, 0, wB], [0, 2, 0, wA]]], jnp.float32)
    a = jnp.zeros((1, 3, 9), jnp.float32).at[0, 1, 0].set(1.0)  # attr=1 at corner B
    c2, a2, v2 = geometry.clip_near(c, a)
    # cnt==2 rotates so the outside vertex (B) is corner 2; slot0 then is
    # (C, A, AB') with the intersection AB' at corner 2.
    got_w = float(np.asarray(c2)[0, 0, 2, 3])
    got_attr = float(np.asarray(a2)[0, 0, 2, 0])
    assert abs(got_w - eps) < 1e-6
    assert abs(got_attr - t) < 1e-5


def _render(mesh, model, proj, backend, clip, h=64, w=128, cull=True):
    fb = fblib.clear(fblib.create(h, w), jnp.asarray([0, 0, 0, 1], jnp.float32))
    return draw_mesh(
        fb, mesh, model, proj, shading="gouraud", backend=backend,
        color=(0.8, 0.4, 0.3, 1.0), cull_backfaces=cull, near_clip=clip,
        raster_opts=dict(capacity=128) if backend == "fused" else None,
    )


def test_clip_noop_for_front_geometry():
    # Fully-in-front scene: clipping on == clipping off, bit-exact.
    mesh = primitives.cube()
    model = jnp.asarray(m3.model_matrix((0, 0, -4.0), m3.rotate_y(0.7)))
    proj = jnp.asarray(m3.perspective(np.pi / 3, 2.0, 0.1, 50.0))
    a = _render(mesh, model, proj, "ref", clip=False)
    b = _render(mesh, model, proj, "ref", clip=True)
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))


def test_camera_inside_box_sees_walls():
    # Camera at the center of a box: every wall triangle crosses/straddles the
    # near plane region behind the camera. Without clipping nothing renders;
    # with clipping the interior is visible.
    mesh = primitives.cube()
    model = jnp.asarray(m3.scale(3.0))  # camera at origin INSIDE the 6-unit box
    proj = jnp.asarray(m3.perspective(np.pi / 2, 2.0, 0.05, 50.0))
    # interior faces are the BACK faces -> disable culling
    off = _render(mesh, model, proj, "ref", clip=False, cull=False)
    on = _render(mesh, model, proj, "ref", clip=True, cull=False)
    cov_off = np.isfinite(np.asarray(off.depth)).mean()
    cov_on = np.isfinite(np.asarray(on.depth)).mean()
    assert cov_on > 0.95, f"interior not visible with clipping: {cov_on}"
    assert np.isfinite(np.asarray(on.color)).all()
    assert cov_off < cov_on  # without clipping, straddling walls are dropped


def test_clip_fused_matches_ref():
    # Geometry straddling the near plane: fused and ref backends agree.
    mesh = primitives.cube()
    model = jnp.asarray(m3.model_matrix((0.3, 0.1, -1.2), m3.rotate_y(0.5), 1.4))
    proj = jnp.asarray(m3.perspective(np.pi / 2, 2.0, 0.2, 50.0))
    a = _render(mesh, model, proj, "ref", clip=True, cull=False)
    b = _render(mesh, model, proj, "fused", clip=True, cull=False)
    assert np.isfinite(np.asarray(a.depth)).sum() > 100, "nothing rendered"
    assert np.array_equal(np.asarray(a.depth), np.asarray(b.depth))
    assert np.array_equal(
        np.asarray(pack_srgb_u8(a.color)), np.asarray(pack_srgb_u8(b.color))
    )
