"""The five BASELINE benchmark scenes + the demo scene, as jittable frame functions.

These are the rebuild's analog of the reference's demo app content (SURVEY.md §2 #3)
AND its benchmark suite (BASELINE.md configs):
  1. single flat-shaded triangle, 800x600
  2. textured spinning cube, z-buffered, nearest, 800x600
  3. ~5k-tri OBJ (data/head.obj), Gouraud + bilinear
  4. multi-mesh, perspective-correct + per-pixel Phong, 1080p
  5. 1M-triangle stress soup, tiled raster, 4K (shard across the device mesh)

Each make_configN() returns a SceneSpec whose frame(color, depth, t) is pure and
jittable (the DTR_Update analog).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.models import primitives
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.ops.fb import Framebuffer
from dtrenderer_tpu.ops.pipeline import draw_mesh
from dtrenderer_tpu.ops.shading import make_light
from dtrenderer_tpu.utils import math3d as m3

F32 = jnp.float32

_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)


class SceneSpec(NamedTuple):
    name: str
    width: int
    height: int
    n_tris: int
    frame: Callable  # frame(color, depth, t) -> (color, depth)
    # optional pre-flight binning audit () -> (overflow, max_count, capacity);
    # benchmarks must assert overflow == 0 before trusting timings
    audit: Callable | None = None
    # optional banded/sharded pre-flight: (n_bands) -> pipeline.audit_bands
    # report dict (per-band triangle/pair counts vs the shard/pair budgets)
    bands_audit: Callable | None = None


def _clear(color, depth, rgba):
    return fblib.clear(Framebuffer(color, depth), jnp.asarray(rgba, F32))


def _head_mesh():
    from dtrenderer_tpu.assets.obj import load_obj

    return load_obj(os.path.join(_DATA_DIR, "head.obj"))


def _head_texture():
    from dtrenderer_tpu.assets.image import load_bitmap

    path = os.path.join(_DATA_DIR, "texture.png")
    if os.path.exists(path):
        return load_bitmap(path)
    return primitives.gradient_texture(128)


def make_config1(width=800, height=600, backend="fused") -> SceneSpec:
    """Single flat-shaded triangle into an 800x600 RGBA framebuffer."""
    verts = np.array(
        [[-0.7, -0.6, 0.0], [0.7, -0.5, 0.0], [0.0, 0.7, 0.0]], np.float32
    )
    from dtrenderer_tpu.models.mesh import make_mesh

    mesh = make_mesh(verts, None, np.tile([[0.0, 0.0, 1.0]], (3, 1)),
                     np.array([[0, 1, 2]], np.int32))
    proj = jnp.asarray(m3.perspective(np.pi / 3, width / height, 0.1, 50.0))
    light = make_light((0.0, 0.0, 1.0), 0.2)

    def frame(color, depth, t, y_offset=0, frame_height=None,
              frame_width=None, x_offset=0):
        fb = _clear(color, depth, [0.05, 0.05, 0.08, 1.0])
        mdl = m3.model_matrix((0.0, 0.0, -2.0), m3.rotate_z(t * 0.5))
        fb = draw_mesh(fb, mesh, mdl, proj, color=(0.9, 0.35, 0.2, 1.0),
                       light=light, shading="flat", backend=backend,
                       y_offset=y_offset, x_offset=x_offset,
                       frame_height=frame_height, frame_width=frame_width)
        return fb.color, fb.depth

    return SceneSpec("config1_flat_triangle", width, height, 1, frame)


def make_config2(width=800, height=600, backend="fused") -> SceneSpec:
    """Textured spinning cube, z-buffered, nearest-neighbor sampling."""
    mesh = primitives.cube()
    tex = primitives.checkerboard(64, 8, (1.0, 0.85, 0.3, 1.0),
                                  (0.15, 0.15, 0.5, 1.0))
    proj = jnp.asarray(m3.perspective(np.pi / 3, width / height, 0.1, 50.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)

    def frame(color, depth, t, y_offset=0, frame_height=None,
              frame_width=None, x_offset=0):
        fb = _clear(color, depth, [0.05, 0.05, 0.08, 1.0])
        mdl = m3.model_matrix((0, 0, -4.5),
                              m3.mat4mul(m3.rotate_y(t), m3.rotate_x(t * 0.6)))
        fb = draw_mesh(fb, mesh, mdl, proj, texture=tex, light=light,
                       shading="flat", sampling_mode="nearest", backend=backend,
                       y_offset=y_offset, x_offset=x_offset,
                       frame_height=frame_height, frame_width=frame_width)
        return fb.color, fb.depth

    return SceneSpec("config2_textured_cube", width, height, mesh.num_tris, frame)


def make_config3(width=800, height=600, backend="fused") -> SceneSpec:
    """~5k-tri OBJ mesh with Gouraud shading + bilinear textures."""
    mesh = _head_mesh()
    tex = _head_texture()
    proj = jnp.asarray(m3.perspective(np.pi / 3, width / height, 0.1, 50.0))
    light = make_light((0.5, 0.4, 1.0), 0.12)

    def frame(color, depth, t, y_offset=0, frame_height=None,
              frame_width=None, x_offset=0):
        fb = _clear(color, depth, [0.04, 0.05, 0.09, 1.0])
        mdl = m3.model_matrix((0, 0, -2.6), m3.rotate_y(t), 1.2)
        fb = draw_mesh(fb, mesh, mdl, proj, texture=tex, light=light,
                       shading="gouraud", sampling_mode="bilinear",
                       backend=backend, y_offset=y_offset, x_offset=x_offset,
                       frame_height=frame_height, frame_width=frame_width)
        return fb.color, fb.depth

    return SceneSpec("config3_obj_gouraud", width, height, mesh.num_tris, frame)


def make_config4(width=1920, height=1080, backend="fused") -> SceneSpec:
    """Multi-mesh scene, perspective-correct UVs + per-pixel Phong at 1080p."""
    head = _head_mesh()
    cube = primitives.cube()
    sphere = primitives.uv_sphere(24, 32)
    tex = _head_texture()
    checker = primitives.checkerboard(64, 8)
    proj = jnp.asarray(m3.perspective(np.pi / 3, width / height, 0.1, 100.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    n_tris = head.num_tris + cube.num_tris + sphere.num_tris * 2

    def frame(color, depth, t, y_offset=0, frame_height=None,
              frame_width=None, x_offset=0):
        from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_meshes

        fb = _clear(color, depth, [0.03, 0.03, 0.06, 1.0])
        specs = [
            DrawSpec(head, m3.model_matrix((-1.3, 0.1, -3.0), m3.rotate_y(t), 1.3),
                     texture=tex, shading="phong"),
            DrawSpec(cube, m3.model_matrix((1.5, -0.3, -4.6),
                                           m3.mat4mul(m3.rotate_y(t * 0.8), m3.rotate_x(0.4))),
                     texture=checker, shading="phong"),
            DrawSpec(sphere, m3.model_matrix((0.6, 1.0, -5.5),
                                             m3.rotate_y(t * 0.5), 1.1),
                     color=(0.8, 0.5, 0.9, 1.0), shading="phong"),
            DrawSpec(sphere, m3.model_matrix((-0.4, -1.0, -6.0), m3.rotate_y(-t),
                                             1.4),
                     color=(0.4, 0.9, 0.6, 1.0), shading="phong"),
        ]
        if backend == "fused":
            # one batched fused submission (bit-identical to sequential draws)
            fb = draw_meshes(fb, proj, specs, light=light,
                             sampling_mode="bilinear", y_offset=y_offset,
                             x_offset=x_offset, frame_height=frame_height,
                             frame_width=frame_width)
        else:
            for s in specs:
                fb = draw_mesh(fb, s.mesh, s.model, proj, texture=s.texture,
                               color=s.color, light=light, shading=s.shading,
                               sampling_mode="bilinear", backend=backend,
                               x_offset=x_offset,
                               y_offset=y_offset, frame_height=frame_height,
                               frame_width=frame_width)
        return fb.color, fb.depth

    return SceneSpec("config4_multimesh_phong", width, height, n_tris, frame)


def make_config5(width=3840, height=2160, n_tris=1_000_000, backend="fused",
                 capacity=1536, extra_opts: dict | None = None) -> SceneSpec:
    """1M-triangle stress soup at 4K (per-shard use via parallel/shard.py).

    extra_opts: raster_opts overrides merged on top of the production
    settings (tuning sweeps, row_bands for the banded/sharded measurement).
    The audit() hook audits whatever the merged opts are."""
    soup = primitives.random_triangle_soup(n_tris, rng_seed=11, extent=1.6)
    tex = primitives.gradient_texture(64)
    proj = jnp.asarray(m3.perspective(np.pi / 3, width / height, 0.1, 50.0))
    light = make_light((0.3, 0.5, 1.0), 0.2)

    def make_opts():
        # pair_budget: real (tile,tri) pairs ~0.95M for this soup at t=0.5;
        # 1.4x n_tris is audited headroom (misses are COUNTED; bench asserts
        # zero overflow). flat_bins: the kernel DMAs per-tile rows of the
        # sorted-prefix table straight from HBM — no dense setup assembly
        # (4K frame 243 -> ~205 ms, tools/profile_4k.py attribution).
        opts = (dict(capacity=capacity, small_span=8,
                     pair_budget=int(1.4 * n_tris))
                if backend in ("pallas", "fused") else None)
        if backend == "fused":
            # tools/bench_4k.py sweep: cols=2; chunk 32: fewer phase-1 loop
            # iterations wins at ~900-count bins (151 vs 155 ms phase-1;
            # chunk 8 is 178 — profile_4k sweep)
            opts.update(chunk=32, use_ybounds=False, cols=2, flat_bins=True)
        if opts is not None and extra_opts:
            opts.update(extra_opts)
        if opts is not None and int(opts.get("row_bands", 1) or 1) > 1:
            # SHARED cross-band binning covers count banded-grid rows over
            # the FULL frame, so a triangle straddling a band boundary gains
            # a row: ~2.4x more triangles cross small_span than unbanded
            # (59 -> ~143 broads at t=0.5 — caught by bands_audit, round 5).
            # Broad-block cost scales with the ACTUAL broad count, not the
            # cap, so headroom is cheap.
            opts.setdefault("broad_cap", 512)
        return opts

    def frame(color, depth, t, y_offset=0, frame_height=None,
              frame_width=None, x_offset=0, return_counters=False):
        fb = _clear(color, depth, [0.02, 0.02, 0.04, 1.0])
        mdl = m3.model_matrix((0, 0, -2.8), m3.rotate_y(t * 0.3))
        # tile_h=32/cap1536 audited zero-overflow for 1M tris at 4K (max bin
        # count 1228; smaller tiles or small_span 4 flood the broad list —
        # 12.8k-197k broads vs cap 128, tools/profile_4k.py audit).
        res = draw_mesh(fb, soup, mdl, proj, texture=tex, light=light,
                        shading="gouraud", sampling_mode="nearest",
                        backend=backend, y_offset=y_offset, x_offset=x_offset,
                        frame_height=frame_height, frame_width=frame_width,
                        raster_opts=make_opts(),
                        near_clip=False,  # soup never crosses the near plane
                        return_counters=return_counters)
        if return_counters:
            fb, counters = res
            # render-time drop check for modes the host audit cannot cover
            # exactly (banded tile grids realign per band)
            return fb.color, fb.depth, counters.bin_overflow
        return res.color, res.depth

    def audit():
        from dtrenderer_tpu.ops.pipeline import DrawSpec, audit_scene

        mdl = m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.5 * 0.3))
        return audit_scene(
            proj, [DrawSpec(soup, mdl, texture=tex, shading="gouraud")],
            height, width, light=light, near_clip=False,
            raster_opts=make_opts() or {},
        )

    def bands_audit(n_bands: int):
        from dtrenderer_tpu.ops.pipeline import DrawSpec, audit_bands

        mdl = m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.5 * 0.3))
        return audit_bands(
            proj, [DrawSpec(soup, mdl, texture=tex, shading="gouraud")],
            height, width, n_bands, light=light, near_clip=False,
            raster_opts=make_opts() or {},
        )

    return SceneSpec("config5_1m_tri_4k", width, height, n_tris, frame, audit,
                     bands_audit)


ALL_CONFIGS = {
    1: make_config1,
    2: make_config2,
    3: make_config3,
    4: make_config4,
    5: make_config5,
}
