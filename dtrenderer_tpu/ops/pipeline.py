"""The 3D draw-call pipeline: vertex transform -> setup -> visibility raster ->
deferred shade/blend.

TPU-native counterpart of the reference's `DTRRender_Mesh` + `DTRRender_Triangle`
(SURVEY.md CS-2). The reference shades inside the per-pixel z-test loop; on TPU the
pipeline is split into a visibility pass (raster_ref / raster_pallas -> depth + winning
triangle id per pixel) and a deferred pass that gathers the winning triangle's attribute
planes, recomputes barycentrics with the shared coverage evaluator, interpolates
perspective-correctly, samples the texture, applies lighting, and blends — all fused
elementwise/gather work that XLA maps onto the VPU. Because the winning fragment is
unique per pixel, the two-phase split is exactly equivalent to the reference's
forward loop for opaque geometry (FORMULAS.md depth/interp contracts).

Attribute-plane layout f32 [T, 3, 16] (corner-major; all attrs premultiplied by q):
  0:q  1:u*q 2:v*q  3:r*q 4:g*q 5:b*q 6:a*q  7:nx*q 8:ny*q 9:nz*q  10..15: pad
(colors are premultiplied-alpha linear; for flat/gouraud the light term is baked into
the corner colors, for phong the normal channels drive per-pixel lighting.)
"""

from __future__ import annotations

import jax.numpy as jnp

from dtrenderer_tpu.ops import geometry, sampling
from dtrenderer_tpu.ops.fb import Framebuffer
from dtrenderer_tpu.ops.geometry import coverage_and_depth, interp
from dtrenderer_tpu.ops.raster_ref import rasterize_ref
from dtrenderer_tpu.ops.shading import (
    SHADING_FLAT,
    SHADING_GOURAUD,
    SHADING_NONE,
    SHADING_PHONG,
    Light,
    apply_light,
    light_term,
)
from dtrenderer_tpu.utils.color import blend_over
from dtrenderer_tpu.utils.math3d import (
    homogenize, mat4mul, transform_directions, transform_points,
)

F32 = jnp.float32

ATTR_CHANNELS = 16


def _faces_are_trivial(faces, n_verts: int) -> bool:
    """True when faces is concretely arange(n_verts).reshape(-1, 3) — an
    unshared-vertex triangle soup, for which table[faces] is a reshape.
    Runs at trace time only (host-side comparison, ~1 ms for 1M faces)."""
    import numpy as np

    if faces.shape[0] * 3 != n_verts:
        return False
    try:
        fa = np.asarray(faces)  # raises on tracers
    except Exception:
        return False
    return bool((fa.ravel() == np.arange(n_verts, dtype=fa.dtype)).all())


def gather_corner_data(mesh, model, mvp, normal_mat, light: Light, color,
                       shading: str):
    """Per-corner clip positions [T,3,4] + raw (NOT q-premultiplied) attributes
    [T, 3, 9]: u, v, r, g, b, a (lit per mode), nx, ny, nz — linear in world
    space, so they clip-lerp exactly (geometry.clip_near).

    Everything per-vertex is computed FIRST (clip transform, Gouraud lighting)
    and fetched with ONE wide [T, 3, D] row gather: XLA TPU row-gathers pay a
    fixed per-row cost, so one wide gather beats 3-4 narrow ones ~3x (this was
    the single largest cost of a high-triangle-count frame). Per-vertex
    compute-then-gather is bit-identical to gather-then-compute — the moved
    ops (light_term, apply_light) are elementwise."""
    faces = mesh.faces
    color = jnp.asarray(color, F32)
    clip4 = transform_points(homogenize(mesh.verts), mvp)  # [N, 4]
    N = clip4.shape[0]

    cols = [clip4, mesh.uv]  # 4 + 2
    if shading == SHADING_FLAT:
        world = transform_points(homogenize(mesh.verts), model)[..., :3]
        cols.append(world)  # 3: face normal needs world-space corners
    elif shading == SHADING_GOURAUD:
        wnormals = transform_directions(mesh.normals, normal_mat)
        vterm = light_term(wnormals, light)  # [N]
        cols.append(apply_light(jnp.broadcast_to(color, (N, 4)), vterm))  # 4
    elif shading == SHADING_PHONG:
        cols.append(transform_directions(mesh.normals, normal_mat))  # 3
    elif shading != SHADING_NONE:
        raise ValueError(f"unknown shading mode {shading!r}")

    table = jnp.concatenate(cols, axis=-1)
    if _faces_are_trivial(faces, N):
        # Triangle soup (unshared vertices, faces == arange): the gather is a
        # pure reshape — saves the whole [3T]-row gather (~10 ns/row on TPU).
        g = table.reshape(faces.shape[0], 3, table.shape[-1])
    else:
        g = table[faces]  # [T, 3, D] — THE gather
    corners_clip = g[..., 0:4]
    uv = g[..., 4:6]

    T = faces.shape[0]
    zeros3 = jnp.zeros((T, 3, 3), F32)
    if shading == SHADING_FLAT:
        w0, w1, w2 = g[:, 0, 6:9], g[:, 1, 6:9], g[:, 2, 6:9]
        face_n = jnp.cross(w1 - w0, w2 - w0)
        term = light_term(face_n, light)
        corner_rgba = apply_light(jnp.broadcast_to(color, (T, 3, 4)),
                                  term[:, None])
        nq = zeros3
    elif shading == SHADING_GOURAUD:
        corner_rgba = g[..., 6:10]
        nq = zeros3
    elif shading == SHADING_PHONG:
        corner_rgba = jnp.broadcast_to(color, (T, 3, 4))
        nq = g[..., 6:9]
    else:  # SHADING_NONE
        corner_rgba = jnp.broadcast_to(color, (T, 3, 4))
        nq = zeros3

    raw = jnp.concatenate([uv, corner_rgba, nq], axis=-1)  # [T, 3, 9]
    return corners_clip, raw


def corner_attrs_with_q(screen_corners, raw):
    """[T,3,10] q-premultiplied channels (q, u*q, v*q, rgba*q, n*q) from raw
    per-corner attrs + per-corner screen q. Same op order as build_attrs."""
    q = screen_corners[..., 3:4]  # [T, 3, 1]
    return jnp.concatenate(
        [q, raw[..., 0:2] * q, raw[..., 2:6] * q, raw[..., 6:9] * q], axis=-1
    )


def prepare_draw(mesh, model, view_proj, mvp, normal_mat, light, color,
                 shading, frame_w, frame_h, cull_backfaces=True,
                 near_clip=True):
    """Shared geometry stage for all backends: transform, (optionally) clip
    against the near plane, viewport, triangle setup, q-premultiplied corner
    attrs. Returns (setup TriSetup, attrs10 [T',3,10]) where T' = 2T when
    clipping (slot-1 triangles only valid for clipped geometry)."""
    corners_clip, raw = gather_corner_data(
        mesh, model, mvp, normal_mat, light, color, shading)

    if near_clip:
        clip2, attrs2, valid2 = geometry.clip_near(corners_clip, raw)
        Tp = corners_clip.shape[0] * 2
        corners_clip = clip2.reshape(Tp, 3, 4)
        raw = attrs2.reshape(Tp, 3, 9)
        pre_valid = valid2.reshape(Tp)
    else:
        pre_valid = None

    screen_c = geometry.corners_to_screen(corners_clip, frame_w, frame_h)
    setup = geometry.triangle_setup_from_corners(
        screen_c[:, 0], screen_c[:, 1], screen_c[:, 2],
        frame_w, frame_h, cull_backfaces,
    )
    if pre_valid is not None:
        setup = setup._replace(valid=setup.valid & pre_valid)
    attrs10 = corner_attrs_with_q(screen_c, raw)
    return setup, attrs10


def shade_deferred(
    fb: Framebuffer,
    z,
    tri,
    coef,
    attrs,
    texture,
    sampling_mode: str,
    shading_mode: str,
    light: Light,
    y_offset=0,
    x_offset=0,
):
    """Deferred pass: shade winning fragments and merge into the framebuffer."""
    h, w = fb.depth.shape
    win = (tri >= 0) & (z < fb.depth)
    t = jnp.maximum(tri, 0)

    # ONE embedding-style row gather of all per-triangle data: XLA TPU lowers
    # [T, 64]-row lookups ~8x faster than separate [T,16]/[T,3,16] gathers.
    T = coef.shape[0]
    table = jnp.concatenate([coef, attrs.reshape(T, 48)], axis=1)  # [T, 64]
    g = table[t.reshape(-1)].reshape(h, w, 64)
    c = g[..., :16]            # [H, W, 16]
    a = g[..., 16:].reshape(h, w, 3, ATTR_CHANNELS)

    px = (jnp.arange(w, dtype=F32) + (F32(0.5) + jnp.asarray(x_offset, F32)))[None, :]
    py = (jnp.arange(h, dtype=F32) + (F32(0.5) + jnp.asarray(y_offset, F32)))[:, None]
    _, _, b = coverage_and_depth(c, px, py)
    b = tuple(bb[..., None] for bb in b)
    ip = interp(b, a[:, :, 0, :], a[:, :, 1, :], a[:, :, 2, :])  # [H, W, 16]

    qf = ip[..., 0]
    inv_qf = F32(1.0) / jnp.where(qf != 0, qf, F32(1.0))
    u = ip[..., 1] * inv_qf
    v = ip[..., 2] * inv_qf
    rgba = ip[..., 3:7] * inv_qf[..., None]

    texel = sampling.sample(texture, u, v, sampling_mode)
    src = texel * rgba

    if shading_mode == SHADING_PHONG:
        n = ip[..., 7:10] * inv_qf[..., None]
        term = light_term(n, light)
        src = apply_light(src, term)

    blended = blend_over(src, fb.color)
    new_color = jnp.where(win[..., None], blended, fb.color)
    new_depth = jnp.where(win, z, fb.depth)
    return Framebuffer(color=new_color, depth=new_depth)


def draw_mesh(
    fb: Framebuffer,
    mesh,
    model,
    view_proj,
    texture=None,
    light: Light | None = None,
    color=(1.0, 1.0, 1.0, 1.0),
    shading: str = SHADING_GOURAUD,
    sampling_mode: str = "nearest",
    cull_backfaces: bool = True,
    normal_mat=None,
    backend: str = "ref",
    mvp=None,
    frame_height=None,
    frame_width=None,
    y_offset=0,
    x_offset=0,
    raster_opts: dict | None = None,
    return_counters: bool = False,
    near_clip: bool = True,
):
    """Render one mesh draw call into the framebuffer (DTRRender_Mesh analog).

    model: [4,4] model->world; view_proj: [4,4] world->clip. normal_mat defaults to
    the model upper-3x3 (exact for rigid + uniform scale; pass inverse-transpose for
    non-uniform scales). backend: "ref" (pure jnp) or "pallas" (tiled kernel).

    When fb is a shard (a band/tile of a larger frame, parallel/shard.py), pass the
    FULL frame dims via frame_height/frame_width (static) and this shard's origin via
    y_offset/x_offset (traced scalars ok): the viewport transform uses the full-frame
    dims while rasterization/shading cover only this shard's pixels.
    """
    from dtrenderer_tpu.ops.shading import make_light

    h, w = fb.depth.shape
    fh = frame_height if frame_height is not None else h
    fw = frame_width if frame_width is not None else w
    if light is None:
        light = make_light()
    textured = texture is not None
    if texture is None:
        texture = jnp.ones((1, 1, 4), F32)
    if normal_mat is None:
        normal_mat = model

    if backend == "fused":
        # VMEM budget: the fused kernel keeps the whole texture LUT in VMEM
        # (~16 MB/core). Oversized textures route to the pallas visibility
        # kernel + deferred shading (HBM texture gathers) automatically.
        from dtrenderer_tpu.ops.render_fused import TEX_BUDGET_TEXELS

        if int(texture.shape[0]) * int(texture.shape[1]) > TEX_BUDGET_TEXELS:
            backend = "pallas"
            raster_opts = {
                k: v for k, v in (raster_opts or {}).items()
                if k not in ("chunk", "cols", "skip_shading", "shard_budget",
                             "use_ybounds", "batch_rows", "pair_budget",
                             "flat_bins", "row_bands", "mid_cap",
                             "flat_slabs", "slot_k")
            }

    if mvp is None:
        mvp = mat4mul(view_proj, model)
    setup, attrs10 = prepare_draw(
        mesh, model, view_proj, mvp, normal_mat, light, color, shading,
        fw, fh, cull_backfaces, near_clip,
    )

    if backend == "fused":
        # Single fused Pallas kernel: visibility + interpolation + texture +
        # lighting per tile (ops/render_fused.py); only blend/depth-merge stay
        # in XLA. Fastest path; formulas identical to the deferred path. The
        # payload layout is the minimal bit-exact channel set for this draw
        # (render_fused.plan_layout): untextured draws ship no uv/texmeta,
        # white phong draws no rgba, non-phong no normals.
        from dtrenderer_tpu.ops.render_fused import (
            dummy_texture_lut, make_texture_lut, pack_flags, pack_payload,
            plan_layout, render_fused,
        )

        if textured:
            tex_lut, meta = make_texture_lut([texture])
        else:
            tex_lut, meta = dummy_texture_lut(), [(0, 1, 1)]
        is_phong = shading == SHADING_PHONG
        feats = [dict(
            textured=textured, phong=is_phong,
            corner_rgba_is_q=(_host_white(color)
                              and shading in (SHADING_PHONG, SHADING_NONE)),
            corner_rgba_mono=_host_gray_opaque(color),
            meta=meta[0],
        )]
        layout = plan_layout(feats, mixed_sampling=False)
        flags = pack_flags(is_phong, sampling_mode == "bilinear")
        payload = pack_payload(attrs10, layout, meta[0], flags)
        z, src, overflow = _render_fused_banded(
            setup.coef, setup.bbox, setup.valid, payload, tex_lut,
            light, h, w, y_offset, x_offset, fh, fw,
            bilinear=(sampling_mode == "bilinear") and layout.has_uv,
            with_phong=is_phong, layout=layout, raster_opts=raster_opts,
        )
        win = z < fb.depth
        blended = blend_over(src, fb.color)
        out = Framebuffer(
            color=jnp.where(win[..., None], blended, fb.color),
            depth=jnp.where(win, z, fb.depth),
        )
        if not return_counters:
            return out
        from dtrenderer_tpu.debug import FrameCounters

        return out, FrameCounters(
            tris_submitted=jnp.int32(setup.coef.shape[0]),
            tris_valid=jnp.sum(setup.valid.astype(jnp.int32)),
            pixels_shaded=jnp.sum(win.astype(jnp.int32)),
            bin_overflow=overflow,
        )

    if backend == "ref":
        z, tri = rasterize_ref(
            setup.coef, setup.valid, h, w, y_offset=y_offset, x_offset=x_offset
        )
        overflow = jnp.zeros((), jnp.int32)  # ref path never bins
    elif backend == "pallas":
        from dtrenderer_tpu.ops.raster_pallas import rasterize_pallas

        z, tri, overflow = rasterize_pallas(
            setup.coef, setup.bbox, setup.valid, h, w,
            y_offset=y_offset, x_offset=x_offset, **(raster_opts or {}),
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    Tp = attrs10.shape[0]
    attrs16 = jnp.concatenate(
        [attrs10, jnp.zeros((Tp, 3, ATTR_CHANNELS - 10), F32)], axis=-1
    )
    out = shade_deferred(
        fb, z, tri, setup.coef, attrs16, texture, sampling_mode, shading, light,
        y_offset=y_offset, x_offset=x_offset,
    )
    return _finish_draw(out, fb, mesh, setup, z, tri, overflow, return_counters)


def _render_fused_banded(coef, bbox, valid, payload, tex_lut, light,
                         h, w, y_offset, x_offset, fh, fw, *,
                         bilinear, with_phong, layout, raster_opts):
    """Fused render with optional raster_opts["row_bands"]: N horizontal
    bands of SEQUENTIAL fused calls sharing one vertex prep — the
    single-chip form of the sharded band decomposition. Why: the packed
    int32 (tile, tri) sort key caps n_tiles * T at 2^31, which blocks small
    tiles (t8/t16) at 1M+ triangles on a full 4K frame; banding keeps each
    call's tile count under the cap AND band compaction (shard_budget)
    shrinks each call's sort/gather to ~its band's triangles. Bit-identical
    to the unbanded frame AT ZERO OVERFLOW: pixel ownership is disjoint,
    binning per band sees exactly the triangles that can touch it, and ids
    (the depth tie-break) survive compaction (monotone). The per-band
    budgets (auto shard_budget ~2.5x and pair_budget ~1.3x the mean band
    share) carry skew headroom, but a band-skewed scene can exceed them —
    misses are COUNTED in the returned overflow, and a banded image with
    overflow > 0 legitimately diverges from the unbanded one (audit with
    pipeline.audit_scene / audit_bands before trusting a banded render)."""
    from dtrenderer_tpu.ops.render_fused import render_fused

    base_opts = dict(raster_opts or {})
    row_bands = int(base_opts.pop("row_bands", 1) or 1)
    band_index = base_opts.pop("band_index", None)
    band_shared = bool(base_opts.pop("band_shared", True))
    band_distributed = bool(base_opts.pop("band_distributed", False))
    band_axis = base_opts.pop("band_axis", "rows")
    if row_bands <= 1:
        opts = _with_auto_shard_budget(base_opts, coef.shape[0], h, w, fh, fw)
        return render_fused(
            coef, bbox, valid, payload, tex_lut,
            light.direction, light.ambient, h, w,
            y_offset=y_offset, x_offset=x_offset,
            bilinear=bilinear, with_phong=with_phong, layout=layout, **opts,
        )
    if (band_shared and base_opts.get("flat_bins")
            and not base_opts.get("flat_slabs")):
        # SHARED cross-band binning (render_fused_rowbands): one full-frame
        # partition sort whose per-band windows feed every band's kernel
        # call — replaces row_bands separate compaction+sort+gather passes.
        # band_index (traced, from shard_map axis_index) renders ONE band of
        # a full frame fh = h * row_bands; None scans all bands of this fb.
        from dtrenderer_tpu.ops.render_fused import (
            render_fused_band_distributed, render_fused_rowbands,
        )

        opts = {k: v for k, v in base_opts.items()
                if k not in ("flat_bins", "use_ybounds", "shard_budget")}
        one_band = band_index is not None or band_distributed
        full_h = h * row_bands if one_band else h
        if one_band:
            assert fh == full_h, (
                f"band_index render: frame_height {fh} != band_h * "
                f"row_bands ({full_h})")
        if band_distributed:
            # inside shard_map: every binning stage sliced 1/N + all_to_all
            return render_fused_band_distributed(
                coef, bbox, valid, payload, tex_lut,
                light.direction, light.ambient, full_h, w, row_bands,
                axis_name=band_axis, y_offset=y_offset, x_offset=x_offset,
                bilinear=bilinear, with_phong=with_phong, layout=layout,
                **opts,
            )
        return render_fused_rowbands(
            coef, bbox, valid, payload, tex_lut,
            light.direction, light.ambient, full_h, w, row_bands,
            band_index=band_index, y_offset=y_offset, x_offset=x_offset,
            bilinear=bilinear, with_phong=with_phong, layout=layout, **opts,
        )
    assert band_index is None, "band_index requires the shared flat path"
    assert h % row_bands == 0, (
        f"row_bands={row_bands} must divide the frame height {h}")
    bh = h // row_bands
    opts = _legacy_band_opts(
        base_opts, coef.shape[0], bh, w, max(fh, h), max(fw, w), row_bands)
    # lax.scan over bands: the band body (compaction + binning + kernel) is
    # IDENTICAL per band except the traced y_offset, so scan compiles it ONCE
    # — an 8-band 4K program is ~8x smaller and compiles ~8x faster than the
    # unrolled loop, at identical runtime semantics (bands are data-
    # independent but TPU executes kernels sequentially either way).
    y0s = jnp.asarray(y_offset, jnp.int32) + (
        jnp.arange(row_bands, dtype=jnp.int32) * bh)

    def band(overflow, y0):
        z_b, src_b, ov_b = render_fused(
            coef, bbox, valid, payload, tex_lut,
            light.direction, light.ambient, bh, w,
            y_offset=y0, x_offset=x_offset,
            bilinear=bilinear, with_phong=with_phong, layout=layout, **opts,
        )
        return overflow + ov_b, (z_b, src_b)

    import jax

    overflow, (zs, srcs) = jax.lax.scan(
        band, jnp.zeros((), jnp.int32), y0s)
    return (zs.reshape(h, w), srcs.reshape(h, w, srcs.shape[-1]), overflow)


def _legacy_band_opts(base_opts, n_tris: int, bh: int, w: int, fh: int,
                      fw: int, row_bands: int) -> dict:
    """Per-band raster opts for the LEGACY (per-band binning) banded path:
    auto shard_budget compaction + the band share of the pair budget. The
    SINGLE derivation — _render_fused_banded renders with it and audit_bands
    audits with it, so the two cannot desynchronize (VERDICT r4 weak #4)."""
    opts = _with_auto_shard_budget(dict(base_opts), n_tris, bh, w, fh, fw)
    if opts.get("pair_budget"):
        from dtrenderer_tpu.ops.render_fused import band_pair_budget

        opts["pair_budget"] = band_pair_budget(
            int(opts["pair_budget"]), row_bands)
    return opts


def _with_auto_shard_budget(raster_opts, n_tris: int, h: int, w: int,
                            fh: int, fw: int) -> dict:
    """When this fused call renders a BAND of a larger frame (the sharded
    paths: parallel/shard.py, cli --rows, config 5), default shard_budget so
    each device bins only ~its band's triangles instead of the full scene's
    (render_fused.auto_shard_budget). An explicit raster_opts shard_budget
    always wins; unsharded calls (fb == full frame) are untouched."""
    opts = dict(raster_opts or {})
    n_bands = max(1, fh // h) * max(1, fw // w)
    if "shard_budget" not in opts and n_bands > 1:
        from dtrenderer_tpu.ops.render_fused import auto_shard_budget

        opts["shard_budget"] = auto_shard_budget(n_tris, n_bands)
    return opts


def _finish_draw(out, fb, mesh, setup, z, tri, overflow, return_counters):
    if not return_counters:
        return out
    from dtrenderer_tpu.debug import FrameCounters

    counters = FrameCounters(
        tris_submitted=jnp.int32(mesh.faces.shape[0]),
        tris_valid=jnp.sum(setup.valid.astype(jnp.int32)),
        pixels_shaded=jnp.sum(((tri >= 0) & (z < fb.depth)).astype(jnp.int32)),
        bin_overflow=overflow,
    )
    return out, counters


def draw_mesh_ordered(
    fb: Framebuffer,
    mesh,
    model,
    view_proj,
    texture=None,
    light: Light | None = None,
    color=(1.0, 1.0, 1.0, 1.0),
    shading: str = SHADING_GOURAUD,
    sampling_mode: str = "nearest",
    cull_backfaces: bool = True,
    normal_mat=None,
    mvp=None,
    frame_height=None,
    frame_width=None,
    y_offset=0,
    x_offset=0,
    near_clip: bool = True,
    window: tuple[int, int] | None = (64, 128),
    engine: str = "auto",
    raster_opts: dict | None = None,
    return_counters: bool = False,
):
    """Reference-order draw: per-triangle z-test + blend + depth-WRITE in
    submission order — the reference's sequential per-pixel loop semantics
    (SURVEY.md CS-2 ★HOT LOOP), which the order-free two-phase split cannot
    reproduce for TRANSLUCENT geometry (overlapping translucent triangles
    stack in submission order and write depth).

    engine:
      "tile"  — the tile-parallel ordered Pallas kernel
                (ops/raster_ordered.py): per-tile binned windows in strict
                id (== submission) order, blended sequentially in VMEM.
                Pixel ownership is disjoint, so per-tile order IS global
                order; tiles run in parallel over the grid (5k-tri
                translucent mesh @1080p: 2.3 ms vs the scan's 64 ms,
                tools/bench_ordered.py on chip).
                raster_opts: tile_h (16), capacity (256/tile window),
                small_span (16), broad_cap (128), chunk, pair_budget. Any
                dropped pair (capacity/budget/broad_cap) changes the blend
                for later triangles — drops are COUNTED (return_counters)
                and must be audited to zero like any binned mode.
      "scan"  — a lax.scan over triangles; each step evaluates a `window`
                (wh, ww) positioned over the triangle's bbox (full-frame
                fallback for oversized triangles; window=None forces
                full-frame). Bit-equal at ANY window size. O(T) sequential
                steps — the exactness oracle and the fallback, not the
                production path.
      "auto"  — "tile" unless the texture exceeds the VMEM LUT budget
                (TEX_BUDGET_TEXELS), else "scan".
    Both engines implement the same FORMULAS.md math as shade_deferred;
    cross-engine images agree at the repo's packed-u8 parity bar (raw f32
    differs by XLA FMA contraction between program shapes, CLAUDE.md).

    return_counters: also return FrameCounters (bin_overflow = dropped
    pairs; always 0 for "scan").
    """
    import jax

    from dtrenderer_tpu.ops.shading import make_light

    h, w = fb.depth.shape
    fh = frame_height if frame_height is not None else h
    fw = frame_width if frame_width is not None else w
    if light is None:
        light = make_light()
    textured = texture is not None
    if texture is None:
        texture = jnp.ones((1, 1, 4), F32)
    if normal_mat is None:
        normal_mat = model
    if mvp is None:
        mvp = mat4mul(view_proj, model)

    if engine == "auto":
        from dtrenderer_tpu.ops.render_fused import TEX_LUT_MAX_TEXELS

        # The ordered tile kernel's VMEM footprint is small (one double-
        # buffered channel-major window + the fb tile — no dense setup
        # blocks), so it runs textures up to the full LUT ceiling (8 MB =
        # 2x the fused path's TEX_BUDGET_TEXELS auto-fallback): measured on
        # chip, a 512x512-texture 5k-tri translucent draw runs the tile
        # engine at 20.2 ms vs the scan's ~59 ms (~3x; see ARCHITECTURE.md
        # "Texture routing" for why wide LUTs slow the per-step fetch). Beyond
        # the LUT ceiling the O(T) scan remains the exact fallback — a
        # documented decision (ARCHITECTURE.md "Ordered translucency"):
        # per-triangle texel-window DMA was evaluated and rejected because
        # a minified/global-uv triangle's texel window is unbounded, so a
        # windowed kernel cannot keep the blend exact without a per-draw
        # fallback to scan anyway.
        big_tex = (int(texture.shape[0]) * int(texture.shape[1])
                   > TEX_LUT_MAX_TEXELS)
        engine = "scan" if big_tex else "tile"
    assert engine in ("tile", "scan"), f"unknown ordered engine {engine!r}"

    setup, attrs10 = prepare_draw(
        mesh, model, view_proj, mvp, normal_mat, light, color, shading,
        fw, fh, cull_backfaces, near_clip,
    )

    if engine == "tile":
        from dtrenderer_tpu.ops.raster_ordered import render_ordered
        from dtrenderer_tpu.ops.render_fused import (
            dummy_texture_lut, make_texture_lut, pack_payload, plan_layout,
        )

        if textured:
            tex_lut, meta = make_texture_lut([texture])
        else:
            tex_lut, meta = dummy_texture_lut(), [(0, 1, 1)]
        is_phong = shading == SHADING_PHONG
        layout = plan_layout([dict(
            textured=textured, phong=is_phong,
            corner_rgba_is_q=(_host_white(color)
                              and shading in (SHADING_PHONG, SHADING_NONE)),
            corner_rgba_mono=_host_gray_opaque(color),
            meta=meta[0],
        )], mixed_sampling=False)
        payload = pack_payload(attrs10, layout, meta[0], 0.0)
        opts = dict(raster_opts or {})
        opts.pop("row_bands", None)
        color_o, depth_o, overflow = render_ordered(
            setup.coef, setup.bbox, setup.valid, payload, tex_lut,
            light.direction, light.ambient, fb.color, fb.depth,
            h, w, y_offset=y_offset, x_offset=x_offset,
            bilinear=(sampling_mode == "bilinear") and layout.has_uv,
            with_phong=is_phong, layout=layout, **opts,
        )
        out = Framebuffer(color=color_o, depth=depth_o)
        if not return_counters:
            return out
        from dtrenderer_tpu.debug import FrameCounters

        return out, FrameCounters(
            tris_submitted=jnp.int32(setup.coef.shape[0]),
            tris_valid=jnp.sum(setup.valid.astype(jnp.int32)),
            pixels_shaded=jnp.sum(
                (depth_o < fb.depth).astype(jnp.int32)),
            bin_overflow=overflow,
        )
    Tp = attrs10.shape[0]
    attrs16 = jnp.concatenate(
        [attrs10, jnp.zeros((Tp, 3, ATTR_CHANNELS - 10), F32)], axis=-1
    )

    x_off = jnp.asarray(x_offset, jnp.int32)
    y_off = jnp.asarray(y_offset, jnp.int32)
    px = (jnp.arange(w, dtype=F32) + (F32(0.5) + x_off.astype(F32)))[None, :]
    py = (jnp.arange(h, dtype=F32) + (F32(0.5) + y_off.astype(F32)))[:, None]

    if window is None:
        wh, ww = h, w
    else:
        wh, ww = min(window[0], h), min(window[1], w)

    def _shade_src(ip):
        qf = ip[..., 0]
        inv_qf = F32(1.0) / jnp.where(qf != 0, qf, F32(1.0))
        u = ip[..., 1] * inv_qf
        v = ip[..., 2] * inv_qf
        rgba = ip[..., 3:7] * inv_qf[..., None]
        texel = sampling.sample(texture, u, v, sampling_mode)
        src = texel * rgba
        if shading == SHADING_PHONG:
            n = ip[..., 7:10] * inv_qf[..., None]
            term = light_term(n, light)
            src = apply_light(src, term)
        return src

    def _blend_patch(color_p, depth_p, coef_t, attr_t, px_p, py_p, valid_t):
        """One triangle over one pixel patch (window or full frame): identical
        formulas to the pre-window implementation — px/py VALUES decide the
        result, not the patch shape."""
        inside, z, b = coverage_and_depth(coef_t, px_p, py_p)
        b = tuple(bb[..., None] for bb in b)
        ip = interp(b, attr_t[0], attr_t[1], attr_t[2])
        src = _shade_src(ip)
        win = inside & valid_t & (z < depth_p)
        blended = blend_over(src, color_p)
        return (
            jnp.where(win[..., None], blended, color_p),
            jnp.where(win, z, depth_p),
        )

    def step(carry, inp):
        colorbuf, depthbuf = carry
        coef_t, valid_t, attr_t, bbox_t = inp  # [16], bool, [3,16], [4]
        # bbox is FULL-frame coords; this fb may be a band (y/x offsets).
        lx0 = jnp.clip(bbox_t[0] - x_off, 0, w - 1)
        ly0 = jnp.clip(bbox_t[1] - y_off, 0, h - 1)
        lx1 = jnp.clip(bbox_t[2] - x_off, 0, w - 1)
        ly1 = jnp.clip(bbox_t[3] - y_off, 0, h - 1)
        in_band = (
            valid_t
            & (bbox_t[2] >= x_off) & (bbox_t[0] < x_off + w)
            & (bbox_t[3] >= y_off) & (bbox_t[1] < y_off + h)
        )
        fits = (lx1 - lx0 + 1 <= ww) & (ly1 - ly0 + 1 <= wh)

        def skip(carry):
            return carry

        def windowed(carry):
            colorbuf, depthbuf = carry
            ox = jnp.minimum(lx0, w - ww)  # lx0 >= 0 already
            oy = jnp.minimum(ly0, h - wh)
            color_p = jax.lax.dynamic_slice(colorbuf, (oy, ox, 0), (wh, ww, 4))
            depth_p = jax.lax.dynamic_slice(depthbuf, (oy, ox), (wh, ww))
            px_p = ((ox + jnp.arange(ww, dtype=jnp.int32)).astype(F32)
                    + (F32(0.5) + x_off.astype(F32)))[None, :]
            py_p = ((oy + jnp.arange(wh, dtype=jnp.int32)).astype(F32)
                    + (F32(0.5) + y_off.astype(F32)))[:, None]
            color_p, depth_p = _blend_patch(
                color_p, depth_p, coef_t, attr_t, px_p, py_p, True)
            return (
                jax.lax.dynamic_update_slice(colorbuf, color_p, (oy, ox, 0)),
                jax.lax.dynamic_update_slice(depthbuf, depth_p, (oy, ox)),
            )

        def full(carry):
            colorbuf, depthbuf = carry
            return _blend_patch(colorbuf, depthbuf, coef_t, attr_t, px, py,
                                True)

        if (wh, ww) == (h, w):
            new = jax.lax.cond(in_band, full, skip, carry)
        else:
            idx = jnp.where(in_band, jnp.where(fits, 1, 2), 0)
            new = jax.lax.switch(idx, [skip, windowed, full], carry)
        return new, None

    (new_color, new_depth), _ = jax.lax.scan(
        step, (fb.color, fb.depth),
        (setup.coef, setup.valid, attrs16, setup.bbox),
    )
    out = Framebuffer(color=new_color, depth=new_depth)
    if not return_counters:
        return out
    from dtrenderer_tpu.debug import FrameCounters

    return out, FrameCounters(
        tris_submitted=jnp.int32(setup.coef.shape[0]),
        tris_valid=jnp.sum(setup.valid.astype(jnp.int32)),
        pixels_shaded=jnp.sum((new_depth < fb.depth).astype(jnp.int32)),
        bin_overflow=jnp.zeros((), jnp.int32),  # scan never bins
    )


def _host_white(color) -> bool:
    """True when `color` is host-known to be exactly (1, 1, 1, 1) — the
    precondition for dropping rgba payload channels (render_fused.plan_layout:
    rgba*q == q bit-exactly). Traced colors conservatively return False."""
    try:
        import numpy as np

        c = np.asarray(color, dtype=np.float32).reshape(-1)
        return c.shape[0] == 4 and bool(np.all(c == 1.0))
    except Exception:
        return False


def _host_gray_opaque(color) -> bool:
    """True when `color` is host-known GRAY with UNIT alpha (r == g == b,
    a == 1) — the precondition for the mono_rgb payload layout
    (render_fused.PayloadLayout): corner rgb*q channels are bit-identical
    (any baked light term is a scalar) and a*q == q exactly. Traced colors
    conservatively return False."""
    try:
        import numpy as np

        c = np.asarray(color, dtype=np.float32).reshape(-1)
        return (c.shape[0] == 4 and bool(c[0] == c[1] == c[2])
                and bool(c[3] == 1.0))
    except Exception:
        return False


def is_translucent_draw(d: "DrawSpec") -> bool:
    """Host-side translucency detection for DrawSpecs.

    Explicit d.translucent wins; otherwise a draw counts as translucent when its
    COLOR alpha < 1 (host value). Texture-alpha translucency cannot be detected
    cheaply at trace time — set DrawSpec(translucent=True) explicitly for it.
    """
    if d.translucent is not None:
        return bool(d.translucent)
    try:
        import numpy as np

        return float(np.asarray(d.color).reshape(-1)[3]) < 1.0
    except Exception:
        return False


def audit_scene(view_proj, draws, height, width, light=None,
                cull_backfaces=True, near_clip=True,
                raster_opts: dict | None = None):
    """Pre-flight binning audit for a batched scene: returns (overflow,
    max_count, capacity). Run this once per scene/config (it is NOT jitted) —
    a nonzero overflow means the chosen bin capacity SILENTLY DROPS triangles
    and must be raised. bench.py and the scene tests assert overflow == 0.
    """
    from dtrenderer_tpu.ops.binning import bin_triangles
    from dtrenderer_tpu.ops.shading import make_light

    if light is None:
        light = make_light()
    opts = dict(raster_opts or {})
    opts.pop("chunk", None)
    opts.pop("cols", None)
    opts.pop("skip_shading", None)
    opts.pop("use_ybounds", None)  # capacity counts don't depend on bin order
    opts.pop("batch_rows", None)
    opts.pop("slot_k", None)  # phase-2 gather width: no effect on bin counts
    opts.pop("shard_budget", None)  # audits the FULL (uncompacted) scene
    flat = bool(opts.pop("flat_bins", None))
    # flat_slabs bins at 8-row-slab granularity with PER-SLAB capacity: the
    # audit must count the real (tile, slab) windows, so it routes through
    # bin_triangles_flat below. Plain flat_bins has the same counts/caps as
    # dense; the dense audit covers it.
    flat_slabs = bool(opts.pop("flat_slabs", None))
    opts.pop("row_bands", None)  # audits the full frame's per-tile counts
    # render_fused's defaults, from the single shared source (binning's own
    # defaults differ — never mirror by hand).
    from dtrenderer_tpu.ops.render_fused import DEFAULT_RASTER_OPTS

    for k, v in DEFAULT_RASTER_OPTS.items():
        opts.setdefault(k, v)
    capacity = opts["capacity"]

    coefs, bboxes, valids = [], [], []
    for d in draws:
        model = d.model
        normal_mat = d.normal_mat if d.normal_mat is not None else model
        mvp = mat4mul(view_proj, model)
        setup, _ = prepare_draw(d.mesh, model, view_proj, mvp, normal_mat,
                                light, d.color, d.shading, width, height,
                                cull_backfaces, near_clip)
        coefs.append(setup.coef)
        bboxes.append(setup.bbox)
        valids.append(setup.valid)
    coef = jnp.concatenate(coefs)
    bbox = jnp.concatenate(bboxes)
    valid = jnp.concatenate(valids)
    import numpy as np

    if flat and flat_slabs:
        # audit the REAL slab windows (per-slab counts vs per-slab capacity)
        from dtrenderer_tpu.ops.binning import bin_triangles_flat

        T = coef.shape[0]
        pb = int(opts.pop("pair_budget", None) or 3 * T)
        # clip the local bbox exactly as render_fused does (full frame here)
        local = jnp.stack([
            jnp.clip(bbox[:, 0], 0, width - 1),
            jnp.clip(bbox[:, 1], 0, height - 1),
            jnp.clip(bbox[:, 2], 0, width - 1),
            jnp.clip(bbox[:, 3], 0, height - 1)], axis=-1)
        fbins = bin_triangles_flat(
            coef, local, valid, height, width,
            payload=jnp.zeros((T, 1), jnp.float32),
            pair_budget=min(pb, 3 * T),
            n_slabs=opts["tile_h"] // 8,
            mid_cap=opts.get("mid_cap"),
            **{k: opts[k] for k in ("tile_h", "tile_w", "capacity",
                                    "small_span", "broad_cap")},
        )
        return (int(np.asarray(fbins.overflow)),
                int(np.asarray(fbins.counts).max()), capacity)

    bins = bin_triangles(coef, bbox, valid, height, width, **opts)
    return (int(np.asarray(bins.overflow)),
            int(np.asarray(bins.counts).max()), capacity)


def audit_bands(view_proj, draws, height, width, n_bands: int, light=None,
                cull_backfaces=True, near_clip=True,
                raster_opts: dict | None = None):
    """Host-side pre-flight for BANDED/SHARDED rendering (the sibling of
    audit_scene, which audits only the full frame). It runs THE REAL binning
    the banded render would run — no duplicated cost model (VERDICT r4 weak
    #4): per band, render_fused.prepare_draw_bins with the per-band opts from
    the SAME _legacy_band_opts derivation _render_fused_banded uses; for the
    shared cross-band path (flat_bins + row_bands), the one shared
    bin_triangles_flat(row_bands=...) pass itself. Every drop the render
    would count (compaction, pair budget, capacity, broad_cap, mid_cap) is
    therefore counted here, BEFORE the image is rendered wrong. Run once per
    scene/config (NOT jitted).

    Returns a dict:
      n_bands, band_h
      shared              — True when the shared cross-band binning applies
      shard_budget        — per-band compaction budget (legacy path; None
                            for the shared path, which never compacts)
      band_tris           — [n_bands] true triangles touching each band
      shard_overflow      — total triangles dropped by compaction
      pair_budget         — the pair budget the binning actually used
                            (per-band share for legacy, full-frame for
                            shared; None when unbudgeted)
      band_pairs          — [n_bands] binned (tile, tri) pairs kept per band
      pair_overflow       — total pairs the binning dropped (budget,
                            capacity, broad_cap, mid_cap — all causes)
      ok                  — True iff nothing was dropped
    """
    import numpy as np

    from dtrenderer_tpu.ops.render_fused import (
        DEFAULT_RASTER_OPTS, prepare_draw_bins,
    )
    from dtrenderer_tpu.ops.shading import make_light

    if light is None:
        light = make_light()
    assert height % n_bands == 0, (
        f"n_bands={n_bands} must divide the frame height {height}")
    band_h = height // n_bands
    base = dict(raster_opts or {})
    # kernel-only keys: no effect on bin counts
    for k in ("chunk", "cols", "batch_rows", "skip_shading", "use_ybounds",
              "row_bands", "band_index", "slot_k"):
        base.pop(k, None)
    band_shared = bool(base.pop("band_shared", True))
    for k, v in DEFAULT_RASTER_OPTS.items():
        base.setdefault(k, v)
    shared = bool(band_shared and base.get("flat_bins")
                  and not base.get("flat_slabs"))

    coefs, bboxes, valids = [], [], []
    for d in draws:
        model = d.model
        normal_mat = d.normal_mat if d.normal_mat is not None else model
        mvp = mat4mul(view_proj, model)
        setup, _ = prepare_draw(d.mesh, model, view_proj, mvp, normal_mat,
                                light, d.color, d.shading, width, height,
                                cull_backfaces, near_clip)
        coefs.append(setup.coef)
        bboxes.append(setup.bbox)
        valids.append(setup.valid)
    coef = jnp.concatenate(coefs)
    bbox = jnp.concatenate(bboxes)
    valid = jnp.concatenate(valids)
    T = coef.shape[0]
    # payload channel count never changes bin counts; audit with 1 channel
    payload = jnp.zeros((T, 1), jnp.float32)

    bbox_np = np.asarray(bbox)
    valid_np = np.asarray(valid)
    band_tris = np.zeros(n_bands, np.int64)
    for b in range(n_bands):
        y0, y1 = b * band_h, (b + 1) * band_h - 1
        in_band = valid_np & (bbox_np[:, 3] >= y0) & (bbox_np[:, 1] <= y1)
        band_tris[b] = int(in_band.sum())

    bin_keys = ("tile_h", "tile_w", "capacity", "small_span", "broad_cap",
                "shard_budget", "pair_budget", "flat_bins", "mid_cap",
                "flat_slabs")

    if shared:
        from dtrenderer_tpu.ops.binning import bin_triangles_flat

        pair_budget = base.get("pair_budget")
        pair_budget = min(int(pair_budget if pair_budget is not None
                              else 3 * T), 3 * T)
        local = jnp.stack([
            jnp.clip(bbox[:, 0], 0, width - 1),
            jnp.clip(bbox[:, 1], 0, height - 1),
            jnp.clip(bbox[:, 2], 0, width - 1),
            jnp.clip(bbox[:, 3], 0, height - 1)], axis=-1)
        fbins = bin_triangles_flat(
            coef, local, valid, height, width,
            tile_h=base["tile_h"], tile_w=base["tile_w"],
            capacity=base["capacity"], small_span=base["small_span"],
            broad_cap=base["broad_cap"], payload=payload,
            pair_budget=pair_budget, mid_cap=base.get("mid_cap"),
            row_bands=n_bands,
        )
        n_tyb = -(-band_h // base["tile_h"])
        counts = np.asarray(fbins.counts).reshape(n_bands, n_tyb, -1)
        band_pairs = counts.sum(axis=(1, 2)).astype(np.int64)
        pair_overflow = int(np.asarray(fbins.overflow))
        shard_budget = None
        shard_overflow = 0
    else:
        opts = _legacy_band_opts(base, T, band_h, width, height, width,
                                 n_bands)
        kw = {k: opts[k] for k in bin_keys if k in opts}
        shard_budget = kw.get("shard_budget")
        pair_budget = kw.get("pair_budget")
        band_pairs = np.zeros(n_bands, np.int64)
        shard_overflow = 0
        pair_overflow = 0
        for b in range(n_bands):
            bins, dropped = prepare_draw_bins(
                coef, bbox, valid, payload, band_h, width,
                y_offset=b * band_h, **kw)
            shard_overflow += int(np.asarray(dropped))
            pair_overflow += int(np.asarray(bins.overflow))
            band_pairs[b] = int(np.asarray(bins.counts).astype(np.int64)
                                .sum())

    return dict(
        n_bands=n_bands, band_h=band_h, shared=shared,
        shard_budget=None if shard_budget is None else int(shard_budget),
        band_tris=band_tris.tolist(),
        shard_overflow=shard_overflow,
        pair_budget=None if pair_budget is None else int(pair_budget),
        band_pairs=band_pairs.tolist(),
        pair_overflow=pair_overflow,
        ok=(shard_overflow == 0 and pair_overflow == 0),
    )


def audit_ordered(view_proj, mesh, model, height, width, light=None,
                  cull_backfaces=True, near_clip=True,
                  raster_opts: dict | None = None):
    """Host-side pre-flight for the ORDERED tile engine (draw_mesh_ordered
    engine="tile"): any dropped (tile, tri) pair CHANGES THE BLEND for every
    later triangle on those pixels, so capacity/budget must be audited to
    zero before the image can be trusted. Runs the REAL ordered binning once
    (bin_triangles_flat(ordered=True) with render_ordered's defaults merged
    under raster_opts) — exact, no duplicated cost model — and returns
    (overflow, max_tile_count, capacity). Run per scene/config, NOT jitted.
    """
    import numpy as np

    from dtrenderer_tpu.ops.binning import bin_triangles_flat
    from dtrenderer_tpu.ops.shading import make_light

    if light is None:
        light = make_light()
    opts = dict(raster_opts or {})
    opts.pop("row_bands", None)  # ordered path never bands
    tile_h = int(opts.pop("tile_h", 16))
    capacity = int(opts.pop("capacity", 256))
    small_span = int(opts.pop("small_span", 16))
    broad_cap = int(opts.pop("broad_cap", 128))
    mvp = mat4mul(view_proj, model)
    setup, _ = prepare_draw(mesh, model, view_proj, mvp, model, light,
                            (1.0, 1.0, 1.0, 1.0), SHADING_NONE,
                            width, height, cull_backfaces, near_clip)
    T = setup.coef.shape[0]
    pb = int(opts.pop("pair_budget", None) or 3 * T)
    assert not opts, f"unknown ordered raster_opts: {sorted(opts)}"
    local = jnp.stack([
        jnp.clip(setup.bbox[:, 0], 0, width - 1),
        jnp.clip(setup.bbox[:, 1], 0, height - 1),
        jnp.clip(setup.bbox[:, 2], 0, width - 1),
        jnp.clip(setup.bbox[:, 3], 0, height - 1)], axis=-1)
    fbins = bin_triangles_flat(
        setup.coef, local, setup.valid, height, width,
        tile_h=tile_h, tile_w=128, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap,
        payload=jnp.zeros((T, 1), jnp.float32),
        pair_budget=min(pb, 3 * T), ordered=True,
    )
    return (int(np.asarray(fbins.overflow)),
            int(np.asarray(fbins.counts).max()), capacity)


class DrawSpec:
    """One mesh submission for the batched scene path (draw_meshes).

    sampling: per-draw texture sampling mode ("nearest"/"bilinear"); None
    inherits draw_meshes' scene-wide sampling_mode. Mixed modes across draws
    batch into one kernel call (per-triangle flag bit).

    translucent: None = auto-detect from color alpha (is_translucent_draw);
    True forces the reference-order sequential path (draw_mesh_ordered) for
    this draw — required when the TEXTURE carries alpha < 1."""

    def __init__(self, mesh, model, texture=None, color=(1.0, 1.0, 1.0, 1.0),
                 shading: str = SHADING_GOURAUD, normal_mat=None,
                 sampling: str | None = None, translucent: bool | None = None):
        if sampling not in (None, "nearest", "bilinear"):
            raise ValueError(f"unknown sampling mode {sampling!r}")
        self.mesh = mesh
        self.model = model
        self.texture = texture
        self.color = color
        self.shading = shading
        self.normal_mat = normal_mat
        self.sampling = sampling
        self.translucent = translucent


def draw_meshes(
    fb: Framebuffer,
    view_proj,
    draws,
    light: Light | None = None,
    sampling_mode: str = "bilinear",
    cull_backfaces: bool = True,
    frame_height=None,
    frame_width=None,
    y_offset=0,
    x_offset=0,
    raster_opts: dict | None = None,
    near_clip: bool = True,
    return_counters: bool = False,
    ordered_opts: dict | None = None,
    ordered_engine: str = "auto",
):
    """Batched scene submission: ALL opaque meshes rasterize + shade in ONE fused
    kernel invocation (the multi-mesh analog of the reference's per-frame scene,
    amortizing binning/kernel overheads across draws).

    Exactly equivalent to sequential fused draw_mesh calls for opaque geometry:
    the z-test winner is order-independent (FORMULAS.md) and blending happens once
    against the pre-scene framebuffer. Each draw keeps its own texture (packed
    into one LUT with per-triangle base offsets), per-vertex lighting mode,
    color, and sampling mode (DrawSpec.sampling overrides the scene-wide
    `sampling_mode`; mixing nearest + bilinear draws stays one kernel call).

    ordered_opts / ordered_engine tune the TRANSLUCENT singles' ordered path
    (draw_mesh_ordered's raster_opts / engine — tile-engine capacity etc.);
    `raster_opts` stays with the opaque fused runs, whose keys (pair_budget,
    flat_bins, ...) do not apply to the ordered kernel.
    """
    from dtrenderer_tpu.ops.render_fused import (
        SAMPLE_MIXED, dummy_texture_lut, make_texture_lut, pack_flags,
        pack_payload, plan_layout, render_fused,
    )

    if light is None:
        from dtrenderer_tpu.ops.shading import make_light

        light = make_light()
    h, w = fb.depth.shape
    fh = frame_height if frame_height is not None else h
    fw = frame_width if frame_width is not None else w

    # Translucent draws (color alpha < 1 or explicit DrawSpec.translucent) are
    # handled by partitioning the submission list into maximal OPAQUE RUNS and
    # translucent singles, rendered strictly in submission order: each opaque
    # run is one fused batched call (order-free internally — exact, FORMULAS.md
    # depth contract), each translucent draw goes through the reference-order
    # sequential path, blending over everything before it and writing depth
    # like the reference's forward loop. Opaque-translucent-opaque
    # interleavings therefore match sequential reference submission exactly.
    # Counters (return_counters) cover the opaque runs.
    if any(is_translucent_draw(d) for d in draws):
        segments: list[tuple[str, object]] = []  # ("opaque", [ds]) | ("trans", d)
        for d in draws:
            if is_translucent_draw(d):
                segments.append(("trans", d))
            elif segments and segments[-1][0] == "opaque":
                segments[-1][1].append(d)
            else:
                segments.append(("opaque", [d]))
        out = fb
        counters = None
        if return_counters:
            from dtrenderer_tpu.debug import FrameCounters

            counters = FrameCounters.zero()
        for kind, seg in segments:
            if kind == "opaque":
                res = draw_meshes(
                    out, view_proj, seg, light=light,
                    sampling_mode=sampling_mode,
                    cull_backfaces=cull_backfaces,
                    frame_height=fh, frame_width=fw,
                    y_offset=y_offset, x_offset=x_offset,
                    raster_opts=raster_opts, near_clip=near_clip,
                    return_counters=return_counters,
                )
                if return_counters:
                    out, c = res
                    counters = counters.merge(c)
                else:
                    out = res
            else:
                d = seg
                res = draw_mesh_ordered(
                    out, d.mesh, d.model, view_proj, texture=d.texture,
                    light=light, color=d.color, shading=d.shading,
                    sampling_mode=d.sampling or sampling_mode,
                    cull_backfaces=cull_backfaces,
                    normal_mat=d.normal_mat, frame_height=fh, frame_width=fw,
                    y_offset=y_offset, x_offset=x_offset, near_clip=near_clip,
                    return_counters=return_counters,
                    engine=ordered_engine, raster_opts=ordered_opts,
                )
                if return_counters:
                    out, c = res
                    counters = counters.merge(c)
                else:
                    out = res
        return (out, counters) if return_counters else out

    if sampling_mode not in ("nearest", "bilinear"):
        raise ValueError(f"unknown sampling mode {sampling_mode!r}")
    draw_sampling = [d.sampling or sampling_mode for d in draws]

    textures = []
    for d in draws:
        textures.append(
            d.texture if d.texture is not None else jnp.ones((1, 1, 4), F32)
        )

    # VMEM texel budget (deduped): when the packed LUT would not fit, fall back
    # to sequential draw_mesh calls — exact for opaque scenes (order-free depth
    # resolve), and each call re-applies its own budget routing.
    from dtrenderer_tpu.ops.render_fused import TEX_BUDGET_TEXELS

    total_texels = sum(
        int(t.shape[0]) * int(t.shape[1])
        for t in {id(t): t for t in textures}.values()
    )
    if total_texels > TEX_BUDGET_TEXELS:
        out = fb
        counters = None
        for d, smp in zip(draws, draw_sampling):
            res = draw_mesh(
                out, d.mesh, d.model, view_proj, texture=d.texture,
                light=light, color=d.color, shading=d.shading,
                sampling_mode=smp, cull_backfaces=cull_backfaces,
                normal_mat=d.normal_mat, backend="fused",
                frame_height=fh, frame_width=fw,
                y_offset=y_offset, x_offset=x_offset,
                raster_opts=raster_opts, near_clip=near_clip,
                return_counters=return_counters,
            )
            if return_counters:
                out, c = res
                counters = c if counters is None else counters.merge(c)
            else:
                out = res
        return (out, counters) if return_counters else out

    any_textured = any(d.texture is not None for d in draws)
    if any_textured:
        tex_lut, meta = make_texture_lut(textures)
    else:
        tex_lut, meta = dummy_texture_lut(), [(0, 1, 1)] * len(draws)
    if all(s == "nearest" for s in draw_sampling):
        scene_sampling: bool | int = False
    elif all(s == "bilinear" for s in draw_sampling):
        scene_sampling = True
    else:
        scene_sampling = SAMPLE_MIXED  # per-triangle flag bit decides

    # Minimal bit-exact payload layout for the whole batch (plan_layout).
    feats = [dict(
        textured=d.texture is not None,
        phong=d.shading == SHADING_PHONG,
        corner_rgba_is_q=(_host_white(d.color)
                          and d.shading in (SHADING_PHONG, SHADING_NONE)),
        corner_rgba_mono=_host_gray_opaque(d.color),
        meta=m,
    ) for d, m in zip(draws, meta)]
    layout = plan_layout(feats, mixed_sampling=scene_sampling == SAMPLE_MIXED)
    any_phong = any(f["phong"] for f in feats)

    coefs, bboxes, valids, payloads = [], [], [], []
    for d, smp, m in zip(draws, draw_sampling, meta):
        model = d.model
        normal_mat = d.normal_mat if d.normal_mat is not None else model
        mvp = mat4mul(view_proj, model)
        setup, attrs10 = prepare_draw(
            d.mesh, model, view_proj, mvp, normal_mat, light, d.color,
            d.shading, fw, fh, cull_backfaces, near_clip,
        )
        flags = pack_flags(d.shading == SHADING_PHONG, smp == "bilinear")
        payloads.append(pack_payload(attrs10, layout, m, flags))
        coefs.append(setup.coef)
        bboxes.append(setup.bbox)
        valids.append(setup.valid)

    coef = jnp.concatenate(coefs, axis=0)
    bbox = jnp.concatenate(bboxes, axis=0)
    valid = jnp.concatenate(valids, axis=0)
    payload = jnp.concatenate(payloads, axis=0)

    z, src, overflow = _render_fused_banded(
        coef, bbox, valid, payload, tex_lut, light, h, w,
        y_offset, x_offset, fh, fw,
        bilinear=scene_sampling if layout.has_uv else False,
        with_phong=any_phong, layout=layout, raster_opts=raster_opts,
    )
    win = z < fb.depth
    blended = blend_over(src, fb.color)
    out = Framebuffer(
        color=jnp.where(win[..., None], blended, fb.color),
        depth=jnp.where(win, z, fb.depth),
    )
    if not return_counters:
        return out
    from dtrenderer_tpu.debug import FrameCounters

    return out, FrameCounters(
        tris_submitted=jnp.int32(coef.shape[0]),
        tris_valid=jnp.sum(valid.astype(jnp.int32)),
        pixels_shaded=jnp.sum(win.astype(jnp.int32)),
        bin_overflow=overflow,
    )
