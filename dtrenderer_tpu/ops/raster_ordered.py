"""Tile-parallel ORDERED (submission-order) raster: the translucency kernel.

The reference's forward loop blends every triangle over the framebuffer in
submission order with depth writes (SURVEY.md CS-2) — semantics the order-free
fused path cannot reproduce for translucent geometry. The previous device
implementation (pipeline.draw_mesh_ordered) is a lax.scan over triangles:
O(T) sequential steps that leave the whole chip idle per step (59 ms for a
5k-tri mesh @1080p).

This kernel restores tile parallelism: pixel ownership is disjoint, so
submission order only matters PER PIXEL — each framebuffer tile can blend its
own triangles sequentially, and all tiles run in parallel over the Pallas
grid. Binning (binning.bin_triangles_flat(ordered=True)) gives each tile a
contiguous window of the sorted pair table holding ALL triangles that touch
the tile in strict id (== submission) order — broads are emitted into the
windows rather than a shared block, because an in-kernel merge of two
id-sorted lists would need vector->scalar extraction Mosaic can't do cheaply.

Per tile: DMA the tile's CHANNEL-MAJOR window (all 17+P channels; double-
buffered cross-step prefetch), then walk it one triangle per step: each step
gather-splats the triangle's channels (Mosaic has no [1,1] -> [tile_h,128]
broadcast — one _gather128 with a constant lane index splats 8 channels at a
time instead), evaluates the triangle over the whole [tile_h, 128] tile
(coverage + depth + perspective-correct attrs + texture + optional phong —
identical formulas to FORMULAS.md / pipeline.shade_deferred), and blends
source-over with a depth write (sequential in submission order — the blend
is inherently serial per pixel, but each step is a full-tile VPU op).

Reference: SURVEY.md §2 #4 blend semantics; VERDICT r3 weak #2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtrenderer_tpu.ops.binning import bin_triangles_flat
from dtrenderer_tpu.ops.render_fused import (
    FULL_LAYOUT, PayloadLayout, SAMPLE_BILINEAR, SAMPLE_NEAREST, _gather128,
)

F32 = jnp.float32
I32 = jnp.int32
INT_MAX = jnp.iinfo(jnp.int32).max


def _make_ordered_kernel(tile_h: int, capacity: int, tex_lanes: int,
                         sampling: int, with_phong: bool,
                         layout: PayloadLayout):
    assert not layout.has_flags and not layout.has_texmeta, (
        "ordered draws are single-draw: modes are static, texmeta is const")
    P = layout.n_payload
    n_cm = 17 + P                # channel-major rows: [coef16][id][payload]
    n_g = -(-n_cm // 8)          # sublane groups of 8 channels
    c0 = 17 + layout.c0          # corner-0 base channel
    stride = layout.corner_stride

    def kernel(counts_ref, starts_ref, off_ref, scal_ref, cm_ref,
               colort_ref, deptht_ref, tex_ref, oc_ref, od_ref, scr, sems):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        n_j = pl.num_programs(1)
        total = pl.num_programs(0) * n_j
        step = ti * n_j + tj
        slot = jax.lax.rem(step, 2)

        # Double-buffered cross-step prefetch of the tile's CHANNEL-MAJOR
        # window [n_g*8, capacity+128] (128-aligned lane offset; the delta
        # folds into the per-triangle lane index). The kernel reads
        # per-triangle values exclusively by GATHER-SPLAT: one _gather128
        # with a constant lane index splats 8 channels at once — Mosaic has
        # no [1,1] -> [tile_h,128] broadcast (hardware-gate finding), but
        # dynamic lane gathers and sublanes-only broadcasts are proven.
        def issue(s_idx, sl):
            s_i = s_idx // n_j
            s_j = jax.lax.rem(s_idx, n_j)
            start_al = (starts_ref[s_i, s_j] // 128) * 128
            pltpu.make_async_copy(
                cm_ref.at[:, pl.ds(start_al, capacity + 128)],
                scr.at[sl], sems.at[sl]).start()

        @pl.when(step == 0)
        def _cold():
            issue(step, slot)

        @pl.when(step + 1 < total)
        def _prefetch():
            issue(step + 1, jax.lax.rem(step + 1, 2))

        start_cur = starts_ref[ti, tj]
        start_al_cur = (start_cur // 128) * 128
        delta = start_cur - start_al_cur
        pltpu.make_async_copy(
            cm_ref.at[:, pl.ds(start_al_cur, capacity + 128)],
            scr.at[slot], sems.at[slot]).wait()

        n = counts_ref[ti, tj]
        y0 = ti * tile_h + off_ref[0, 0]
        x0 = tj * 128 + off_ref[0, 1]
        px = (jax.lax.broadcasted_iota(I32, (tile_h, 128), 1)
              + x0).astype(F32) + F32(0.5)
        py = (jax.lax.broadcasted_iota(I32, (tile_h, 128), 0)
              + y0).astype(F32) + F32(0.5)
        light_x = scal_ref[0, 0]
        light_y = scal_ref[0, 1]
        light_z = scal_ref[0, 2]
        ambient = scal_ref[0, 3]

        col_in = tuple(colort_ref[0, 0, c * tile_h:(c + 1) * tile_h, :]
                       for c in range(4))
        dep_in = deptht_ref[0, 0, :, :]

        def fetch(taps, inside):
            """Gather len(taps) texel indices ([tile_h,128] i32 each) from
            the planar VMEM LUT over the dynamic union of the 128-lane
            chunks COVERED pixels touch (uncovered lanes carry garbage uv;
            their fetched values are discarded by the blend mask, so they
            are only excluded from the RANGE)."""
            taps = [jnp.clip(t, 0, tex_lanes - 1) for t in taps]
            lo = jnp.min(jnp.stack(
                [jnp.min(jnp.where(inside, t, INT_MAX)) for t in taps])) // 128
            hi = jnp.max(jnp.stack(
                [jnp.max(jnp.where(inside, t, -1)) for t in taps])) // 128

            def body(j, out):
                start = pl.multiple_of(j * 128, 128)
                segs = [jnp.broadcast_to(tex_ref[ch:ch + 1, pl.ds(start, 128)],
                                         (tile_h, 128)) for ch in range(4)]
                res = [list(o) for o in out]
                for t_i, tp in enumerate(taps):
                    loc = tp - j * 128
                    sel = (loc >= 0) & (loc < 128)
                    loc = jnp.clip(loc, 0, 127)
                    for ch in range(4):
                        res[t_i][ch] = jnp.where(
                            sel, _gather128(segs[ch], loc), out[t_i][ch])
                return tuple(tuple(r) for r in res)

            zeros = tuple(
                tuple(jnp.zeros((tile_h, 128), F32) for _ in range(4))
                for _ in taps)
            return jax.lax.fori_loop(lo, hi + 1, body, zeros)

        def step_body(i, carry):
            """One triangle (window position i) over the whole tile, in
            submission order: FORMULAS.md coverage/interp/shade + source-over
            blend + depth write (identical math to pipeline.shade_deferred /
            draw_mesh_ordered's _blend_patch)."""
            r0, g0, b0c, a0, d0 = carry
            loc = i + delta
            jc = loc // 128
            lane = loc - jc * 128
            jc128 = pl.multiple_of(jc * 128, 128)
            lane_vec = jnp.full((8, 128), lane, I32)
            splat = [
                _gather128(scr[slot, g * 8:(g + 1) * 8, pl.ds(jc128, 128)],
                           lane_vec)
                for g in range(n_g)
            ]  # splat[g][j, :] == channel (g*8 + j), replicated over lanes

            def col(c):
                row = splat[c // 8][c % 8:c % 8 + 1, :]      # [1, 128]
                return jax.lax.broadcast_in_dim(             # sublanes-only
                    row, (tile_h, 128), (0, 1))

            E0 = (col(0) * px + col(1) * py) + col(2)
            E1 = (col(3) * px + col(4) * py) + col(5)
            E2 = (col(6) * px + col(7) * py) + col(8)
            acc0 = (E0 > 0) | ((E0 == 0) & (col(13) > 0))
            acc1 = (E1 > 0) | ((E1 == 0) & (col(14) > 0))
            acc2 = (E2 > 0) | ((E2 == 0) & (col(15) > 0))
            inside = acc0 & acc1 & acc2 & (i < n)
            b0 = E0 * col(9)
            b1 = E1 * col(9)
            b2 = E2 * col(9)
            z = (b0 * col(10) + b1 * col(11)) + b2 * col(12)

            def interp(off):
                return (b0 * col(c0 + off) + b1 * col(c0 + stride + off)) \
                    + b2 * col(c0 + 2 * stride + off)

            qf = interp(0)
            inv_qf = F32(1.0) / jnp.where(qf != 0, qf, F32(1.0))
            if layout.has_rgba and layout.mono_rgb:
                # gray corners (render_fused.PayloadLayout mono_rgb): one
                # channel reconstructs r == g == b; a*q == q (unit alpha)
                m = interp(layout.off_rgba) * inv_qf
                r = g = bb = m
                a = qf * inv_qf
            elif layout.has_rgba:
                o = layout.off_rgba
                r = interp(o) * inv_qf
                g = interp(o + 1) * inv_qf
                bb = interp(o + 2) * inv_qf
                a = interp(o + 3) * inv_qf
            else:
                w1 = qf * inv_qf
                r = g = bb = a = w1

            if layout.has_uv:
                u = interp(layout.off_uv) * inv_qf
                v = interp(layout.off_uv + 1) * inv_qf
                cbase, ctw, cth = layout.tex_const
                tw = jnp.full((tile_h, 128), F32(ctw))
                th = jnp.full((tile_h, 128), F32(cth))

                def texel_index(txf, tyf):
                    tx = jnp.clip(txf, 0, tw - 1).astype(I32)
                    ty = jnp.clip(tyf, 0, th - 1).astype(I32)
                    return I32(cbase) + ty * I32(ctw) + tx

                if sampling == SAMPLE_NEAREST:
                    (texel,) = fetch(
                        [texel_index(jnp.floor(u * tw),
                                     jnp.floor((F32(1.0) - v) * th))], inside)
                else:
                    fxs = u * tw - F32(0.5)
                    fys = (F32(1.0) - v) * th - F32(0.5)
                    x0f = jnp.floor(fxs)
                    y0f = jnp.floor(fys)
                    ax = fxs - x0f
                    ay = fys - y0f
                    t00, t10, t01, t11 = fetch(
                        [texel_index(x0f, y0f), texel_index(x0f + 1, y0f),
                         texel_index(x0f, y0f + 1),
                         texel_index(x0f + 1, y0f + 1)], inside)

                    def lerp2(p, q2, t):
                        return p + (q2 - p) * t

                    texel = [lerp2(lerp2(t00[c], t10[c], ax),
                                   lerp2(t01[c], t11[c], ax), ay)
                             for c in range(4)]
                src = [texel[0] * r, texel[1] * g, texel[2] * bb,
                       texel[3] * a]
            else:
                src = [r, g, bb, a]

            if with_phong:
                on = layout.off_n
                nx = interp(on) * inv_qf
                ny = interp(on + 1) * inv_qf
                nz = interp(on + 2) * inv_qf
                d = (nx * nx + ny * ny) + nz * nz
                nlen = jnp.sqrt(jnp.where(d > 0, d, F32(1.0)))
                nxh, nyh, nzh = nx / nlen, ny / nlen, nz / nlen
                ld = (light_x * light_x + light_y * light_y) \
                    + light_z * light_z
                llen = jnp.sqrt(ld)
                lxh, lyh, lzh = light_x / llen, light_y / llen, light_z / llen
                ndl = jnp.maximum((nxh * lxh + nyh * lyh) + nzh * lzh,
                                  F32(0.0))
                term = ambient + (F32(1.0) - ambient) * ndl
                src = [src[0] * term, src[1] * term, src[2] * term, src[3]]

            # sequential z-test + source-over blend + depth WRITE, exactly
            # the reference forward-loop step (FORMULAS.md blend_over)
            win = inside & (z < d0)
            one_m_a = F32(1.0) - src[3]
            return (
                jnp.where(win, src[0] + r0 * one_m_a, r0),
                jnp.where(win, src[1] + g0 * one_m_a, g0),
                jnp.where(win, src[2] + b0c * one_m_a, b0c),
                jnp.where(win, src[3] + a0 * one_m_a, a0),
                jnp.where(win, z, d0),
            )

        out = jax.lax.fori_loop(0, n, step_body, (*col_in, dep_in))
        for c in range(4):
            oc_ref[0, 0, c * tile_h:(c + 1) * tile_h, :] = out[c]
        od_ref[0, 0, :, :] = out[4]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "capacity", "sampling",
                     "with_phong", "interpret", "layout"),
)
def _render_from_ordered_bins(fbins, color, depth, offsets, scalars, tex_lut,
                              height, width, tile_h, capacity, sampling,
                              with_phong, interpret,
                              layout: PayloadLayout):
    counts, starts = fbins.counts, fbins.starts
    n_ty, n_tx = counts.shape
    tex_lanes = tex_lut.shape[1]
    Hp, Wp = n_ty * tile_h, n_tx * 128

    colp = jnp.pad(color, ((0, Hp - height), (0, Wp - width), (0, 0)))
    depp = jnp.pad(depth, ((0, Hp - height), (0, Wp - width)),
                   constant_values=jnp.inf)
    colt = jnp.transpose(
        colp.reshape(n_ty, tile_h, n_tx, 128, 4), (0, 2, 4, 1, 3)
    ).reshape(n_ty, n_tx, 4 * tile_h, 128)
    dept = jnp.transpose(
        depp.reshape(n_ty, tile_h, n_tx, 128), (0, 2, 1, 3))

    kernel = _make_ordered_kernel(tile_h, capacity, tex_lanes, sampling,
                                  with_phong, layout)
    oc, od = pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            pl.BlockSpec(memory_space=pl.ANY),       # table_cm (HBM)
            pl.BlockSpec((1, 1, 4 * tile_h, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tex LUT
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 4 * tile_h, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ty, n_tx, 4 * tile_h, 128), F32),
            jax.ShapeDtypeStruct((n_ty, n_tx, tile_h, 128), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, fbins.table_cm.shape[0], capacity + 128), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(counts, starts, offsets, scalars, fbins.table_cm, colt, dept, tex_lut)

    new_color = jnp.transpose(oc.reshape(n_ty, n_tx, 4, tile_h, 128),
                              (0, 3, 1, 4, 2)).reshape(Hp, Wp, 4)
    new_depth = jnp.transpose(od, (0, 2, 1, 3)).reshape(Hp, Wp)
    return new_color[:height, :width], new_depth[:height, :width]


def render_ordered(
    coef, bbox, valid, payload, tex_lut, light_dir, ambient,
    fb_color, fb_depth,
    height: int, width: int, y_offset=0, x_offset=0,
    tile_h: int = 16, capacity: int = 256, small_span: int = 16,
    broad_cap: int = 128, bilinear: bool = False, with_phong: bool = False,
    layout: PayloadLayout = FULL_LAYOUT, interpret: bool | None = None,
    pair_budget: int | None = None,
):
    """Submission-order draw into (fb_color, fb_depth). Returns
    (color, depth, overflow). Same argument conventions as render_fused;
    tile width is fixed at 128 (the tile maps 1:1 onto [tile_h, 128] vregs).

    overflow counts every dropped (tile, tri) pair (capacity, pair budget,
    broads beyond broad_cap) — a DROP CHANGES THE BLEND RESULT for every
    later triangle on those pixels, so callers must audit zero overflow
    (pipeline routes oversized cases to the lax.scan path instead)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = coef.shape[0]
    assert capacity % 128 == 0
    y_off = jnp.asarray(y_offset, I32)
    x_off = jnp.asarray(x_offset, I32)
    in_shard = (
        valid
        & (bbox[:, 2] >= x_off) & (bbox[:, 0] < x_off + width)
        & (bbox[:, 3] >= y_off) & (bbox[:, 1] < y_off + height)
    )
    local = jnp.stack(
        [
            jnp.clip(bbox[:, 0] - x_off, 0, width - 1),
            jnp.clip(bbox[:, 1] - y_off, 0, height - 1),
            jnp.clip(bbox[:, 2] - x_off, 0, width - 1),
            jnp.clip(bbox[:, 3] - y_off, 0, height - 1),
        ],
        axis=-1,
    )
    if pair_budget is None:
        pair_budget = 3 * T
    fbins = bin_triangles_flat(
        coef, local, in_shard, height, width,
        tile_h=tile_h, tile_w=128, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap, payload=payload,
        pair_budget=int(pair_budget), ordered=True,
    )
    offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
    scalars = jnp.asarray(
        [[light_dir[0], light_dir[1], light_dir[2], ambient,
          0.0, 0.0, 0.0, 0.0]], F32)
    sampling = SAMPLE_BILINEAR if bilinear else SAMPLE_NEAREST
    color, depth = _render_from_ordered_bins(
        fbins, fb_color, fb_depth, offsets, scalars, tex_lut,
        height, width, tile_h, capacity, sampling, with_phong,
        interpret, layout)
    return color, depth, fbins.overflow
