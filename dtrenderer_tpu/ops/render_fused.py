"""Fully-fused tiled draw kernel: visibility + interpolation + texture + lighting
in ONE Pallas kernel per framebuffer tile.

This is the TPU-native equivalent of the reference's entire per-pixel hot loop
(SURVEY.md CS-2 ★HOT LOOP: edge fns -> barycentrics -> z-test -> perspective-correct
UV -> texel fetch -> light/modulate -> blend) with zero per-pixel HBM random access:

  phase 1 (visibility): walk the tile's binned triangle list in chunks of 8 on the
    sublane axis, pixels flat on lanes; resolve the winner per pixel as a
    (min depth, min id) reduction, tracking the winner's BIN SLOT.
  phase 2 (shading): for each 8x128 pixel group, fetch the winner's 44 setup/attr
    channels from the tile's channel-major VMEM block by slot — TPU's dynamic
    lane-gather only spans 128 lanes, so gathers run as a static K/128-chunk loop of
    select+gather; textures live in VMEM as planar channel rows and are sampled with
    the same chunked-gather trick (nearest or bilinear), then modulate/Phong-light.

Blending + depth-merge against the existing framebuffer stay in XLA (pure elementwise,
fused for free). All formulas/op order mirror FORMULAS.md / ops/geometry.py exactly,
so images match the scalar oracle and the jnp reference path.

Channel layout (C = 51; binning packs [16 coef][id][payload 34]):
  0..15 coef  16 id
  17 tex_base 18 tw 19 th 20 is_phong
  21..30 corner0 (q, u*q, v*q, r*q, g*q, b*q, a*q, nx*q, ny*q, nz*q)
  31..40 corner1   41..50 corner2
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtrenderer_tpu.ops.binning import bin_triangles

F32 = jnp.float32
I32 = jnp.int32

CHUNK = 8
INT_MAX = jnp.iinfo(jnp.int32).max
N_CHANNELS = 51
PAYLOAD_CHANNELS = N_CHANNELS - 17

# payload channel indices WITHIN the packed setup row
CH_TEXBASE, CH_TW, CH_TH, CH_ISPHONG = 17, 18, 19, 20
CH_C0 = 21  # corner0 base; corner stride 10


def _gather128(seg, idx):
    """seg [8,128] f32, idx [8,128] i32 in [0,128) -> seg[r, idx[r, l]]."""
    return jnp.take_along_axis(seg, idx, axis=1)


def _make_kernel(tile_h: int, tile_w: int, capacity: int, tex_lanes: int,
                 bilinear: bool, with_phong: bool, chunk: int = CHUNK,
                 skip_shading: bool = False):
    n_pix = tile_h * tile_w
    assert n_pix % 1024 == 0, "tile must hold a multiple of 1024 pixels"
    k_chunks = capacity // 128
    t_chunks = tex_lanes // 128

    def kernel(counts_ref, off_ref, scal_ref, setup_ref, tex_ref,
               z_ref, src_ref, tsetup_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        n = counts_ref[ti, tj]
        y0 = ti * tile_h + off_ref[0, 0]
        x0 = tj * tile_w + off_ref[0, 1]

        # Empty tile: write background and skip both phases entirely.
        @pl.when(n == 0)
        def _empty():
            z_ref[...] = jnp.full((1, 1, 1, n_pix), jnp.inf, F32)
            src_ref[...] = jnp.zeros((1, 1, 4, n_pix), F32)

        @pl.when(n > 0)
        def _full():
            _tile_body(ti, tj, n, y0, x0, scal_ref, setup_ref,
                       tex_ref, z_ref, src_ref, tsetup_ref)

    def _tile_body(ti, tj, n, y0, x0, scal_ref, setup_ref,
                   tex_ref, z_ref, src_ref, tsetup_ref):
        # ------------------------- phase 1: visibility -------------------------
        flat = jax.lax.broadcasted_iota(I32, (1, n_pix), 1)
        fx = flat % tile_w
        fy = flat // tile_w
        px = (fx + x0).astype(F32) + F32(0.5)  # [1, N]
        py = (fy + y0).astype(F32) + F32(0.5)

        def chunk_body(c, carry):
            best_z, best_id, best_slot = carry  # [1, N]
            k0 = pl.multiple_of(c * chunk, chunk)
            s = setup_ref[0, 0, pl.ds(k0, chunk), :]  # [chunk, C]

            def col(i):
                return s[:, i:i + 1]  # [CHUNK, 1]

            A0, B0, C0 = col(0), col(1), col(2)
            A1, B1, C1 = col(3), col(4), col(5)
            A2, B2, C2 = col(6), col(7), col(8)
            inv_area2 = col(9)
            z0, z1, z2 = col(10), col(11), col(12)
            tl0, tl1, tl2 = col(13), col(14), col(15)
            ids = jax.lax.bitcast_convert_type(col(16), I32)

            E0 = (A0 * px + B0 * py) + C0
            E1 = (A1 * px + B1 * py) + C1
            E2 = (A2 * px + B2 * py) + C2
            acc0 = (E0 > 0) | ((E0 == 0) & (tl0 > 0))
            acc1 = (E1 > 0) | ((E1 == 0) & (tl1 > 0))
            acc2 = (E2 > 0) | ((E2 == 0) & (tl2 > 0))
            inside = acc0 & acc1 & acc2 & (ids >= 0)

            b0 = E0 * inv_area2
            b1 = E1 * inv_area2
            b2 = E2 * inv_area2
            z = (b0 * z0 + b1 * z1) + b2 * z2

            zsel = jnp.where(inside, z, jnp.inf)
            zmin = jnp.min(zsel, axis=0, keepdims=True)
            hit = inside & (zsel == zmin)
            idsel = jnp.where(hit, ids, INT_MAX)
            idmin = jnp.min(idsel, axis=0, keepdims=True)
            slots = k0 + jax.lax.broadcasted_iota(I32, (chunk, 1), 0)
            slotsel = jnp.where(hit & (ids == idmin), slots, INT_MAX)
            slotmin = jnp.min(slotsel, axis=0, keepdims=True)

            take = (zmin < best_z) | ((zmin == best_z) & (idmin < best_id))
            return (
                jnp.where(take, zmin, best_z),
                jnp.where(take, idmin, best_id),
                jnp.where(take, slotmin, best_slot),
            )

        init = (
            jnp.full((1, n_pix), jnp.inf, F32),
            jnp.full((1, n_pix), INT_MAX, I32),
            jnp.full((1, n_pix), 0, I32),
        )
        best_z, _best_id, best_slot = jax.lax.fori_loop(
            0, pl.cdiv(n, chunk), chunk_body, init
        )
        z_ref[...] = best_z.reshape(1, 1, 1, n_pix)

        if skip_shading:  # perf-debug mode: visibility only
            src_ref[...] = jnp.zeros((1, 1, 4, n_pix), F32)
            return

        # ------------------------- phase 2: shading ---------------------------
        # One in-kernel transpose to channel-major [C, K] (instead of shipping a
        # second pre-transposed copy through HBM — halves binning memory/traffic).
        tsetup_ref[...] = jnp.transpose(setup_ref[0, 0], (1, 0))
        n_batches = n_pix // 1024
        for pt in range(n_batches):
            # Batch 8 contiguous 128-pixel groups onto the 8 sublanes by
            # CONCATENATING [1,128] slices (Mosaic cannot shape-cast lanes into
            # sublanes, but sublane concat is a plain pack). Row r of every
            # [8,128] tensor below is flat pixels [pt*1024 + r*128, ... + 128).
            def rows8(vec):
                return jnp.concatenate(
                    [vec[0:1, (pt * 8 + r) * 128:(pt * 8 + r + 1) * 128]
                     for r in range(8)],
                    axis=0,
                )

            sl = rows8(best_slot)
            covered = rows8(best_z) != jnp.inf

            # Skip fully-uncovered batches (background/sky): write zeros only.
            cov_any = jnp.any(covered)

            @pl.when(jnp.logical_not(cov_any))
            def _sky():
                zero = jnp.zeros((1, 128), F32)
                for ch in range(4):
                    for r in range(8):
                        src_ref[0, 0, ch:ch + 1,
                                pl.ds((pt * 8 + r) * 128, 128)] = zero

            @pl.when(cov_any)
            def _shade():
                _shade_batch(pt, sl, covered, x0, y0, scal_ref, tsetup_ref,
                             tex_ref, src_ref)

    def _shade_batch(pt, sl, covered, x0, y0, scal_ref, tsetup_ref, tex_ref,
                     src_ref):
            light_x = scal_ref[0, 0]
            light_y = scal_ref[0, 1]
            light_z = scal_ref[0, 2]
            ambient = scal_ref[0, 3]

            # Gather all channels for this pixel batch: chunked 128-lane gathers.
            vals = [jnp.zeros((8, 128), F32) for _ in range(N_CHANNELS)]
            for j in range(k_chunks):
                loc = sl - j * 128
                sel = (loc >= 0) & (loc < 128)
                loc = jnp.clip(loc, 0, 127)
                for ch in range(N_CHANNELS):
                    if ch == 16:
                        continue  # id bits unused in shading
                    seg = jnp.broadcast_to(
                        tsetup_ref[ch:ch + 1, pl.ds(j * 128, 128)], (8, 128)
                    )
                    vals[ch] = jnp.where(sel, _gather128(seg, loc), vals[ch])

            # Pixel coordinates (flat = pt*1024 + r*128 + lane).
            rr = jax.lax.broadcasted_iota(I32, (8, 128), 0)
            ll = jax.lax.broadcasted_iota(I32, (8, 128), 1)
            flat8 = pt * 1024 + rr * 128 + ll
            gx = (flat8 % tile_w + x0).astype(F32) + F32(0.5)
            gy = (flat8 // tile_w + y0).astype(F32) + F32(0.5)

            # Barycentrics at the winner (identical formulas to phase 1).
            E0 = (vals[0] * gx + vals[1] * gy) + vals[2]
            E1 = (vals[3] * gx + vals[4] * gy) + vals[5]
            E2 = (vals[6] * gx + vals[7] * gy) + vals[8]
            b0 = E0 * vals[9]
            b1 = E1 * vals[9]
            b2 = E2 * vals[9]

            def interp(off):
                a0 = vals[CH_C0 + off]
                a1 = vals[CH_C0 + 10 + off]
                a2 = vals[CH_C0 + 20 + off]
                return (b0 * a0 + b1 * a1) + b2 * a2

            qf = interp(0)
            inv_qf = F32(1.0) / jnp.where(qf != 0, qf, F32(1.0))
            u = interp(1) * inv_qf
            v = interp(2) * inv_qf
            r = interp(3) * inv_qf
            g = interp(4) * inv_qf
            bcol = interp(5) * inv_qf
            a = interp(6) * inv_qf

            # Texture sampling from the VMEM LUT (FORMULAS.md formulas).
            tw = vals[CH_TW]
            th = vals[CH_TH]
            base = vals[CH_TEXBASE]

            def fetch(tidx):
                """tidx [8,128] i32 absolute LUT index -> 4 channel values."""
                out = [jnp.zeros((8, 128), F32) for _ in range(4)]
                for j in range(t_chunks):
                    loc = tidx - j * 128
                    sel = (loc >= 0) & (loc < 128)
                    loc = jnp.clip(loc, 0, 127)
                    for ch in range(4):
                        seg = jnp.broadcast_to(
                            tex_ref[ch:ch + 1, pl.ds(j * 128, 128)], (8, 128)
                        )
                        out[ch] = jnp.where(sel, _gather128(seg, loc), out[ch])
                return out

            def texel_index(txf, tyf):
                tx = jnp.clip(txf, 0, tw - 1)
                ty = jnp.clip(tyf, 0, th - 1)
                return (base + ty * tw + tx).astype(I32)

            if not bilinear:
                txf = jnp.floor(u * tw)
                tyf = jnp.floor((F32(1.0) - v) * th)
                t0 = fetch(texel_index(txf, tyf))
                texel = t0
            else:
                fxs = u * tw - F32(0.5)
                fys = (F32(1.0) - v) * th - F32(0.5)
                x0f = jnp.floor(fxs)
                y0f = jnp.floor(fys)
                ax = fxs - x0f
                ay = fys - y0f
                t00 = fetch(texel_index(x0f, y0f))
                t10 = fetch(texel_index(x0f + 1, y0f))
                t01 = fetch(texel_index(x0f, y0f + 1))
                t11 = fetch(texel_index(x0f + 1, y0f + 1))

                def lerp2(p, q2, t):
                    return p + (q2 - p) * t

                texel = [
                    lerp2(lerp2(t00[c], t10[c], ax), lerp2(t01[c], t11[c], ax), ay)
                    for c in range(4)
                ]

            src = [texel[0] * r, texel[1] * g, texel[2] * bcol, texel[3] * a]

            if with_phong:
                # FORMULAS.md lighting: true divide + sqrt (no reciprocal-multiply)
                # so values match shading.light_term / the oracle.
                nx = interp(7) * inv_qf
                ny = interp(8) * inv_qf
                nz = interp(9) * inv_qf
                d = (nx * nx + ny * ny) + nz * nz
                nlen = jnp.sqrt(jnp.where(d > 0, d, F32(1.0)))
                nxh, nyh, nzh = nx / nlen, ny / nlen, nz / nlen
                ld = (light_x * light_x + light_y * light_y) + light_z * light_z
                llen = jnp.sqrt(ld)
                lxh, lyh, lzh = light_x / llen, light_y / llen, light_z / llen
                ndl = (nxh * lxh + nyh * lyh) + nzh * lzh
                ndl = jnp.maximum(ndl, F32(0.0))
                term = ambient + (F32(1.0) - ambient) * ndl
                term = jnp.where(vals[CH_ISPHONG] > 0, term, F32(1.0))
                src = [src[0] * term, src[1] * term, src[2] * term, src[3]]

            for ch in range(4):
                out = jnp.where(covered, src[ch], F32(0.0))
                for row in range(8):
                    src_ref[
                        0, 0, ch:ch + 1,
                        pl.ds((pt * 8 + row) * 128, 128),
                    ] = out[row:row + 1, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "bilinear", "with_phong", "interpret", "chunk",
                     "skip_shading"),
)
def _render_from_bins(setup, counts, offsets, scalars, tex_lut,
                      height, width, tile_h, tile_w, capacity,
                      bilinear, with_phong, interpret, chunk=CHUNK,
                      skip_shading=False):
    n_ty, n_tx = counts.shape
    n_pix = tile_h * tile_w
    tex_lanes = tex_lut.shape[1]

    kernel = _make_kernel(tile_h, tile_w, capacity, tex_lanes, bilinear,
                          with_phong, chunk, skip_shading)
    z_flat, src_flat = pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, capacity, N_CHANNELS), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((N_CHANNELS, capacity), F32)],
        out_specs=[
            pl.BlockSpec((1, 1, 1, n_pix), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, n_pix), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ty, n_tx, 1, n_pix), F32),
            jax.ShapeDtypeStruct((n_ty, n_tx, 4, n_pix), I32 if False else F32),
        ],
        interpret=interpret,
    )(counts, offsets, scalars, setup, tex_lut)

    def unflatten(a, ch):
        a = a.reshape(n_ty, n_tx, ch, tile_h, tile_w)
        a = jnp.transpose(a, (2, 0, 3, 1, 4)).reshape(
            ch, n_ty * tile_h, n_tx * tile_w
        )
        return a[:, :height, :width]

    z = unflatten(z_flat, 1)[0]
    src = jnp.transpose(unflatten(src_flat, 4), (1, 2, 0))  # [H, W, 4]
    return z, src


def make_texture_lut(textures):
    """Pack textures (list of premultiplied linear f32 [th, tw, 4]) into one planar
    LUT [4, L_pad] plus per-texture (base, tw, th) metadata."""
    rows = []
    meta = []
    base = 0
    for tex in textures:
        th, tw = int(tex.shape[0]), int(tex.shape[1])
        rows.append(tex.reshape(-1, 4))
        meta.append((base, tw, th))
        base += th * tw
    flat = jnp.concatenate(rows, axis=0)  # [L, 4]
    pad = (-flat.shape[0]) % 128
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    return jnp.transpose(flat, (1, 0)), meta  # [4, L_pad]


def render_fused(
    coef,
    bbox,
    valid,
    payload,
    tex_lut,
    light_dir,
    ambient,
    height: int,
    width: int,
    y_offset=0,
    x_offset=0,
    tile_h: int = 32,
    tile_w: int = 128,
    capacity: int = 512,
    small_span: int = 16,
    broad_cap: int = 128,
    bilinear: bool = False,
    with_phong: bool = True,
    interpret: bool | None = None,
    chunk: int = CHUNK,
    skip_shading: bool = False,
):
    """Fused visibility+shading draw. Returns (z [H,W], src color [H,W,4]).

    payload: f32 [T, 34] per-triangle channels (see module docstring). tex_lut:
    [4, L_pad] planar texture LUT from make_texture_lut. The caller merges the
    result into a framebuffer: win = (z < fb.depth), color = where(win,
    blend_over(src, fb.color), fb.color).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert capacity % 128 == 0, "capacity must be a multiple of 128"
    assert payload.shape[1] == PAYLOAD_CHANNELS

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

    bins = bin_triangles(
        coef, local, in_shard, height, width,
        tile_h=tile_h, tile_w=tile_w, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap,
        payload=payload,
    )
    offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
    scalars = jnp.asarray(
        [[light_dir[0], light_dir[1], light_dir[2], ambient,
          0.0, 0.0, 0.0, 0.0]], F32
    )
    return _render_from_bins(
        bins.setup, bins.counts, offsets, scalars, tex_lut,
        height, width, tile_h, tile_w, capacity, bilinear, with_phong,
        interpret, chunk, skip_shading,
    )
