"""Fully-fused tiled draw kernel: visibility + interpolation + texture + lighting
in ONE Pallas kernel per framebuffer tile.

This is the TPU-native equivalent of the reference's entire per-pixel hot loop
(SURVEY.md CS-2 ★HOT LOOP: edge fns -> barycentrics -> z-test -> perspective-correct
UV -> texel fetch -> light/modulate -> blend) with zero per-pixel HBM random access:

  phase 1 (visibility): walk the tile's binned triangle list in chunks on the
    sublane axis, pixels flat on lanes; resolve the winner per pixel as a
    (min depth, min id) reduction, carrying the winner's BIN SLOT and its
    BARYCENTRICS (so phase 2 never re-touches the edge coefficients).
  phase 2 (shading): per 8x128 pixel batch (built by sublane-concat — Mosaic can't
    shape-cast lanes to sublanes), fetch the winner's 34 payload channels from the
    channel-major VMEM block by slot. TPU's dynamic lane-gather spans one 128-lane
    vreg, so gathers run as a loop of select+gather over 128-entry chunks — over
    the DYNAMIC [min,max] chunk range only (winner slots and UVs are spatially
    coherent). Textures live in VMEM as planar channel rows, sampled the same way
    (nearest or bilinear), then modulate + optional per-pixel Phong.

Blending + depth-merge against the existing framebuffer stay in XLA (pure
elementwise, fused for free). All formulas/op order mirror FORMULAS.md /
ops/geometry.py exactly, so images match the scalar oracle and the jnp paths.

Packed setup channel layout (C = 53;
binning packs [16 coef][id][payload 34][ybounds 2]):
  0..15 coef  16 id
  payload (also shipped channel-major as payload_t [34, K]):
    0 tex_base 1 tw 2 th 3 flags (bit0 phong, bit1 bilinear — see pack_flags)
    4..13 corner0 (q, u*q, v*q, r*q, g*q, b*q, a*q, nx*q, ny*q, nz*q)
    14..23 corner1   24..33 corner2
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
PAYLOAD_CHANNELS = 34
# setup layout: [16 coef][1 id][34 payload][2 ybounds] (binning with_ybounds)
N_CHANNELS = 17 + PAYLOAD_CHANNELS + 2
Y0_CH = 17 + PAYLOAD_CHANNELS      # triangle's local bbox y0 (pixel row, f32)
Y1_CH = Y0_CH + 1                  # and y1 (inclusive)

# payload-relative channel indices. P_FLAGS packs per-triangle mode bits:
# bit 0 = phong shading, bit 1 = bilinear sampling (per-DRAW modes ride the
# payload so one batched kernel call can mix modes across draws).
P_TEXBASE, P_TW, P_TH, P_FLAGS = 0, 1, 2, 3
P_C0 = 4  # corner0 base; corner stride 10

# sampling-mode static values for the kernel
SAMPLE_NEAREST, SAMPLE_BILINEAR, SAMPLE_MIXED = 0, 1, 2

# The packed texture LUT lives whole in VMEM (~16 MB/core): 4 channels x f32 =
# 16 B/texel. Hard ceiling for render_fused; pipeline.* auto-falls back to the
# pallas+deferred path (HBM texture gathers) at TEX_BUDGET_TEXELS, well below.
TEX_LUT_MAX_TEXELS = 1 << 19   # 512K texels = 8 MB
TEX_BUDGET_TEXELS = 1 << 18    # 256K texels = 4 MB (auto-fallback threshold)


def pack_flags(is_phong: bool, is_bilinear: bool) -> float:
    """Per-triangle P_FLAGS payload value."""
    return float(int(is_phong) + 2 * int(is_bilinear))


def _gather128(seg, idx):
    """seg [8,128] f32, idx [8,128] i32 in [0,128) -> seg[r, idx[r, l]]."""
    return jnp.take_along_axis(seg, idx, axis=1)


def _make_kernel(tile_h: int, tile_w: int, capacity: int, tex_lanes: int,
                 sampling: int, with_phong: bool, chunk: int = CHUNK,
                 skip_shading: bool = False, cols: int = 1):
    n_pix = tile_h * tile_w
    assert n_pix % 1024 == 0, "tile must hold a multiple of 1024 pixels"

    n_slabs = tile_h // 8
    slab_pix = 8 * tile_w
    assert tile_h % 8 == 0, "tile_h must be a multiple of 8 (VPU sublanes)"

    def kernel(counts_ref, off_ref, scal_ref, setup_ref, payload_t_ref,
               tex_ref, z_ref, src_ref):
        # One grid step processes `cols` adjacent tile columns (amortizes the
        # fixed per-step cost, which dominates for small tiles).
        ti = pl.program_id(0)
        tjb = pl.program_id(1)
        for g in range(cols):
            tj = tjb * cols + g
            n = counts_ref[ti, tj]
            ty_base = ti * tile_h  # tile's first LOCAL pixel row (ybounds space)
            y0 = ty_base + off_ref[0, 0]
            x0 = tj * tile_w + off_ref[0, 1]

            # Empty tile: write background and skip both phases entirely.
            @pl.when(n == 0)
            def _empty(g=g):
                z_ref[0, g, 0:1, :] = jnp.full((1, n_pix), jnp.inf, F32)
                src_ref[0, g, :, :] = jnp.zeros((4, n_pix), F32)

            @pl.when(n > 0)
            def _full(g=g, n=n, ty_base=ty_base, y0=y0, x0=x0):
                _tile_body(g, n, ty_base, y0, x0, scal_ref, setup_ref,
                           payload_t_ref, tex_ref, z_ref, src_ref)

    def _tile_body(gcol, n, ty_base, y0, x0, scal_ref, setup_ref,
                   payload_t_ref, tex_ref, z_ref, src_ref):
        # --------------------- phase 1: visibility (slab loop) ---------------
        # The tile is processed in 8-row SLABS. Bins are y-sorted (binning
        # with_ybounds) and each slot carries its bbox y0/y1, so a whole
        # (slab, chunk) pair skips via one scalar test when the chunk's y range
        # misses the slab — for small triangles (~tens of px) this culls the
        # bulk of phase 1's per-pixel edge work. Depth resolve is order-free,
        # so slab/bin ordering never changes the image (FORMULAS.md).
        n_chunks = pl.cdiv(n, chunk)

        def make_slab(s_i):
            flat = jax.lax.broadcasted_iota(I32, (1, slab_pix), 1)
            fx = flat % tile_w
            fy = flat // tile_w + s_i * 8
            px = (fx + x0).astype(F32) + F32(0.5)  # [1, slab_pix]
            py = (fy + y0).astype(F32) + F32(0.5)
            slab_lo = (ty_base + s_i * 8).astype(F32)
            slab_hi = (ty_base + s_i * 8 + 7).astype(F32)

            def chunk_body(c, carry):
                k0 = pl.multiple_of(c * chunk, chunk)
                yb = setup_ref[0, gcol, pl.ds(k0, chunk), Y0_CH:Y1_CH + 1]
                cmin = jnp.min(yb[:, 0])
                cmax = jnp.max(yb[:, 1])
                overlap = (cmin <= slab_hi) & (cmax >= slab_lo)

                def do(carry):
                    best_z, best_id, best_slot, bb0, bb1, bb2 = carry
                    s = setup_ref[0, gcol, pl.ds(k0, chunk), :]  # [chunk, C]

                    def col(i):
                        return s[:, i:i + 1]  # [chunk, 1]

                    A0, B0, C0 = col(0), col(1), col(2)
                    A1, B1, C1 = col(3), col(4), col(5)
                    A2, B2, C2 = col(6), col(7), col(8)
                    inv_area2 = col(9)
                    z0, z1, z2 = col(10), col(11), col(12)
                    tl0, tl1, tl2 = col(13), col(14), col(15)
                    ids = jax.lax.bitcast_convert_type(col(16), I32)

                    # FORMULAS.md coverage + depth (same op order as geometry.py).
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
                    win = hit & (ids == idmin)  # exactly the winner row
                    slots = k0 + jax.lax.broadcasted_iota(I32, (chunk, 1), 0)
                    slotmin = jnp.min(jnp.where(win, slots, INT_MAX), axis=0,
                                      keepdims=True)
                    # The winner's barycentrics (phase 2 reuses them verbatim).
                    wb0 = jnp.min(jnp.where(win, b0, jnp.inf), axis=0,
                                  keepdims=True)
                    wb1 = jnp.min(jnp.where(win, b1, jnp.inf), axis=0,
                                  keepdims=True)
                    wb2 = jnp.min(jnp.where(win, b2, jnp.inf), axis=0,
                                  keepdims=True)

                    take = (zmin < best_z) | ((zmin == best_z) &
                                              (idmin < best_id))
                    return (
                        jnp.where(take, zmin, best_z),
                        jnp.where(take, idmin, best_id),
                        jnp.where(take, slotmin, best_slot),
                        jnp.where(take, wb0, bb0),
                        jnp.where(take, wb1, bb1),
                        jnp.where(take, wb2, bb2),
                    )

                return jax.lax.cond(overlap, do, lambda c_: c_, carry)

            zero = jnp.zeros((1, slab_pix), F32)
            init = (
                jnp.full((1, slab_pix), jnp.inf, F32),
                jnp.full((1, slab_pix), INT_MAX, I32),
                jnp.full((1, slab_pix), 0, I32),
                zero, zero, zero,
            )
            return jax.lax.fori_loop(0, n_chunks, chunk_body, init)

        slab_results = [make_slab(s_i) for s_i in range(n_slabs)]
        best_z, _best_id, best_slot, bb0, bb1, bb2 = (
            jnp.concatenate([r[k] for r in slab_results], axis=1)
            for k in range(6)
        )
        z_ref[0, gcol, 0:1, :] = best_z

        if skip_shading:  # perf-debug mode: visibility only
            src_ref[0, gcol, :, :] = jnp.zeros((4, n_pix), F32)
            return

        # ------------------------- phase 2: shading ---------------------------
        n_batches = n_pix // 1024
        for pt in range(n_batches):
            # Skip fully-uncovered batches (background/sky) BEFORE any batch
            # prep: one reduction over the contiguous [1,1024] depth slice.
            cov_any = jnp.any(
                best_z[0:1, pt * 1024:(pt + 1) * 1024] != jnp.inf
            )

            @pl.when(jnp.logical_not(cov_any))
            def _sky(pt=pt):
                zrow = jnp.zeros((1, 128), F32)
                for ch in range(4):
                    for row in range(8):
                        src_ref[0, gcol, ch:ch + 1,
                                pl.ds((pt * 8 + row) * 128, 128)] = zrow

            @pl.when(cov_any)
            def _shade(pt=pt):
                _shade_batch(gcol, pt, best_z, best_slot, bb0, bb1, bb2,
                             scal_ref, payload_t_ref, tex_ref, src_ref)

    def _shade_batch(gcol, pt, best_z, best_slot, bb0, bb1, bb2, scal_ref,
                     payload_t_ref, tex_ref, src_ref):
        # Batch 8 contiguous 128-pixel groups onto the 8 sublanes by
        # CONCATENATING [1,128] slices. Row r covers flat pixels
        # [pt*1024 + r*128, ... + 128).
        def rows8(vec):
            return jnp.concatenate(
                [vec[0:1, (pt * 8 + r) * 128:(pt * 8 + r + 1) * 128]
                 for r in range(8)],
                axis=0,
            )

        sl = rows8(best_slot)
        covered = rows8(best_z) != jnp.inf
        b0 = rows8(bb0)
        b1 = rows8(bb1)
        b2 = rows8(bb2)
        light_x = scal_ref[0, 0]
        light_y = scal_ref[0, 1]
        light_z = scal_ref[0, 2]
        ambient = scal_ref[0, 3]

        # Winner slots within a batch are spatially coherent: loop only the
        # dynamic [min, max] 128-slot chunk range actually referenced.
        sl_c = jnp.clip(sl, 0, capacity - 1)
        jmin = jnp.min(sl_c) // 128
        jmax = jnp.max(sl_c) // 128

        def gather_chunk(j, vals):
            start = pl.multiple_of(j * 128, 128)
            loc = sl_c - j * 128
            sel = (loc >= 0) & (loc < 128)
            loc = jnp.clip(loc, 0, 127)
            out = []
            for p in range(PAYLOAD_CHANNELS):
                seg = jnp.broadcast_to(
                    payload_t_ref[0, gcol, p:p + 1, pl.ds(start, 128)], (8, 128)
                )
                out.append(jnp.where(sel, _gather128(seg, loc), vals[p]))
            return tuple(out)

        vals = tuple(jnp.zeros((8, 128), F32) for _ in range(PAYLOAD_CHANNELS))
        vals = jax.lax.fori_loop(jmin, jmax + 1, gather_chunk, vals)

        def interp(off):
            a0 = vals[P_C0 + off]
            a1 = vals[P_C0 + 10 + off]
            a2 = vals[P_C0 + 20 + off]
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
        tw = vals[P_TW]
        th = vals[P_TH]
        base = vals[P_TEXBASE]

        def fetch(tidx):
            """tidx [8,128] i32 absolute LUT index -> 4 channel values.

            UVs are coherent within a batch: loop only the dynamic [min, max]
            128-texel chunk range touched."""
            tidx = jnp.clip(tidx, 0, tex_lanes - 1)  # NaN/garbage guard
            tjmin = jnp.min(tidx) // 128
            tjmax = jnp.max(tidx) // 128

            def body(j, out):
                start = pl.multiple_of(j * 128, 128)
                loc = tidx - j * 128
                sel = (loc >= 0) & (loc < 128)
                loc = jnp.clip(loc, 0, 127)
                res = []
                for ch in range(4):
                    seg = jnp.broadcast_to(
                        tex_ref[ch:ch + 1, pl.ds(start, 128)], (8, 128)
                    )
                    res.append(jnp.where(sel, _gather128(seg, loc), out[ch]))
                return tuple(res)

            out = tuple(jnp.zeros((8, 128), F32) for _ in range(4))
            return jax.lax.fori_loop(tjmin, tjmax + 1, body, out)

        def texel_index(txf, tyf):
            # Index arithmetic in int32: f32 loses integer precision at 2^24, so
            # base + ty*tw + tx must not be combined as floats (make_texture_lut
            # also guards the LUT size).
            tx = jnp.clip(txf, 0, tw - 1).astype(I32)
            ty = jnp.clip(tyf, 0, th - 1).astype(I32)
            return base.astype(I32) + ty * tw.astype(I32) + tx

        if sampling == SAMPLE_NEAREST:
            txf = jnp.floor(u * tw)
            tyf = jnp.floor((F32(1.0) - v) * th)
            texel = fetch(texel_index(txf, tyf))
        else:
            fxs = u * tw - F32(0.5)
            fys = (F32(1.0) - v) * th - F32(0.5)
            x0f = jnp.floor(fxs)
            y0f = jnp.floor(fys)
            ax = fxs - x0f
            ay = fys - y0f
            taps = [
                texel_index(x0f, y0f),
                texel_index(x0f + 1, y0f),
                texel_index(x0f, y0f + 1),
                texel_index(x0f + 1, y0f + 1),
            ]
            if sampling == SAMPLE_MIXED:
                # 5th tap: the nearest texel, fetched in the SAME union loop;
                # per-pixel P_FLAGS bit 1 selects bilinear vs nearest below.
                taps.append(texel_index(jnp.floor(u * tw),
                                        jnp.floor((F32(1.0) - v) * th)))
            taps = [jnp.clip(tp, 0, tex_lanes - 1) for tp in taps]
            n_taps = len(taps)
            # One loop over the UNION of all taps' chunk ranges: the taps are
            # within one texel row of each other, so ranges nearly coincide.
            tjmin = jnp.min(jnp.stack([jnp.min(tp) for tp in taps])) // 128
            tjmax = jnp.max(jnp.stack([jnp.max(tp) for tp in taps])) // 128

            def body_taps(j, out):
                start = pl.multiple_of(j * 128, 128)
                segs = [tex_ref[ch:ch + 1, pl.ds(start, 128)] for ch in range(4)]
                segs = [jnp.broadcast_to(s_, (8, 128)) for s_ in segs]
                res = [list(o) for o in out]
                for ti_, tp in enumerate(taps):
                    loc = tp - j * 128
                    sel = (loc >= 0) & (loc < 128)
                    loc = jnp.clip(loc, 0, 127)
                    for ch in range(4):
                        res[ti_][ch] = jnp.where(
                            sel, _gather128(segs[ch], loc), out[ti_][ch]
                        )
                return tuple(tuple(r) for r in res)

            zeros_taps = tuple(
                tuple(jnp.zeros((8, 128), F32) for _ in range(4))
                for _ in range(n_taps)
            )
            fetched = jax.lax.fori_loop(tjmin, tjmax + 1, body_taps, zeros_taps)
            t00, t10, t01, t11 = fetched[:4]

            def lerp2(p, q2, t):
                return p + (q2 - p) * t

            texel = [
                lerp2(lerp2(t00[c], t10[c], ax), lerp2(t01[c], t11[c], ax), ay)
                for c in range(4)
            ]
            if sampling == SAMPLE_MIXED:
                tn = fetched[4]
                bil_px = vals[P_FLAGS] >= F32(2.0)
                texel = [jnp.where(bil_px, texel[c], tn[c]) for c in range(4)]

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
            is_phong_px = jnp.mod(vals[P_FLAGS], F32(2.0)) > 0  # flags bit 0
            term = jnp.where(is_phong_px, term, F32(1.0))
            src = [src[0] * term, src[1] * term, src[2] * term, src[3]]

        for ch in range(4):
            out = jnp.where(covered, src[ch], F32(0.0))
            for row in range(8):
                src_ref[
                    0, gcol, ch:ch + 1,
                    pl.ds((pt * 8 + row) * 128, 128),
                ] = out[row:row + 1, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "sampling", "with_phong", "interpret", "chunk",
                     "skip_shading", "cols"),
)
def _render_from_bins(setup, counts, offsets, scalars, tex_lut,
                      height, width, tile_h, tile_w, capacity,
                      sampling, with_phong, interpret, chunk=CHUNK,
                      skip_shading=False, cols=1):
    n_ty, n_tx = counts.shape
    n_pix = tile_h * tile_w
    tex_lanes = tex_lut.shape[1]

    cols = max(1, min(cols, n_tx))
    pad_tx = (-n_tx) % cols
    if pad_tx:
        counts = jnp.pad(counts, ((0, 0), (0, pad_tx)))
        setup = jnp.pad(setup, ((0, 0), (0, pad_tx), (0, 0), (0, 0)))
    n_txp = n_tx + pad_tx

    # Channel-major copy of the payload channels for phase 2's slot-gathers
    # (a cheap XLA transpose; phase 1 reads the row-major block). Excludes the
    # trailing ybounds channels (phase-1-only).
    payload_t = jnp.transpose(setup[..., 17:17 + PAYLOAD_CHANNELS], (0, 1, 3, 2))

    kernel = _make_kernel(tile_h, tile_w, capacity, tex_lanes, sampling,
                          with_phong, chunk, skip_shading, cols)
    z_flat, src_flat = pl.pallas_call(
        kernel,
        grid=(n_ty, n_txp // cols),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cols, capacity, N_CHANNELS),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, PAYLOAD_CHANNELS, capacity),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cols, 1, n_pix), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, 4, n_pix), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ty, n_txp, 1, n_pix), F32),
            jax.ShapeDtypeStruct((n_ty, n_txp, 4, n_pix), F32),
        ],
        interpret=interpret,
    )(counts, offsets, scalars, setup, payload_t, tex_lut)
    if pad_tx:
        z_flat = z_flat[:, :n_tx]
        src_flat = src_flat[:, :n_tx]

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
    LUT [4, L_pad] plus per-texture (base, tw, th) metadata.

    Identical texture objects (same array identity) are deduplicated to one LUT
    region. Total size is capped at 2^24 texels: texture metadata rides f32
    payload channels, which hold integers exactly only below 2^24."""
    rows = []
    meta = []
    base = 0
    seen: dict[int, tuple[int, int, int]] = {}
    for tex in textures:
        th, tw = int(tex.shape[0]), int(tex.shape[1])
        cached = seen.get(id(tex))
        if cached is not None:
            meta.append(cached)
            continue
        rows.append(tex.reshape(-1, 4))
        m = (base, tw, th)
        meta.append(m)
        seen[id(tex)] = m
        base += th * tw
    assert base <= TEX_LUT_MAX_TEXELS, (
        f"texture LUT has {base} texels (~{base * 16 / 2**20:.0f} MB of VMEM); "
        f"the LUT must stay well inside the ~16 MB/core VMEM. Route large-"
        f"texture draws through the pallas+deferred path (pipeline.draw_mesh "
        f"does this automatically via its texel budget)")
    flat = jnp.concatenate(rows, axis=0)  # [L, 4]
    pad = (-flat.shape[0]) % 128
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    return jnp.transpose(flat, (1, 0)), meta  # [4, L_pad]


def _compact_to_shard(coef, local_bbox, in_shard, payload, budget: int):
    """Compact the in-shard triangles to a fixed [budget] prefix (order-
    preserving), so per-shard binning sorts budget*small_span keys instead of
    T*small_span — the multi-chip scaling fix for replicated-scene sharding
    (each band holds ~T/n_rows triangles; without this every device pays the
    FULL scene's binning sort). Returns (coef, bbox, valid, payload, dropped).

    The compaction is monotone (original order preserved), so bin ids — which
    are row indices into the compacted table — keep the submission-order
    tie-break contract (FORMULAS.md) and the image stays bit-identical.
    """
    T = coef.shape[0]
    tri_ids = jnp.arange(T, dtype=I32)
    pos = jnp.cumsum(in_shard.astype(I32)) - 1
    keep = in_shard & (pos < budget)
    scatter_to = jnp.where(keep, pos, budget)
    sel = jnp.full((budget,), -1, I32).at[scatter_to].set(
        tri_ids, mode="drop"
    )
    valid_c = sel >= 0
    safe = jnp.maximum(sel, 0)
    dropped = jnp.maximum(jnp.sum(in_shard.astype(I32)) - budget, 0)
    return (coef[safe], local_bbox[safe], valid_c, payload[safe], dropped)


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
    bilinear: bool | int = False,
    with_phong: bool = True,
    interpret: bool | None = None,
    chunk: int = CHUNK,
    skip_shading: bool = False,
    cols: int = 1,
    shard_budget: int | None = None,
):
    """Fused visibility+shading draw. Returns (z [H,W], src color [H,W,4],
    overflow i32 scalar).

    payload: f32 [T, 34] per-triangle channels (see module docstring). tex_lut:
    [4, L_pad] planar texture LUT from make_texture_lut. The caller merges the
    result into a framebuffer: win = (z < fb.depth), color = where(win,
    blend_over(src, fb.color), fb.color). overflow counts (tile, tri) pairs
    dropped because a bin filled up — the reference never drops geometry, so
    callers must surface it (FrameCounters / HUD) rather than ignore it.

    shard_budget: when this call renders a BAND of a sharded frame, set to the
    max triangles expected in one band (e.g. ~2.5x T/n_bands): triangles are
    compacted to that budget BEFORE binning, so each device sorts only its
    band's triangles instead of the whole scene's (bit-identical image; budget
    misses are counted in overflow).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert capacity % 128 == 0, "capacity must be a multiple of 128"
    assert payload.shape[1] == PAYLOAD_CHANNELS
    # bilinear: False/0 = nearest, True/1 = bilinear, SAMPLE_MIXED (2) = per-
    # triangle choice via the P_FLAGS payload bit 1.
    sampling = int(bilinear)
    assert sampling in (SAMPLE_NEAREST, SAMPLE_BILINEAR, SAMPLE_MIXED)

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

    compact_dropped = jnp.zeros((), I32)
    if shard_budget is not None and shard_budget < coef.shape[0]:
        coef, local, in_shard, payload, compact_dropped = _compact_to_shard(
            coef, local, in_shard, payload, shard_budget
        )

    bins = bin_triangles(
        coef, local, in_shard, height, width,
        tile_h=tile_h, tile_w=tile_w, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap,
        payload=payload, with_ybounds=True,
    )
    offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
    scalars = jnp.asarray(
        [[light_dir[0], light_dir[1], light_dir[2], ambient,
          0.0, 0.0, 0.0, 0.0]], F32
    )
    z, src = _render_from_bins(
        bins.setup, bins.counts, offsets, scalars, tex_lut,
        height, width, tile_h, tile_w, capacity, sampling, with_phong,
        interpret, chunk, skip_shading, cols,
    )
    return z, src, bins.overflow + compact_dropped
