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

Packed setup channel layout (C = 17 + n_payload; binning packs
[16 coef][id][payload]; per-slab cull ranges ride SMEM via Bins.slab_bounds):
  0..15 coef  16 id (bitcast i32; -1 marks padding slots)
  payload (also shipped channel-major as payload_t [n_payload, K]): a STATIC
    per-scene subset of {texmeta 3, flags 1, 3 x corner attrs} chosen by
    plan_layout (PayloadLayout) — the FULL layout is
    0 tex_base 1 tw 2 th 3 flags (bit0 phong, bit1 bilinear — see pack_flags)
    4..13 corner0 (q, u*q, v*q, r*q, g*q, b*q, a*q, nx*q, ny*q, nz*q)
    14..23 corner1   24..33 corner2
    and scenes drop channels they can reconstruct bit-exactly (untextured ->
    no uv/texmeta; single texture -> texmeta as compile-time constants; white
    phong color -> no rgba; uniform modes -> no flags; no phong -> no normals).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtrenderer_tpu.ops.binning import bin_triangles

F32 = jnp.float32
I32 = jnp.int32

CHUNK = 8
# Phase-2 slot-gather block width: each fori_loop step gathers SLOT_K
# consecutive 128-slot chunks (independent gathers merged by disjoint masks —
# bit-exact for any value). The loop carries `vals`, so its iteration count is
# a SERIAL dependency chain; winner slots span ~900 counts per 4096-px batch
# at config-5 scale (~8 chunks) — SLOT_K trades chain length for per-step
# work. MEASURED A WASH on chip (tools/sweep_slot_k.py, round 5: 203.0 /
# 203.3 / 204.1 / 205.3 ms at k=1/2/4/8, config-5 full frame): Mosaic already
# overlaps the chunk iterations, so widening the block only adds clamp/mask
# work. Keep k=1; see ARCHITECTURE.md "Phase-2 attribution" for where the
# time actually sits (ablation numbers).
SLOT_K = 1
INT_MAX = jnp.iinfo(jnp.int32).max

# Phase-2 ablation hook for profiling ONLY (tools/sweep_slot_k.py --ablate):
# "no_gather" skips the winner-slot gather loop (vals seeded from b0 so the
# interp/shading chain cannot constant-fold away); "gather1" forces every
# winner to slot 0 (exactly one chunk iteration). Renders garbage — never set
# outside stage-attribution runs.
_ABLATE_PHASE2 = os.environ.get("DTR_ABLATE_PHASE2", "")


class PayloadLayout(NamedTuple):
    """STATIC per-scene payload channel plan (hashable; a jit static arg).

    Phase 2's slot-gather cost is linear in payload channel count, so scenes
    only ship the channels they actually use. Every elision below is BIT-EXACT
    vs the full layout (FORMULAS.md formulas unchanged):
      - has_texmeta=False: all triangles share one texture; (base, tw, th)
        become compile-time constants (tex_const) instead of 3 channels.
      - has_flags=False: uniform shading/sampling modes; the static kernel
        args (sampling, with_phong) already encode them.
      - has_uv=False: untextured scene. The 1x1 white default texture samples
        to exactly 1.0 (nearest trivially; bilinear lerps of equal values are
        exact), and 1.0 * x == x, so the fetch is skipped entirely.
      - has_rgba=False: every draw's interpolated rgba is exactly qf (corner
        channels were rgba*q with rgba == 1.0, and 1.0*q == q bit-exactly),
        so rgba = qf * inv_qf without shipping 12 corner channels. Only valid
        when NO draw bakes lighting into corner colors (phong/none shading)
        and every color is exactly (1,1,1,1).
      - mono_rgb=True (with has_rgba): every draw's corner colors are GRAY
        with unit alpha — host-known color r == g == b and a == 1.0, any
        shading mode (flat/gouraud bake a SCALAR light term, which preserves
        r == g == b; phong/none don't touch corner colors). The three
        rgb*q corner channels are bit-identical, so ONE mono channel (r*q)
        reconstructs all three (identical inputs -> identical interp), and
        a*q == 1.0*q == q bit-exactly so a = qf * inv_qf. 4 rgba channels
        -> 1: at config 5 (textured gouraud, white color) the payload drops
        21 -> 12 channels and phase 2's slot-gather loop with it.
      - has_normals=False: no phong draw (matches with_phong).
    Corner channel order (per corner): q [, u*q, v*q] [, r*q, g*q, b*q, a*q
    | mono*q] [, nx*q, ny*q, nz*q]. Payload: [texmeta 3?][flags 1?]
    [corner0..2].
    """

    has_texmeta: bool = True
    has_flags: bool = True
    has_uv: bool = True
    has_rgba: bool = True
    has_normals: bool = True
    tex_const: tuple[int, int, int] | None = None  # (base, tw, th) static
    mono_rgb: bool = False  # rgba block is ONE mono channel (see docstring)

    @property
    def rgba_channels(self) -> int:
        return 0 if not self.has_rgba else (1 if self.mono_rgb else 4)

    @property
    def corner_stride(self) -> int:
        return (1 + 2 * self.has_uv + self.rgba_channels
                + 3 * self.has_normals)

    @property
    def n_payload(self) -> int:
        return 3 * self.has_texmeta + self.has_flags + 3 * self.corner_stride

    @property
    def c0(self) -> int:  # corner0 base channel
        return 3 * self.has_texmeta + self.has_flags

    @property
    def flags_ch(self) -> int:
        assert self.has_flags
        return 3 * self.has_texmeta

    # corner-relative attr offsets (None = channel not shipped)
    @property
    def off_uv(self):
        return 1 if self.has_uv else None

    @property
    def off_rgba(self):
        return (1 + 2 * self.has_uv) if self.has_rgba else None

    @property
    def off_n(self):
        return (1 + 2 * self.has_uv + self.rgba_channels
                if self.has_normals else None)


FULL_LAYOUT = PayloadLayout()
PAYLOAD_CHANNELS = FULL_LAYOUT.n_payload  # 34: the maximal layout

# payload-relative channel indices OF THE FULL LAYOUT (kept for callers that
# pack the full layout directly). P_FLAGS packs per-triangle mode bits:
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


# Single source of truth for the raster/binning defaults shared by
# render_fused, pipeline.audit_scene, and callers that mirror production
# settings — a default change here propagates everywhere (a hand-mirrored copy
# in audit_scene once risked silently desynchronizing audits from production).
DEFAULT_RASTER_OPTS = dict(
    tile_h=32, tile_w=128, capacity=512, small_span=16, broad_cap=128,
)


def pack_flags(is_phong: bool, is_bilinear: bool) -> float:
    """Per-triangle P_FLAGS payload value."""
    return float(int(is_phong) + 2 * int(is_bilinear))


def plan_layout(draw_feats, mixed_sampling: bool) -> PayloadLayout:
    """Choose the minimal bit-exact PayloadLayout for a batched scene.

    draw_feats: per draw, a dict with
      textured: bool (the draw passed a real texture),
      phong: bool (per-pixel phong shading),
      corner_rgba_is_q: bool (corner rgba*q channels are EXACTLY q: color is
        exactly (1,1,1,1) and the shading mode does not bake lighting into the
        corner colors — phong/none; flat/gouraud always bake),
      corner_rgba_mono: bool, OPTIONAL (default False) — corner colors are
        gray with unit alpha (host color r == g == b, a == 1; any shading
        mode — the baked light term is a scalar, preserving grayness), so
        the rgba block collapses to one mono channel (PayloadLayout
        mono_rgb). corner_rgba_is_q draws are trivially mono (mono == 1).
      meta: (base, tw, th) texture placement from make_texture_lut.
    mixed_sampling: scene uses per-triangle nearest/bilinear selection.
    """
    has_uv = any(f["textured"] for f in draw_feats)
    any_phong = any(f["phong"] for f in draw_feats)
    all_phong = all(f["phong"] for f in draw_feats)
    has_rgba = not all(f["corner_rgba_is_q"] for f in draw_feats)
    mono_rgb = has_rgba and all(
        f["corner_rgba_is_q"] or f.get("corner_rgba_mono", False)
        for f in draw_feats)
    has_flags = (mixed_sampling and has_uv) or (any_phong and not all_phong)
    tex_const = None
    has_texmeta = False
    if has_uv:
        metas = {tuple(int(x) for x in f["meta"]) for f in draw_feats}
        if len(metas) == 1:
            tex_const = next(iter(metas))
        else:
            has_texmeta = True
    return PayloadLayout(
        has_texmeta=has_texmeta, has_flags=has_flags, has_uv=has_uv,
        has_rgba=has_rgba, has_normals=any_phong, tex_const=tex_const,
        mono_rgb=mono_rgb,
    )


def pack_payload(attrs10, layout: PayloadLayout, meta, flags_value: float):
    """Pack one draw's per-triangle payload [T, layout.n_payload] from the
    q-premultiplied corner attrs [T, 3, 10] (pipeline layout: q, u*q, v*q,
    rgba*q x4, n*q x3), the draw's texture placement meta (base, tw, th), and
    its pack_flags value."""
    T = attrs10.shape[0]
    segs = [attrs10[:, :, 0:1]]
    if layout.has_uv:
        segs.append(attrs10[:, :, 1:3])
    if layout.has_rgba:
        # mono: r == g == b per corner (plan_layout precondition) — ship r*q
        segs.append(attrs10[:, :, 3:4] if layout.mono_rgb
                    else attrs10[:, :, 3:7])
    if layout.has_normals:
        segs.append(attrs10[:, :, 7:10])
    corner = jnp.concatenate(segs, axis=-1) if len(segs) > 1 else segs[0]
    corner = corner.reshape(T, 3 * layout.corner_stride)
    parts = []
    if layout.has_texmeta:
        base, tw_, th_ = meta
        parts.append(jnp.broadcast_to(
            jnp.asarray([base, tw_, th_], F32), (T, 3)))
    if layout.has_flags:
        parts.append(jnp.full((T, 1), F32(flags_value)))
    parts.append(corner)
    out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    assert out.shape[1] == layout.n_payload
    return out


# 128-lane all-zero dummy LUT for untextured scenes (the kernel never reads it).
def dummy_texture_lut():
    return jnp.zeros((4, 128), F32)


def _gather128(seg, idx):
    """seg/idx [batch_rows, 128] (f32/i32, idx in [0,128)) ->
    seg[r, idx[r, l]] — a per-sublane dynamic lane gather."""
    return jnp.take_along_axis(seg, idx, axis=1)


def _make_kernel(tile_h: int, tile_w: int, capacity: int, tex_lanes: int,
                 sampling: int, with_phong: bool, chunk: int = CHUNK,
                 skip_shading: bool = False, cols: int = 1,
                 layout: PayloadLayout = FULL_LAYOUT,
                 use_ybounds: bool = True, batch_rows: int = 8,
                 tie_by_id: bool = True, flat: bool = False,
                 flat_slabs: bool = False, slot_k: int = SLOT_K):
    assert slot_k >= 1
    n_pix = tile_h * tile_w
    batch_px = batch_rows * 128
    assert n_pix % batch_px == 0, "tile must hold whole shading batches"

    n_slabs = tile_h // 8
    slab_pix = 8 * tile_w
    assert tile_h % 8 == 0, "tile_h must be a multiple of 8 (VPU sublanes)"
    assert not (flat and use_ybounds), (
        "flat mode culls slabs via per-slab windows (flat_slabs), not "
        "slab_bounds ranges")
    # flat DMA windows per tile: one per 8-row slab in slab mode (each slab
    # walks ONLY its own exact range — the flat path's slab culling), else
    # one whole-tile window.
    n_win = n_slabs if (flat and flat_slabs) else 1
    assert not flat_slabs or (flat and tie_by_id), (
        "slab windows are flat-mode only and are not id-ordered "
        "(two-tier emission) -> the id-channel depth tie is required")
    # The flat phase-1 loops read [chunk]-row slices from a scratch window of
    # exactly `capacity` rows (and from the chunk-padded broad block): a
    # non-dividing chunk's last slice would read past the window into the
    # adjacent col/slot's rows. capacity % 128 == 0 does NOT imply this
    # (e.g. chunk=48).
    if flat:
        assert capacity % chunk == 0, (
            f"flat_bins needs chunk ({chunk}) to divide capacity ({capacity})")

    n_payload = layout.n_payload
    assert not with_phong or layout.has_normals, (
        "phong shading needs normal channels in the payload")
    if sampling != SAMPLE_NEAREST:
        assert layout.has_uv, "bilinear/mixed sampling needs uv channels"
    if sampling == SAMPLE_MIXED:
        assert layout.has_flags, "mixed sampling rides the flags channel"

    def kernel(*refs):
        if flat:
            (counts_ref, starts_ref, nb_ref, off_ref, scal_ref, table_ref,
             cm_ref, broad_rm_ref, broad_cm_ref, tex_ref, z_ref, src_ref,
             scr_rm, scr_cm, sems) = refs
            sb_ref = setup_ref = payload_t_ref = None
        elif use_ybounds:
            (sb_ref, counts_ref, off_ref, scal_ref, setup_ref, payload_t_ref,
             tex_ref, z_ref, src_ref) = refs
        else:
            (counts_ref, off_ref, scal_ref, setup_ref, payload_t_ref,
             tex_ref, z_ref, src_ref) = refs
            sb_ref = None
        # One grid step processes `cols` adjacent tile columns (amortizes the
        # fixed per-step cost, which dominates for small tiles).
        ti = pl.program_id(0)
        tjb = pl.program_id(1)

        if flat:
            # Cross-step DMA prefetch: scratch is double-buffered by grid-
            # step parity; each step issues the NEXT step's window copies
            # (table rows for phase 1, channel-major payload for phase 2)
            # before processing its own — the copies overlap this step's
            # compute instead of exposing their latency at the wait (per-tile
            # exposed latency was ~2-4 us x n_tiles without this). Step 0
            # cold-starts its own slot. Semaphore balance: every step waits
            # exactly the sems the previous step (or itself, step 0) started.
            n_jb = pl.num_programs(1)
            total = pl.num_programs(0) * n_jb
            step = ti * n_jb + tjb
            slot = jax.lax.rem(step, 2)

            def issue(s_idx, sl):
                s_i = s_idx // n_jb
                s_jb = jax.lax.rem(s_idx, n_jb)
                for g in range(cols):
                    tj_ = s_jb * cols + g
                    for s in range(n_win):
                        start = starts_ref[s_i * n_win + s, tj_]
                        start_al = (start // 128) * 128
                        pltpu.make_async_copy(
                            table_ref.at[pl.ds(start, capacity), :],
                            scr_rm.at[sl, g, s], sems.at[sl, g, s, 0]).start()
                        pltpu.make_async_copy(
                            cm_ref.at[:, pl.ds(start_al, capacity + 128)],
                            scr_cm.at[sl, g, s], sems.at[sl, g, s, 1]).start()

            @pl.when(step == 0)
            def _cold():
                issue(step, slot)

            @pl.when(step + 1 < total)
            def _prefetch():
                issue(step + 1, jax.lax.rem(step + 1, 2))

            scr_rm_s = scr_rm.at[slot]
            scr_cm_s = scr_cm.at[slot]

        for g in range(cols):
            tj = tjb * cols + g
            if flat:
                nb = nb_ref[0, 0]
                n_small = [counts_ref[ti * n_win + s, tj]
                           for s in range(n_win)]
                delta = []
                n = nb
                # Wait unconditionally (semaphore balance), even for empty
                # tiles; the cm copy is tiny and lands well before the rows.
                for s in range(n_win):
                    start_cur = starts_ref[ti * n_win + s, tj]
                    start_al_cur = (start_cur // 128) * 128
                    delta.append(start_cur - start_al_cur)
                    n = n + n_small[s]
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(start_cur, capacity), :],
                        scr_rm.at[slot, g, s], sems.at[slot, g, s, 0]).wait()
                    pltpu.make_async_copy(
                        cm_ref.at[:, pl.ds(start_al_cur, capacity + 128)],
                        scr_cm.at[slot, g, s], sems.at[slot, g, s, 1]).wait()
            else:
                n_small = nb = delta = None
                n = counts_ref[ti, tj]
            ty_base = ti * tile_h  # tile's first LOCAL pixel row
            y0 = ty_base + off_ref[0, 0]
            x0 = tj * tile_w + off_ref[0, 1]

            # Empty tile: write background and skip both phases entirely.
            @pl.when(n == 0)
            def _empty(g=g):
                z_ref[0, g, 0:1, :] = jnp.full((1, n_pix), jnp.inf, F32)
                src_ref[0, g, :, :] = jnp.zeros((4, n_pix), F32)

            @pl.when(n > 0)
            def _full(g=g, n=n, n_small=n_small, nb=nb, delta=delta,
                      ty_base=ty_base, y0=y0, x0=x0, ti=ti, tj=tj):
                flat_ctx = ((n_small, nb, delta, scr_rm_s, scr_cm_s,
                             broad_rm_ref, broad_cm_ref) if flat else None)
                _tile_body(g, n, ty_base, y0, x0, ti, tj, sb_ref, scal_ref,
                           setup_ref, payload_t_ref, tex_ref, z_ref, src_ref,
                           flat_ctx)

    def _tile_body(gcol, n, ty_base, y0, x0, ti, tj, sb_ref, scal_ref,
                   setup_ref, payload_t_ref, tex_ref, z_ref, src_ref,
                   flat_ctx=None):
        # --------------------- phase 1: visibility (slab loop) ---------------
        # The tile is processed in 8-row SLABS. With use_ybounds, bins are
        # y-sorted and binning precomputed a conservative contiguous slot range
        # per slab (Bins.slab_bounds): the chunk loop walks ONLY that range —
        # slab culling with zero per-chunk conds (a superset range is image-
        # identical: the edge functions reject non-covering triangles). Depth
        # resolve is order-free, so slab/bin ordering never changes the image
        # (FORMULAS.md).
        #
        # The chunk loop carries PER-ROW bests [chunk, slab_pix] (row r only
        # competes against its own carry) and resolves across rows ONCE per
        # slab — the per-chunk (min z, min id) reduction trees were phase 1's
        # single biggest cost. Tie-break key: the triangle id channel, UNLESS
        # tie_by_id=False (tri-sorted bins with broad_cap == 0: slot order ==
        # id order then, so min slot == min id and the id channel is never
        # read). With broads, tri-sorted bins are [smalls by id][broads by id]
        # and slot order diverges from id order, so the id channel is required
        # for the FORMULAS.md min-id depth-tie contract.
        n_chunks = pl.cdiv(n, chunk)
        if flat_ctx is not None:
            n_small_f, nb_f, delta_f, scr_rm, scr_cm, broad_rm_ref, \
                broad_cm_ref = flat_ctx

        def make_slab(s_i):
            flat = jax.lax.broadcasted_iota(I32, (1, slab_pix), 1)
            fx = flat % tile_w
            fy = flat // tile_w + s_i * 8
            px = (fx + x0).astype(F32) + F32(0.5)  # [1, slab_pix]
            py = (fy + y0).astype(F32) + F32(0.5)
            iota_c = jax.lax.broadcasted_iota(I32, (chunk, 1), 0)

            # Each phase-1 loop is (row reader, slot base, valid limit,
            # (chunk range)). Dense bins: one list (smalls + broads packed by
            # binning), slab-culled via SMEM ranges when use_ybounds. Flat
            # bins: the tile's DMA'd row window(s) (smalls; slab mode gives
            # THIS slab its own exact window — the flat path's slab culling)
            # plus the shared VMEM broad block, broad slots biased past all
            # windows.
            if flat_ctx is not None:
                win = s_i if n_win > 1 else 0
                n_w = n_small_f[win]
                loops = [
                    (lambda k0, win=win: scr_rm[gcol, win,
                                                pl.ds(k0, chunk), :],
                     win * capacity, n_w, (0, pl.cdiv(n_w, chunk))),
                    (lambda k0: broad_rm_ref[pl.ds(k0, chunk), :],
                     n_win * capacity, nb_f, (0, pl.cdiv(nb_f, chunk))),
                ]
            elif use_ybounds and n_slabs > 1:
                # Two ranges: this slab's tight small-triangle range (entry
                # s_i) and the shared broad suffix (entry n_slabs, usually
                # empty). Chunk overlap between them is harmless — the depth
                # carry is idempotent.
                n_entries = n_slabs + 1
                dense_read = lambda k0: setup_ref[0, gcol, pl.ds(k0, chunk), :]
                loops = []
                for e in (s_i, n_slabs):
                    sb_col = (tj * n_entries + e) * 2
                    ks = sb_ref[ti, sb_col]
                    ke = jnp.minimum(sb_ref[ti, sb_col + 1], n)
                    loops.append((dense_read, 0, n,
                                  (ks // chunk, pl.cdiv(ke, chunk))))
            else:
                loops = [
                    (lambda k0: setup_ref[0, gcol, pl.ds(k0, chunk), :], 0,
                     n, (0, n_chunks)),
                ]

            def make_chunk_body(read_rows, slot_base, limit):
              def chunk_body(c, carry):
                k0 = pl.multiple_of(c * chunk, chunk)

                def do(carry):
                    if tie_by_id:
                        bz, bid, bslot, bb0, bb1, bb2 = carry
                    else:
                        bz, bslot, bb0, bb1, bb2 = carry
                    s = read_rows(k0)  # [chunk, C]

                    def col(i):
                        return s[:, i:i + 1]  # [chunk, 1]

                    A0, B0, C0 = col(0), col(1), col(2)
                    A1, B1, C1 = col(3), col(4), col(5)
                    A2, B2, C2 = col(6), col(7), col(8)
                    inv_area2 = col(9)
                    z0, z1, z2 = col(10), col(11), col(12)
                    tl0, tl1, tl2 = col(13), col(14), col(15)
                    slots = slot_base + k0 + iota_c  # [chunk, 1]
                    # padding slots (>= limit) carry garbage coefs — mask
                    valid_row = (k0 + iota_c) < limit

                    # FORMULAS.md coverage + depth (same op order as
                    # geometry.py).
                    E0 = (A0 * px + B0 * py) + C0
                    E1 = (A1 * px + B1 * py) + C1
                    E2 = (A2 * px + B2 * py) + C2
                    acc0 = (E0 > 0) | ((E0 == 0) & (tl0 > 0))
                    acc1 = (E1 > 0) | ((E1 == 0) & (tl1 > 0))
                    acc2 = (E2 > 0) | ((E2 == 0) & (tl2 > 0))
                    inside = acc0 & acc1 & acc2 & valid_row

                    b0 = E0 * inv_area2
                    b1 = E1 * inv_area2
                    b2 = E2 * inv_area2
                    z = (b0 * z0 + b1 * z1) + b2 * z2

                    zsel = jnp.where(inside, z, jnp.inf)
                    if tie_by_id:
                        ids = jax.lax.bitcast_convert_type(col(16), I32)
                        # z tie between two REAL fragments -> smaller id wins
                        # (ids are unique within a tile; the inf==inf case can
                        # only swap in garbage that `covered` masks later).
                        take = (zsel < bz) | ((zsel == bz) & (ids < bid))
                        new = (
                            jnp.where(take, zsel, bz),
                            jnp.where(take, jnp.broadcast_to(
                                ids, bid.shape), bid),
                            jnp.where(take, jnp.broadcast_to(
                                slots, bslot.shape), bslot),
                            jnp.where(take, b0, bb0),
                            jnp.where(take, b1, bb1),
                            jnp.where(take, b2, bb2),
                        )
                    else:
                        # within a row, later chunks have strictly larger
                        # slots: strict < keeps the earlier (smaller) slot on
                        # a z tie — equal to the min-id contract because
                        # tie_by_id=False requires slot order == id order
                        # (tri-sorted bins, broad_cap == 0).
                        take = zsel < bz
                        new = (
                            jnp.where(take, zsel, bz),
                            jnp.where(take, jnp.broadcast_to(
                                slots, bslot.shape), bslot),
                            jnp.where(take, b0, bb0),
                            jnp.where(take, b1, bb1),
                            jnp.where(take, b2, bb2),
                        )
                    return new

                return do(carry)
              return chunk_body

            zero = jnp.zeros((chunk, slab_pix), F32)
            init_z = jnp.full((chunk, slab_pix), jnp.inf, F32)
            init_slot = jnp.zeros((chunk, slab_pix), I32)
            if tie_by_id:
                init = (init_z, jnp.full((chunk, slab_pix), INT_MAX, I32),
                        init_slot, zero, zero, zero)
            else:
                init = (init_z, init_slot, zero, zero, zero)
            res = init
            for read_rows, slot_base, limit, (c_lo, c_hi) in loops:
                res = jax.lax.fori_loop(
                    c_lo, c_hi, make_chunk_body(read_rows, slot_base, limit),
                    res)

            # Cross-row resolve, ONCE per slab: min z, tie-break by key.
            if tie_by_id:
                bz, bid, bslot, bb0, bb1, bb2 = res
                key = bid
            else:
                bz, bslot, bb0, bb1, bb2 = res
                key = bslot
            zmin = jnp.min(bz, axis=0, keepdims=True)
            hit = bz == zmin
            kmin = jnp.min(jnp.where(hit, key, INT_MAX), axis=0,
                           keepdims=True)
            win = hit & (key == kmin)
            slot_w = jnp.min(jnp.where(win, bslot, INT_MAX), axis=0,
                             keepdims=True)
            b0_w = jnp.min(jnp.where(win, bb0, jnp.inf), axis=0, keepdims=True)
            b1_w = jnp.min(jnp.where(win, bb1, jnp.inf), axis=0, keepdims=True)
            b2_w = jnp.min(jnp.where(win, bb2, jnp.inf), axis=0, keepdims=True)
            return zmin, slot_w, b0_w, b1_w, b2_w

        slab_results = [make_slab(s_i) for s_i in range(n_slabs)]
        best_z, best_slot, bb0, bb1, bb2 = (
            jnp.concatenate([r[k] for r in slab_results], axis=1)
            for k in range(5)
        )
        z_ref[0, gcol, 0:1, :] = best_z

        if skip_shading:  # perf-debug mode: visibility only
            src_ref[0, gcol, :, :] = jnp.zeros((4, n_pix), F32)
            return

        # ------------------------- phase 2: shading ---------------------------
        n_batches = n_pix // batch_px
        for pt in range(n_batches):
            # Skip fully-uncovered batches (background/sky) BEFORE any batch
            # prep: one reduction over the contiguous depth slice.
            cov_any = jnp.any(
                best_z[0:1, pt * batch_px:(pt + 1) * batch_px] != jnp.inf
            )

            @pl.when(jnp.logical_not(cov_any))
            def _sky(pt=pt):
                zrow = jnp.zeros((1, 128), F32)
                for ch in range(4):
                    for row in range(batch_rows):
                        src_ref[0, gcol, ch:ch + 1,
                                pl.ds((pt * batch_rows + row) * 128,
                                      128)] = zrow

            @pl.when(cov_any)
            def _shade(pt=pt):
                _shade_batch(gcol, pt, best_z, best_slot, bb0, bb1, bb2,
                             scal_ref, payload_t_ref, tex_ref, src_ref,
                             flat_ctx)

    def _shade_batch(gcol, pt, best_z, best_slot, bb0, bb1, bb2, scal_ref,
                     payload_t_ref, tex_ref, src_ref, flat_ctx=None):
        # Batch batch_rows contiguous 128-pixel groups onto sublanes by
        # CONCATENATING [1,128] slices (Mosaic can't shape-cast lanes to
        # sublanes). Row r covers flat pixels [pt*batch_px + r*128, ... + 128).
        def batch_of(vec):
            return jnp.concatenate(
                [vec[0:1, (pt * batch_rows + r) * 128:
                     (pt * batch_rows + r + 1) * 128]
                 for r in range(batch_rows)],
                axis=0,
            )

        sl = batch_of(best_slot)
        covered = batch_of(best_z) != jnp.inf
        b0 = batch_of(bb0)
        b1 = batch_of(bb1)
        b2 = batch_of(bb2)
        light_x = scal_ref[0, 0]
        light_y = scal_ref[0, 1]
        light_z = scal_ref[0, 2]
        ambient = scal_ref[0, 3]

        # Winner slots within a batch are spatially coherent: loop only the
        # dynamic [min, max] 128-slot chunk range actually referenced.
        if _ABLATE_PHASE2 == "no_gather":
            vals = tuple(b0 for _ in range(n_payload))
        else:
            vals = tuple(jnp.zeros((batch_rows, 128), F32)
                         for _ in range(n_payload))
        if _ABLATE_PHASE2 == "gather1":
            sl = jnp.zeros_like(sl)
        if flat_ctx is None:
            sl_c = jnp.clip(sl, 0, capacity - 1)
            reader = lambda p, start: payload_t_ref[0, gcol, p:p + 1,
                                                    pl.ds(start, 128)]
            sources = [(sl_c, reader, capacity // 128)]
        else:
            # Flat bins: small winners gather from their slab window's DMA'd
            # channel-major block (lane = delta + local slot; the window
            # starts at the 128-aligned row offset, so chunk lane offsets
            # stay aligned); broad winners (slot >= n_win * capacity) from
            # the shared broad block. Lanes belonging to OTHER sources get a
            # negative index and match no chunk; a source with no winners in
            # the batch collapses its fori range to zero iterations.
            _, _, delta_f, _, scr_cm, _, broad_cm_ref = flat_ctx
            neg = I32(-(1 << 20))
            sources = []
            for s in range(n_win):
                lo = s * capacity
                in_w = (sl >= lo) & (sl < lo + capacity)
                idx_s = jnp.where(in_w, sl - lo + delta_f[s], neg)
                # window lane dim is capacity + 128 (the 128-aligned row
                # offset's delta rides the lanes) -> one extra chunk.
                sources.append(
                    (idx_s, lambda p, start, s=s: scr_cm[gcol, s, p:p + 1,
                                                         pl.ds(start, 128)],
                     capacity // 128 + 1))
            idx_b = jnp.where(sl >= n_win * capacity,
                              sl - n_win * capacity, neg)
            sources.append(
                (idx_b, lambda p, start: broad_cm_ref[p:p + 1,
                                                      pl.ds(start, 128)],
                 broad_cm_ref.shape[-1] // 128))

        if _ABLATE_PHASE2 == "no_gather":
            sources = []
        for idx, reader, n_chunks in sources:
            valid_i = idx >= 0
            jmin = jnp.min(jnp.where(valid_i, idx, INT_MAX)) // 128
            jmax = jnp.max(jnp.where(valid_i, idx, -1)) // 128

            def gather_block(jb, vals, idx=idx, reader=reader,
                             n_chunks=n_chunks):
                # slot_k consecutive chunks per step: the k gathers are
                # independent (pipelineable) and their sel masks disjoint
                # (one winner slot per lane), so the merge order is
                # irrelevant — bit-exact for any slot_k. Block alignment can
                # reach up to slot_k - 1 chunks past jmax: clamp the READ to
                # the block's last real chunk (sel, computed from the
                # unclamped chunk index, is all-false there).
                out = list(vals)
                for s in range(slot_k):
                    j = jb * slot_k + s
                    j_rd = jnp.minimum(j, n_chunks - 1) if slot_k > 1 else j
                    start = pl.multiple_of(j_rd * 128, 128)
                    loc = idx - j * 128
                    sel = (loc >= 0) & (loc < 128)
                    loc = jnp.clip(loc, 0, 127)
                    for p in range(n_payload):
                        seg = jnp.broadcast_to(reader(p, start),
                                               (batch_rows, 128))
                        out[p] = jnp.where(sel, _gather128(seg, loc), out[p])
                return tuple(out)

            vals = jax.lax.fori_loop(jmin // slot_k, jmax // slot_k + 1,
                                     gather_block, vals)

        c0 = layout.c0
        stride = layout.corner_stride

        def interp(off):
            a0 = vals[c0 + off]
            a1 = vals[c0 + stride + off]
            a2 = vals[c0 + 2 * stride + off]
            return (b0 * a0 + b1 * a1) + b2 * a2

        qf = interp(0)
        inv_qf = F32(1.0) / jnp.where(qf != 0, qf, F32(1.0))
        if layout.has_rgba and layout.mono_rgb:
            # gray corners: r == g == b (one shipped channel reconstructs all
            # three bit-exactly) and a*q == q (unit alpha), see PayloadLayout.
            m = interp(layout.off_rgba) * inv_qf
            r = g = bcol = m
            a = qf * inv_qf
        elif layout.has_rgba:
            o = layout.off_rgba
            r = interp(o) * inv_qf
            g = interp(o + 1) * inv_qf
            bcol = interp(o + 2) * inv_qf
            a = interp(o + 3) * inv_qf
        else:
            # Every draw's corner rgba*q channels would be exactly q (color ==
            # (1,1,1,1) and 1.0*q == q), so interp(rgba*q) == qf bit-exactly.
            w1 = qf * inv_qf
            r = g = bcol = a = w1

        if layout.has_uv:
            u = interp(layout.off_uv) * inv_qf
            v = interp(layout.off_uv + 1) * inv_qf
            # Texture sampling from the VMEM LUT (FORMULAS.md formulas).
            if layout.tex_const is not None:
                cbase, ctw, cth = layout.tex_const
                base = jnp.full((batch_rows, 128), F32(cbase))
                tw = jnp.full((batch_rows, 128), F32(ctw))
                th = jnp.full((batch_rows, 128), F32(cth))
            else:
                tw = vals[P_TW]
                th = vals[P_TH]
                base = vals[P_TEXBASE]

            def fetch(tidx):
                """tidx [8,128] i32 absolute LUT index -> 4 channel values.

                UVs are coherent within a batch: loop only the dynamic
                [min, max] 128-texel chunk range touched."""
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
                            tex_ref[ch:ch + 1, pl.ds(start, 128)],
                            (batch_rows, 128)
                        )
                        res.append(
                            jnp.where(sel, _gather128(seg, loc), out[ch]))
                    return tuple(res)

                out = tuple(jnp.zeros((batch_rows, 128), F32)
                            for _ in range(4))
                return jax.lax.fori_loop(tjmin, tjmax + 1, body, out)

            def texel_index(txf, tyf):
                # Index arithmetic in int32: f32 loses integer precision at
                # 2^24, so base + ty*tw + tx must not be combined as floats
                # (make_texture_lut also guards the LUT size).
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
                    # 5th tap: the nearest texel, fetched in the SAME union
                    # loop; per-pixel flags bit 1 selects bilinear vs nearest.
                    taps.append(texel_index(jnp.floor(u * tw),
                                            jnp.floor((F32(1.0) - v) * th)))
                taps = [jnp.clip(tp, 0, tex_lanes - 1) for tp in taps]
                n_taps = len(taps)
                # One loop over the UNION of all taps' chunk ranges: the taps
                # are within one texel row of each other, so ranges nearly
                # coincide.
                tjmin = jnp.min(jnp.stack([jnp.min(tp) for tp in taps])) // 128
                tjmax = jnp.max(jnp.stack([jnp.max(tp) for tp in taps])) // 128

                def body_taps(j, out):
                    start = pl.multiple_of(j * 128, 128)
                    segs = [tex_ref[ch:ch + 1, pl.ds(start, 128)]
                            for ch in range(4)]
                    segs = [jnp.broadcast_to(s_, (batch_rows, 128))
                            for s_ in segs]
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
                    tuple(jnp.zeros((batch_rows, 128), F32) for _ in range(4))
                    for _ in range(n_taps)
                )
                fetched = jax.lax.fori_loop(tjmin, tjmax + 1, body_taps,
                                            zeros_taps)
                t00, t10, t01, t11 = fetched[:4]

                def lerp2(p, q2, t):
                    return p + (q2 - p) * t

                texel = [
                    lerp2(lerp2(t00[c], t10[c], ax),
                          lerp2(t01[c], t11[c], ax), ay)
                    for c in range(4)
                ]
                if sampling == SAMPLE_MIXED:
                    tn = fetched[4]
                    bil_px = vals[layout.flags_ch] >= F32(2.0)
                    texel = [jnp.where(bil_px, texel[c], tn[c])
                             for c in range(4)]

            src = [texel[0] * r, texel[1] * g, texel[2] * bcol, texel[3] * a]
        else:
            # Untextured scene: texel == 1.0 exactly, and 1.0 * x == x.
            src = [r, g, bcol, a]

        if with_phong:
            # FORMULAS.md lighting: true divide + sqrt (no reciprocal-multiply)
            # so values match shading.light_term / the oracle.
            on = layout.off_n
            nx = interp(on) * inv_qf
            ny = interp(on + 1) * inv_qf
            nz = interp(on + 2) * inv_qf
            d = (nx * nx + ny * ny) + nz * nz
            nlen = jnp.sqrt(jnp.where(d > 0, d, F32(1.0)))
            nxh, nyh, nzh = nx / nlen, ny / nlen, nz / nlen
            ld = (light_x * light_x + light_y * light_y) + light_z * light_z
            llen = jnp.sqrt(ld)
            lxh, lyh, lzh = light_x / llen, light_y / llen, light_z / llen
            ndl = (nxh * lxh + nyh * lyh) + nzh * lzh
            ndl = jnp.maximum(ndl, F32(0.0))
            term = ambient + (F32(1.0) - ambient) * ndl
            if layout.has_flags:
                # flags bit 0: phong per triangle (mixed-shading batch)
                is_phong_px = jnp.mod(vals[layout.flags_ch], F32(2.0)) > 0
                term = jnp.where(is_phong_px, term, F32(1.0))
            src = [src[0] * term, src[1] * term, src[2] * term, src[3]]

        for ch in range(4):
            out = jnp.where(covered, src[ch], F32(0.0))
            for row in range(batch_rows):
                src_ref[
                    0, gcol, ch:ch + 1,
                    pl.ds((pt * batch_rows + row) * 128, 128),
                ] = out[row:row + 1, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "sampling", "with_phong", "interpret", "chunk",
                     "skip_shading", "cols", "layout", "use_ybounds",
                     "batch_rows", "tie_by_id", "slot_k"),
)
def _render_from_bins(setup, counts, offsets, scalars, tex_lut,
                      height, width, tile_h, tile_w, capacity,
                      sampling, with_phong, interpret, chunk=CHUNK,
                      skip_shading=False, cols=1,
                      layout: PayloadLayout = FULL_LAYOUT,
                      use_ybounds: bool = True, slab_bounds=None,
                      batch_rows: int = 8, tie_by_id: bool = True,
                      slot_k: int = SLOT_K):
    n_ty, n_tx = counts.shape
    n_pix = tile_h * tile_w
    tex_lanes = tex_lut.shape[1]
    n_payload = layout.n_payload
    n_channels = 17 + n_payload
    assert setup.shape[-1] == n_channels
    assert (slab_bounds is not None) == bool(use_ybounds)

    cols = max(1, min(cols, n_tx))
    pad_tx = (-n_tx) % cols
    if pad_tx:
        counts = jnp.pad(counts, ((0, 0), (0, pad_tx)))
        setup = jnp.pad(setup, ((0, 0), (0, pad_tx), (0, 0), (0, 0)))
        if slab_bounds is not None:
            slab_bounds = jnp.pad(
                slab_bounds, ((0, 0), (0, pad_tx), (0, 0), (0, 0)))
    n_txp = n_tx + pad_tx

    # Channel-major copy of the payload channels for phase 2's slot-gathers
    # (a cheap XLA transpose; phase 1 reads the row-major block).
    payload_t = jnp.transpose(setup[..., 17:17 + n_payload], (0, 1, 3, 2))

    kernel = _make_kernel(tile_h, tile_w, capacity, tex_lanes, sampling,
                          with_phong, chunk, skip_shading, cols, layout,
                          use_ybounds, batch_rows, tie_by_id, slot_k=slot_k)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cols, capacity, n_channels),
                     lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cols, n_payload, capacity),
                     lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    inputs = [counts, offsets, scalars, setup, payload_t, tex_lut]
    if use_ybounds:
        # slab ranges ride SMEM, flattened 2D: [n_ty, n_txp * n_slabs * 2]
        sb2 = slab_bounds.reshape(n_ty, -1)
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.insert(0, sb2)
    z_flat, src_flat = pl.pallas_call(
        kernel,
        grid=(n_ty, n_txp // cols),
        in_specs=in_specs,
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
    )(*inputs)
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


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "sampling", "with_phong", "interpret", "chunk",
                     "skip_shading", "cols", "layout", "batch_rows",
                     "tie_by_id", "flat_slabs", "slot_k"),
)
def _render_from_flat_bins(fbins, offsets, scalars, tex_lut,
                           height, width, tile_h, tile_w, capacity,
                           sampling, with_phong, interpret, chunk=CHUNK,
                           skip_shading=False, cols=1,
                           layout: PayloadLayout = FULL_LAYOUT,
                           batch_rows: int = 8, tie_by_id: bool = True,
                           flat_slabs: bool = False, slot_k: int = SLOT_K):
    """Flat-bins variant of _render_from_bins: no dense [tiles, K, C] setup —
    the kernel DMAs each tile's contiguous row range from the sorted-prefix
    table in HBM (binning.FlatBins) and walks the shared broad block from
    VMEM. ~27 ms less binning assembly at 1M tris/4K, and the dense setup
    HBM round-trip disappears. flat_slabs: bins carry one EXACT window per
    8-row slab ((tile, slab)-row-major starts/counts; `capacity` is
    per-slab) and each slab's chunk loop walks only its own window."""
    counts, starts = fbins.counts, fbins.starts
    n_win = tile_h // 8 if flat_slabs else 1
    n_sy, n_tx = counts.shape
    n_ty = n_sy // n_win
    assert n_ty * n_win == n_sy, (
        f"starts/counts rows {n_sy} != n_ty * n_win ({n_win})")
    n_pix = tile_h * tile_w
    tex_lanes = tex_lut.shape[1]
    n_payload = layout.n_payload
    n_payload8 = -(-n_payload // 8) * 8
    assert fbins.table.shape[1] == 128
    assert fbins.table_cm.shape[0] == n_payload8

    cols = max(1, min(cols, n_tx))
    pad_tx = (-n_tx) % cols
    if pad_tx:
        # Padding tiles: start 0, count 0 — they still walk the broad block
        # (n = nb), but their output columns are sliced off below.
        counts = jnp.pad(counts, ((0, 0), (0, pad_tx)))
        starts = jnp.pad(starts, ((0, 0), (0, pad_tx)))
    n_txp = n_tx + pad_tx

    kernel = _make_kernel(tile_h, tile_w, capacity, tex_lanes, sampling,
                          with_phong, chunk, skip_shading, cols, layout,
                          use_ybounds=False, batch_rows=batch_rows,
                          tie_by_id=tie_by_id, flat=True,
                          flat_slabs=flat_slabs, slot_k=slot_k)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
        pl.BlockSpec(memory_space=pltpu.SMEM),   # starts
        pl.BlockSpec(memory_space=pltpu.SMEM),   # n_broad
        pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets
        pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
        pl.BlockSpec(memory_space=pl.ANY),    # table (HBM)
        pl.BlockSpec(memory_space=pl.ANY),    # table_cm (HBM)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # broad rows
        pl.BlockSpec(memory_space=pltpu.VMEM),   # broad channel-major
        pl.BlockSpec(memory_space=pltpu.VMEM),   # tex LUT
    ]
    # the broad phase-1 loop reads [chunk]-row slices: pad the block so its
    # last chunk never slices past the end (Mosaic rejects OOB sublane reads)
    broad_rm = fbins.broad
    rpad = (-broad_rm.shape[0]) % max(chunk, 8)
    if rpad:
        broad_rm = jnp.pad(broad_rm, ((0, rpad), (0, 0)))
    inputs = [counts, starts, fbins.n_broad.reshape(1, 1), offsets, scalars,
              fbins.table, fbins.table_cm, broad_rm, fbins.broad_cm,
              tex_lut]
    z_flat, src_flat = pl.pallas_call(
        kernel,
        grid=(n_ty, n_txp // cols),
        in_specs=in_specs,
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
        scratch_shapes=[
            pltpu.VMEM((2, cols, n_win, capacity, 128), F32),
            pltpu.VMEM((2, cols, n_win, n_payload8, capacity + 128), F32),
            pltpu.SemaphoreType.DMA((2, cols, n_win, 2)),
        ],
        interpret=interpret,
    )(*inputs)
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


def _norm_batch_rows(batch_rows: int | None, tile_h: int, tile_w: int) -> int:
    """Shared phase-2 batch sizing: default to the measured 32-row plateau,
    snapped down so batches tile the tile's pixel rows exactly."""
    if batch_rows is None:
        batch_rows = min(32, tile_h)
    n_pix = tile_h * tile_w
    assert n_pix % 128 == 0, (
        f"tile {tile_h}x{tile_w} = {n_pix} px must be a multiple of 128 "
        f"(VPU lanes); pick a lane-aligned tile shape")
    batch_rows = max(1, min(batch_rows, n_pix // 128))
    while n_pix % (batch_rows * 128):
        batch_rows //= 2
    return batch_rows


def render_fused_rowbands(
    coef,
    bbox,
    valid,
    payload,
    tex_lut,
    light_dir,
    ambient,
    height: int,
    width: int,
    row_bands: int,
    band_index=None,
    y_offset=0,
    x_offset=0,
    tile_h: int = DEFAULT_RASTER_OPTS["tile_h"],
    tile_w: int = DEFAULT_RASTER_OPTS["tile_w"],
    capacity: int = DEFAULT_RASTER_OPTS["capacity"],
    small_span: int = DEFAULT_RASTER_OPTS["small_span"],
    broad_cap: int = DEFAULT_RASTER_OPTS["broad_cap"],
    bilinear: bool | int = False,
    with_phong: bool = True,
    interpret: bool | None = None,
    chunk: int = CHUNK,
    skip_shading: bool = False,
    cols: int = 1,
    layout: PayloadLayout = FULL_LAYOUT,
    batch_rows: int | None = None,
    pair_budget: int | None = None,
    mid_cap: int | None = None,
    slot_k: int = SLOT_K,
):
    """Banded fused draw with ONE SHARED cross-band binning pass.

    The replicated-scene band decomposition (pipeline row_bands /
    parallel/shard.py) used to re-run compaction + pair sort + prefix gather
    PER BAND — measured at config 5 as a 56% sum-of-bands overhead
    (BENCH_r04: 322 ms banded sum vs 206 ms unbanded). Here the binning runs
    ONCE over the full frame's BANDED tile grid
    (binning.bin_triangles_flat(row_bands=...)): every band's kernel call
    consumes its own row-slice of starts/counts against the SAME sorted-
    prefix table in HBM. `height` is always the FULL frame height
    (band_h = height // row_bands).

    band_index=None (single chip): a lax.scan renders all bands sequentially
    (compiled once) and returns the assembled full frame — bit-exact vs the
    unbanded render at zero overflow, same contract as the per-band path.

    band_index=i (one device of a shard_map over "rows"): renders ONLY band
    i into a [band_h, width] output — each device computes the (identical,
    replicated) binning and consumes its slice; on real multi-chip hardware
    the replicated binning runs concurrently on every chip, so wall-clock is
    one binning + one band's kernel. y_offset must then be the band's global
    offset (band_index * band_h + frame offset), exactly what
    parallel/shard.py passes.

    pair_budget is the FULL-frame budget (the unbanded production value),
    not a per-band share. Returns (z, src, overflow) like render_fused;
    overflow counts the shared pass's drops once.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert capacity % 128 == 0, "capacity must be a multiple of 128"
    assert payload.shape[1] == layout.n_payload
    assert height % row_bands == 0
    band_h = height // row_bands
    assert capacity % chunk == 0, (
        f"flat_bins needs chunk ({chunk}) to divide capacity ({capacity})")
    T = coef.shape[0]

    # frame-origin offsets: with band_index, the caller passes the BAND's
    # global y_offset (band_index * band_h + frame offset) — recover the
    # frame origin for the full-frame binning.
    y_off = jnp.asarray(y_offset, I32)
    x_off = jnp.asarray(x_offset, I32)
    if band_index is not None:
        bi = jnp.asarray(band_index, I32)
        y_frame = y_off - bi * band_h
    else:
        y_frame = y_off

    in_shard = (
        valid
        & (bbox[:, 2] >= x_off) & (bbox[:, 0] < x_off + width)
        & (bbox[:, 3] >= y_frame) & (bbox[:, 1] < y_frame + height)
    )
    local = jnp.stack(
        [
            jnp.clip(bbox[:, 0] - x_off, 0, width - 1),
            jnp.clip(bbox[:, 1] - y_frame, 0, height - 1),
            jnp.clip(bbox[:, 2] - x_off, 0, width - 1),
            jnp.clip(bbox[:, 3] - y_frame, 0, height - 1),
        ],
        axis=-1,
    )
    if pair_budget is None:
        pair_budget = 3 * T
    pair_budget = min(int(pair_budget), 3 * T)

    from dtrenderer_tpu.ops.binning import bin_triangles_flat

    fbins = bin_triangles_flat(
        coef, local, in_shard, height, width,
        tile_h=tile_h, tile_w=tile_w, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap, payload=payload,
        pair_budget=int(pair_budget), mid_cap=mid_cap,
        row_bands=row_bands,
    )
    n_tyb = -(-band_h // tile_h)
    n_tx = fbins.starts.shape[1]
    starts3 = fbins.starts.reshape(row_bands, n_tyb, n_tx)
    counts3 = fbins.counts.reshape(row_bands, n_tyb, n_tx)

    batch_rows = _norm_batch_rows(batch_rows, tile_h, tile_w)
    sampling = int(bilinear)
    assert sampling in (SAMPLE_NEAREST, SAMPLE_BILINEAR, SAMPLE_MIXED)
    scalars = jnp.asarray(
        [[light_dir[0], light_dir[1], light_dir[2], ambient,
          0.0, 0.0, 0.0, 0.0]], F32)

    def render_band(st, ct, y0):
        fb_b = fbins._replace(starts=st, counts=ct)
        offs = jnp.stack([jnp.asarray(y0, I32), x_off]).reshape(1, 2)
        # banded windows are never id-ordered (two-tier value-carrying
        # emission) -> the id-channel depth tie is required
        return _render_from_flat_bins(
            fb_b, offs, scalars, tex_lut,
            band_h, width, tile_h, tile_w, capacity, sampling, with_phong,
            interpret, chunk, skip_shading, cols, layout,
            batch_rows, True, False, slot_k=slot_k,
        )

    if band_index is not None:
        st = jax.lax.dynamic_index_in_dim(starts3, bi, 0, keepdims=False)
        ct = jax.lax.dynamic_index_in_dim(counts3, bi, 0, keepdims=False)
        z, src = render_band(st, ct, y_off)
        return z, src, fbins.overflow

    y0s = y_frame + jnp.arange(row_bands, dtype=I32) * band_h

    def body(carry, xs):
        st, ct, y0 = xs
        z_b, src_b = render_band(st, ct, y0)
        return carry, (z_b, src_b)

    _, (zs, srcs) = jax.lax.scan(body, 0, (starts3, counts3, y0s))
    return (zs.reshape(height, width),
            srcs.reshape(height, width, srcs.shape[-1]),
            fbins.overflow)


def render_fused_band_distributed(
    coef,
    bbox,
    valid,
    payload,
    tex_lut,
    light_dir,
    ambient,
    height: int,
    width: int,
    row_bands: int,
    axis_name: str = "rows",
    y_offset=0,
    x_offset=0,
    tile_h: int = DEFAULT_RASTER_OPTS["tile_h"],
    tile_w: int = DEFAULT_RASTER_OPTS["tile_w"],
    capacity: int = DEFAULT_RASTER_OPTS["capacity"],
    small_span: int = DEFAULT_RASTER_OPTS["small_span"],
    broad_cap: int = DEFAULT_RASTER_OPTS["broad_cap"],
    bilinear: bool | int = False,
    with_phong: bool = True,
    interpret: bool | None = None,
    chunk: int = CHUNK,
    skip_shading: bool = False,
    cols: int = 1,
    layout: PayloadLayout = FULL_LAYOUT,
    batch_rows: int | None = None,
    pair_budget: int | None = None,
    mid_cap: int | None = None,
    slot_k: int = SLOT_K,
):
    """One device's band of the DISTRIBUTED shared cross-band binning
    (binning.bin_triangles_flat_distributed): must run INSIDE a shard_map
    over `axis_name` with one device per band. Each device emits/sorts pairs
    for 1/N of the triangles, exchanges band buckets in one all_to_all, and
    renders its own band from its local merged table — per-device binning
    cost is ~1/N of the shared single-chip pass, which is what the banded
    bench's sum/N projection charges. `height` is the FULL frame height;
    y_offset is this band's GLOBAL offset (axis_index * band_h + frame
    offset), as parallel/shard.py passes. Returns (z [band_h, w], src,
    overflow[global, psum'd])."""
    import jax as _jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert capacity % 128 == 0 and capacity % chunk == 0
    assert payload.shape[1] == layout.n_payload
    assert height % row_bands == 0
    band_h = height // row_bands
    T = coef.shape[0]

    d = _jax.lax.axis_index(axis_name)
    y_off = jnp.asarray(y_offset, I32)
    x_off = jnp.asarray(x_offset, I32)
    y_frame = y_off - d * band_h  # frame origin (0 for a plain full frame)

    in_shard = (
        valid
        & (bbox[:, 2] >= x_off) & (bbox[:, 0] < x_off + width)
        & (bbox[:, 3] >= y_frame) & (bbox[:, 1] < y_frame + height)
    )
    local = jnp.stack(
        [
            jnp.clip(bbox[:, 0] - x_off, 0, width - 1),
            jnp.clip(bbox[:, 1] - y_frame, 0, height - 1),
            jnp.clip(bbox[:, 2] - x_off, 0, width - 1),
            jnp.clip(bbox[:, 3] - y_frame, 0, height - 1),
        ],
        axis=-1,
    )
    if pair_budget is None:
        pair_budget = 3 * T
    pair_budget = min(int(pair_budget), 3 * T)

    from dtrenderer_tpu.ops.binning import bin_triangles_flat_distributed

    fbins = bin_triangles_flat_distributed(
        coef, local, in_shard, payload, height, width,
        tile_h=tile_h, tile_w=tile_w, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap,
        pair_budget=int(pair_budget), row_bands=row_bands,
        axis_name=axis_name, mid_cap=mid_cap,
    )
    batch_rows = _norm_batch_rows(batch_rows, tile_h, tile_w)
    sampling = int(bilinear)
    scalars = jnp.asarray(
        [[light_dir[0], light_dir[1], light_dir[2], ambient,
          0.0, 0.0, 0.0, 0.0]], F32)
    offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
    z, src = _render_from_flat_bins(
        fbins, offsets, scalars, tex_lut,
        band_h, width, tile_h, tile_w, capacity, sampling, with_phong,
        interpret, chunk, skip_shading, cols, layout,
        batch_rows, True, False, slot_k=slot_k,
    )
    return z, src, fbins.overflow


def auto_shard_budget(n_tris: int, n_bands: int, factor: float = 2.5,
                      quantum: int = 128) -> int:
    """Default per-band triangle budget for replicated-scene band sharding.

    ~factor x the average triangles-per-band (rounded up to `quantum` for
    clean sort/extract shapes): generous skew headroom while cutting each
    device's binning sort from T keys to ~budget keys — the multi-chip
    binning-scaling fix (SURVEY.md §2 P-THREAD / §5 long-context analog).
    Bands whose true count exceeds the budget drop the excess COUNTED in the
    overflow scalar (never silent); raise via raster_opts=dict(shard_budget=)
    when an audit shows skew beyond factor.
    """
    import math

    if n_bands <= 1:
        return n_tris  # unsharded: compaction would be pure overhead
    b = math.ceil(factor * n_tris / n_bands / quantum) * quantum
    return max(quantum, b)


def band_pair_budget(pair_budget: int, row_bands: int) -> int:
    """Per-band share of a FULL-frame pair budget for the LEGACY (per-band
    binning) banded path: 1.3x the mean band share as skew headroom, 128-
    quantized. The SINGLE SOURCE for this formula — pipeline's banded render
    and pipeline.audit_bands both call it, so they cannot desynchronize
    (VERDICT r4 weak #4). Misses are counted in overflow either way."""
    return max(128, -(-int(pair_budget) * 13 // (10 * row_bands)) // 128 * 128)


def _compact_to_shard(coef, local_bbox, in_shard, payload, budget: int):
    """Compact the in-shard triangles to a fixed [budget] prefix (order-
    preserving), so per-shard binning sorts budget*small_span keys instead of
    T*small_span — the multi-chip scaling fix for replicated-scene sharding
    (each band holds ~T/n_rows triangles; without this every device pays the
    FULL scene's binning sort). Returns (coef, bbox, valid, payload, dropped).

    The compaction is monotone (original order preserved), so bin ids — which
    are row indices into the compacted table — keep the submission-order
    tie-break contract (FORMULAS.md) and the image stays bit-identical.

    Implemented as ONE ascending T-element sort (in-shard triangles keep their
    iota key, others get INT_MAX, prefix = kept ids in original order) — XLA
    TPU scatters are far slower than sorts (CLAUDE.md gather/scatter cost
    model), so the old .at[].set formulation is avoided.
    """
    T = coef.shape[0]
    key = jnp.where(in_shard, jnp.arange(T, dtype=I32), INT_MAX)
    sel = jax.lax.sort(key)[:budget]
    valid_c = sel != INT_MAX
    safe = jnp.where(valid_c, sel, 0)
    dropped = jnp.maximum(jnp.sum(in_shard.astype(I32)) - budget, 0)
    return (coef[safe], local_bbox[safe], valid_c, payload[safe], dropped)


def _resolve_bin_mode(tile_h: int, use_ybounds, flat_bins: bool,
                      flat_slabs: bool, broad_cap: int):
    """Resolve the binning-mode flags exactly as render_fused applies them
    (single source; prepare_draw_bins and render_fused both call it).
    Returns (use_ybounds, flat_slabs, tie_by_id)."""
    if use_ybounds is None:
        use_ybounds = tile_h > 8
    use_ybounds = use_ybounds and tile_h > 8
    if flat_bins:
        use_ybounds = False  # flat-mode slab culling is flat_slabs
    assert not flat_slabs or flat_bins, "flat_slabs requires flat_bins"
    flat_slabs = flat_slabs and tile_h > 8
    tie_by_id = use_ybounds or broad_cap > 0 or flat_slabs
    return use_ybounds, flat_slabs, tie_by_id


def prepare_draw_bins(
    coef, bbox, valid, payload, height: int, width: int,
    y_offset=0, x_offset=0, *,
    tile_h: int = DEFAULT_RASTER_OPTS["tile_h"],
    tile_w: int = DEFAULT_RASTER_OPTS["tile_w"],
    capacity: int = DEFAULT_RASTER_OPTS["capacity"],
    small_span: int = DEFAULT_RASTER_OPTS["small_span"],
    broad_cap: int = DEFAULT_RASTER_OPTS["broad_cap"],
    shard_budget: int | None = None,
    pair_budget: int | None = None,
    flat_bins: bool = False,
    mid_cap: int | None = None,
    flat_slabs: bool = False,
    use_ybounds: bool | None = None,
):
    """render_fused's EXACT binning prelude (viewport clip -> optional shard
    compaction -> bin_triangles / bin_triangles_flat) as a standalone stage.

    render_fused calls this, and so does pipeline.audit_bands — the audit
    runs THE REAL binning per band instead of a duplicated host-side cost
    model, so emission changes can never desynchronize audit from production
    (VERDICT r4 weak #4). Returns (bins, compact_dropped) where bins is a
    binning.Bins (dense) or binning.FlatBins (flat): bins.overflow counts
    every capacity/budget/broad/mid drop and compact_dropped the triangles
    cut by shard_budget compaction."""
    use_ybounds, flat_slabs, _ = _resolve_bin_mode(
        tile_h, use_ybounds, flat_bins, flat_slabs, broad_cap)
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
    if pair_budget is not None:
        # After band compaction the table holds only ~the band's triangles;
        # a scene-level pair budget would over-gather. 3x the (possibly
        # compacted) triangle count keeps generous skew headroom — real pairs
        # are ~1.3x T for tiny-triangle scenes (misses are counted).
        pair_budget = min(int(pair_budget), 3 * coef.shape[0])

    if flat_bins:
        assert pair_budget is not None, "flat_bins requires pair_budget"
        from dtrenderer_tpu.ops.binning import bin_triangles_flat

        fbins = bin_triangles_flat(
            coef, local, in_shard, height, width,
            tile_h=tile_h, tile_w=tile_w, capacity=capacity,
            small_span=small_span, broad_cap=broad_cap,
            payload=payload, pair_budget=int(pair_budget), mid_cap=mid_cap,
            n_slabs=(tile_h // 8 if flat_slabs else 1),
        )
        return fbins, compact_dropped

    bins = bin_triangles(
        coef, local, in_shard, height, width,
        tile_h=tile_h, tile_w=tile_w, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap,
        payload=payload, n_slabs=(tile_h // 8 if use_ybounds else 1),
        pair_budget=pair_budget, mid_cap=mid_cap,
    )
    return bins, compact_dropped


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
    tile_h: int = DEFAULT_RASTER_OPTS["tile_h"],
    tile_w: int = DEFAULT_RASTER_OPTS["tile_w"],
    capacity: int = DEFAULT_RASTER_OPTS["capacity"],
    small_span: int = DEFAULT_RASTER_OPTS["small_span"],
    broad_cap: int = DEFAULT_RASTER_OPTS["broad_cap"],
    bilinear: bool | int = False,
    with_phong: bool = True,
    interpret: bool | None = None,
    chunk: int = CHUNK,
    skip_shading: bool = False,
    cols: int = 1,
    shard_budget: int | None = None,
    layout: PayloadLayout = FULL_LAYOUT,
    use_ybounds: bool | None = None,
    batch_rows: int | None = None,
    pair_budget: int | None = None,
    flat_bins: bool = False,
    mid_cap: int | None = None,
    flat_slabs: bool = False,
    slot_k: int = SLOT_K,
):
    """Fused visibility+shading draw. Returns (z [H,W], src color [H,W,4],
    overflow i32 scalar).

    flat_bins: skip the dense [tiles, K, C] setup assembly entirely — binning
    returns the sorted-prefix table (binning.bin_triangles_flat) and the
    kernel DMAs each tile's contiguous row range from HBM, walking the shared
    broad block from VMEM (slots >= capacity). Image-identical to the dense
    path when bins do not overflow (under overflow the two paths legitimately
    drop different pairs). Requires pair_budget; incompatible with
    use_ybounds (slab culling in flat mode is flat_slabs, below).

    flat_slabs (requires flat_bins, tile_h > 8): bin pairs at 8-pixel-row
    SLAB granularity — each (tile, slab) gets its own exact contiguous table
    window and the kernel's per-slab loop walks only the triangles whose
    bbox touches that slab (the flat path's slab culling; a slab-boundary
    straddler is in both windows, harmless — the depth carry is idempotent).
    `capacity` becomes the PER-SLAB window capacity (audit it: per-slab
    counts are ~1/n_slabs of per-tile counts plus straddlers). Binning keys
    carry the triangle id as a sort VALUE (binning._emit_pair_keys_vals), so
    the packed-int32 2^31 key-domain cap does not apply — full-frame 4K at
    1M tris bins in one sort with no row banding.

    payload: f32 [T, layout.n_payload] per-triangle channels packed by
    pack_payload for `layout` (see module docstring). tex_lut:
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
    assert payload.shape[1] == layout.n_payload, (
        f"payload has {payload.shape[1]} channels, layout expects "
        f"{layout.n_payload} ({layout})")
    # Single-slab tiles need no slab culling: binning already y-culled, so the
    # y-rank sort + slab-bounds compute are pure overhead — skip them. For
    # multi-slab tiles the default is on (per-slab contiguous slot ranges,
    # cond-free); use_ybounds=False trades the cull away for cheaper binning.
    # Depth-tie contract (FORMULAS.md): min id wins. Tri-sorted bins order
    # [smalls by id][broads by id], so the cheap slot tie-break only equals
    # min-id when broads cannot exist (broad_cap == 0); otherwise the kernel
    # carries the id channel. Y-sorted bins always need the id channel, and
    # so do slab windows (two-tier emission order is not id order).
    use_ybounds, flat_slabs, tie_by_id = _resolve_bin_mode(
        tile_h, use_ybounds, flat_bins, flat_slabs, broad_cap)
    batch_rows = _norm_batch_rows(batch_rows, tile_h, tile_w)
    # bilinear: False/0 = nearest, True/1 = bilinear, SAMPLE_MIXED (2) = per-
    # triangle choice via the P_FLAGS payload bit 1.
    sampling = int(bilinear)
    assert sampling in (SAMPLE_NEAREST, SAMPLE_BILINEAR, SAMPLE_MIXED)

    y_off = jnp.asarray(y_offset, I32)
    x_off = jnp.asarray(x_offset, I32)
    bins, compact_dropped = prepare_draw_bins(
        coef, bbox, valid, payload, height, width, y_offset, x_offset,
        tile_h=tile_h, tile_w=tile_w, capacity=capacity,
        small_span=small_span, broad_cap=broad_cap,
        shard_budget=shard_budget, pair_budget=pair_budget,
        flat_bins=flat_bins, mid_cap=mid_cap, flat_slabs=flat_slabs,
        use_ybounds=use_ybounds,
    )

    if flat_bins:
        offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
        scalars = jnp.asarray(
            [[light_dir[0], light_dir[1], light_dir[2], ambient,
              0.0, 0.0, 0.0, 0.0]], F32
        )
        z, src = _render_from_flat_bins(
            bins, offsets, scalars, tex_lut,
            height, width, tile_h, tile_w, capacity, sampling, with_phong,
            interpret, chunk, skip_shading, cols, layout,
            batch_rows, tie_by_id, flat_slabs, slot_k=slot_k,
        )
        return z, src, bins.overflow + compact_dropped

    offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
    scalars = jnp.asarray(
        [[light_dir[0], light_dir[1], light_dir[2], ambient,
          0.0, 0.0, 0.0, 0.0]], F32
    )
    z, src = _render_from_bins(
        bins.setup, bins.counts, offsets, scalars, tex_lut,
        height, width, tile_h, tile_w, capacity, sampling, with_phong,
        interpret, chunk, skip_shading, cols, layout, use_ybounds,
        bins.slab_bounds, batch_rows, tie_by_id, slot_k=slot_k,
    )
    return z, src, bins.overflow + compact_dropped
