"""Triangle -> framebuffer-tile binning (static shapes, sort-based).

The TPU replacement for the reference's per-triangle scanline dispatch: instead of
walking each triangle's bbox (SURVEY.md CS-2 "bbox scan"), triangles are binned to the
fixed 2D grid of framebuffer tiles the Pallas kernel rasterizes (raster_pallas.py).

Everything is static-shaped and vectorized (XLA-friendly):
  1. Each triangle's clamped pixel bbox maps to a tile-index span. Triangles covering
     <= SMALL_SPAN tiles emit their covered tiles into a [T, SMALL_SPAN] slot matrix
     (row-major over the span, masked). The few triangles covering more tiles go to a
     separate "broad" list that every tile processes (capacity BROAD_CAP).
  2. (tile, tri) pairs are encoded as tile*Tpad + tri and sorted; per-tile contiguous
     ranges come from searchsorted. Per-tile lists are gathered to a fixed capacity K
     (overflow counted and reported, never silently dropped: the caller can re-bin
     with a bigger K).
  3. Per-tile triangle SETUP data is pre-gathered into [tiles, K, 17] blocks
     (16 geometry channels + the original triangle id bitcast into channel 16) so the
     kernel's inner loop slices triangle-chunk rows straight from VMEM with no
     in-kernel gather.

Depth resolution is order-independent (strict z < with index tie-break, FORMULAS.md),
so bin order within a tile does not affect the image.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

I32 = jnp.int32


class Bins(NamedTuple):
    setup: jnp.ndarray    # f32 [n_ty, n_tx, K, C]: 16 coef + id (bitcast) + payload
    counts: jnp.ndarray   # i32 [n_ty, n_tx] valid slots per tile (<= K)
    overflow: jnp.ndarray  # i32 [] total (tile,tri) pairs dropped due to capacity
    # i32 [n_ty, n_tx, n_slabs + 1, 2] (start, end) slot ranges, or None when
    # n_slabs == 1. Entries 0..n_slabs-1: a CONSERVATIVE superset of the
    # SMALL-triangle slots whose y span can touch that 8-row slab (bins are
    # y-sorted, so they are contiguous). Entry n_slabs: the broad-triangle
    # suffix [cnt_small, count), walked by every slab in a second (usually
    # empty) loop. Cond-free slab culling; superset/overlap is image-identical
    # (edge functions reject non-coverers; the depth carry is idempotent).
    slab_bounds: jnp.ndarray | None = None

SETUP_ID_CHANNEL = 16


class FlatBins(NamedTuple):
    """Flat (non-densified) bins for render_fused's flat_bins kernel mode.

    Instead of materializing the [n_ty, n_tx, K, C] setup blocks (whose
    assembly — broad merge + reorder — costs ~27 ms at 1M tris/4K), the
    kernel DMAs each tile's CONTIGUOUS row range [starts, starts+K) straight
    out of the sorted-prefix table in HBM. Rows are 128 lanes wide because
    TPU pads the minor dim to 128 physically anyway; the extra lanes are free
    in HBM and make full-width DMA slices legal (Mosaic rejects partial-lane
    slices).
    """

    table: jnp.ndarray     # f32 [Lp + K, 128]: [coef 16][id][payload P][0...]
    table_cm: jnp.ndarray  # f32 [P, Lp_pad]: payload channels channel-major
    # starts/counts: i32 [n_ty, n_tx] row offset / SMALL row count of each
    # tile's range. Slab mode (n_slabs > 1): [n_ty * n_slabs, n_tx], one
    # exact range per (tile, 8-row slab), (tile, slab) row-major.
    starts: jnp.ndarray
    counts: jnp.ndarray
    broad: jnp.ndarray     # f32 [B_pad, 128] shared broad rows (all tiles)
    broad_cm: jnp.ndarray  # f32 [P, B_pad128] broad payload channel-major
    n_broad: jnp.ndarray   # i32 [] broad rows valid in `broad`
    overflow: jnp.ndarray  # i32 [] (tile,tri) pairs dropped (counted, loud)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _extract_ranges_rows(mat, starts, K: int, batch: int = 8):
    """Row variant of _extract_ranges: out[i] = mat[starts[i] : starts[i]+K, :]
    — per-tile CONTIGUOUS row ranges as a lax.map of 2D dynamic slices
    (bandwidth-bound; row-gather latency does not apply to contiguous
    slices). mat is padded by K zero rows so a slice at starts <= len(mat)
    never clamps."""
    n = starts.shape[0]
    C = mat.shape[1]
    mat = jnp.concatenate([mat, jnp.zeros((K, C), mat.dtype)])
    pad = (-n) % batch
    s = jnp.pad(starts, (0, pad))

    def per_batch(sb):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(mat, (st, 0), (K, C)))(sb)

    out = jax.lax.map(per_batch, s.reshape(-1, batch)).reshape(-1, K, C)
    return out[:n]


def _compute_slab_bounds(yb, cnt_s, counts, n_ty: int, n_tx: int,
                         tile_h: int, n_slabs: int, K: int):
    """Per-slab conservative slot ranges for y-sorted bins (see Bins
    docstring). yb: [n_tiles, K, 2] gathered (y0, y1) rows; cnt_s/counts:
    [n_tiles] small-prefix and total counts."""
    jK = jnp.arange(K, dtype=I32)[None, :]
    valid_small = jK < cnt_s[:, None]                     # [n_tiles, K]
    y0_s = jnp.where(valid_small, yb[..., 0], jnp.inf)
    y1_s = jnp.where(valid_small, yb[..., 1], -jnp.inf)
    max_h = jnp.maximum(jnp.max(y1_s - y0_s, axis=-1), 0.0)  # [n_tiles]
    # slab s of tile row ti covers LOCAL pixel rows [lo, lo+7].
    lo = (jnp.arange(n_ty, dtype=I32)[:, None] * tile_h
          + jnp.arange(n_slabs, dtype=I32)[None, :] * 8).astype(jnp.float32)
    lo4 = lo[:, None, :, None]                            # [n_ty,1,S,1]
    hi4 = lo4 + 7.0
    y0b = y0_s.reshape(n_ty, n_tx, 1, K)
    mh4 = max_h.reshape(n_ty, n_tx, 1, 1)
    # y0-sorted prefix whose y1 (<= y0+max_h) cannot reach the slab; exact
    # suffix whose y0 is already past the slab. Broads (the unsorted
    # [cnt_s, counts) suffix) get their OWN extra range entry — every slab
    # walks it in a second (usually empty) chunk loop, so one broad
    # triangle does not blow the tight small-triangle ends tile-wide.
    # Re-visiting a slot in both loops would be harmless anyway: the
    # (min z, min id) carry is idempotent.
    start = jnp.sum(y0b < lo4 - mh4, axis=-1, dtype=I32)  # [n_ty,n_tx,S]
    end = jnp.sum(y0b <= hi4, axis=-1, dtype=I32)
    broad_rng = jnp.broadcast_to(
        jnp.stack([cnt_s, counts], axis=-1).reshape(n_ty, n_tx, 1, 2),
        (n_ty, n_tx, 1, 2))
    return jnp.concatenate(
        [jnp.stack([start, end], axis=-1), broad_rng], axis=2
    )  # [n_ty, n_tx, S+1, 2]; entry S = the shared broad suffix


def _extract_ranges(flat, starts, K: int, batch: int = 16):
    """out[i] = flat[starts[i] : starts[i] + K] for each tile i.

    The per-tile slot lists are CONTIGUOUS ranges of the sorted pair array, so
    extraction is a lax.map of dynamic slices — ~3x faster on TPU than the
    equivalent flat gather flat[starts[:,None] + arange(K)] (row-gathers pay a
    fixed per-row latency; contiguous slices do not). flat is padded by K
    sentinels so dynamic_slice never clamps (a clamped start would SHIFT the
    whole row, corrupting real slots)."""
    n = starts.shape[0]
    flat = jnp.concatenate([flat, jnp.full((K,), flat[-1], flat.dtype)])
    pad = (-n) % batch
    s = jnp.pad(starts, (0, pad))

    def per_batch(sb):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(flat, (st,), (K,)))(sb)

    out = jax.lax.map(per_batch, s.reshape(-1, batch)).reshape(-1, K)
    return out[:n]


def _emit_pair_keys(small, n_cover, tx0, ty0, span_w, rank_vec,
                    T: int, n_tiles: int, n_tx: int, small_span: int,
                    mid_cap: int | None = None, auto_tier: bool = False):
    """Packed (tile, rank) pair keys as ONE flat i32 array, ready to sort.

    Two-tier emission when small_span > 2: most triangles in a dense scene
    cover 1-2 tiles, so a uniform [T, small_span] slot matrix is mostly
    sentinel slots and the pair sort pays for all of them. Tier 1 gives every
    triangle 2 slots; triangles covering 3..small_span tiles are COMPACTED to
    a [mid_cap, small_span] matrix (one T-key sort + one widened row gather).
    Emitted keys are identical to the single-tier matrix, so downstream bins
    never change. Returns (keys, mid_overflow): pairs of mid triangles beyond
    mid_cap (auto: T/4, 128-quantized) are dropped AND counted.

    Tiering is a DROP MODE (mids past mid_cap are cut, counted in overflow):
    it only engages when the caller opted into budgeted binning (auto_tier,
    set by callers that were given pair_budget and therefore already accept
    audited drops) or forced it with an explicit mid_cap. A plain
    bin_triangles call never tiers, so its never-drops-below-capacity
    behavior is unchanged.
    """
    SENT = I32(n_tiles * (T + 1))
    sw = jnp.maximum(span_w, 1)[:, None]
    # tiering only pays when the single-tier matrix is big enough that its
    # sort dominates the extra mid-compaction sort + widened gather: measured
    # 200k tris x span 8 (1.6M keys) = a wash (20.8 vs 19.9 ms soup frame),
    # 1M x 8 (8M keys) = bin-only 69.5 -> 62 ms. Gate at 4M slots; an
    # EXPLICIT mid_cap forces tiering on (tests, unusual scenes).
    if small_span <= 2 or (mid_cap is None
                           and (not auto_tier or T * small_span < (1 << 22))):
        s = jnp.arange(small_span, dtype=I32)[None, :]
        tile = (ty0[:, None] + s // sw) * n_tx + (tx0[:, None] + s % sw)
        in_span = small[:, None] & (s < n_cover[:, None])
        keys = jnp.where(in_span, tile * (T + 1) + rank_vec[:, None], SENT)
        return keys.reshape(-1), jnp.zeros((), I32)

    TIER = 2
    s2 = jnp.arange(TIER, dtype=I32)[None, :]
    tile2 = (ty0[:, None] + s2 // sw) * n_tx + (tx0[:, None] + s2 % sw)
    # tier 1 takes ONLY the <= TIER coverers; mids emit ALL their slots via
    # the compacted matrix (emitting their first 2 here too would duplicate
    # pairs: image-harmless but count-inflating and fallback-divergent)
    in2 = (small & (n_cover <= TIER))[:, None] & (s2 < n_cover[:, None])
    key2 = jnp.where(in2, tile2 * (T + 1) + rank_vec[:, None], SENT)

    is_mid = small & (n_cover > TIER)
    M = (mid_cap if mid_cap is not None
         else max(128, _ceil_div(T, 4 * 128) * 128))
    M = min(M, T)
    iota_t = jnp.arange(T, dtype=I32)
    midkey = jnp.where(is_mid, iota_t, jnp.int32(2**31 - 1))
    midsel = jax.lax.sort(midkey)[:M]
    midok = midsel != 2**31 - 1
    midsafe = jnp.where(midok, midsel, 0)
    # one widened [M]-row gather for all per-mid fields (CLAUDE.md: one wide
    # fetch beats several narrow ones)
    packed = jnp.stack([tx0, ty0, jnp.maximum(span_w, 1), n_cover, rank_vec],
                       axis=1)
    packed = jax.lax.optimization_barrier(packed)
    pm = packed[midsafe]                                      # [M, 5]
    sm = jnp.arange(small_span, dtype=I32)[None, :]
    msw = pm[:, 2:3]
    tile_m = (pm[:, 1:2] + sm // msw) * n_tx + (pm[:, 0:1] + sm % msw)
    in_m = midok[:, None] & (sm < pm[:, 3:4])
    key_m = jnp.where(in_m, tile_m * (T + 1) + pm[:, 4:5], SENT)
    keys = jnp.concatenate([key2.reshape(-1), key_m.reshape(-1)])
    mid_overflow = (jnp.sum(jnp.where(is_mid, n_cover, 0))
                    - jnp.sum(jnp.where(midok, pm[:, 3], 0)))
    return keys, mid_overflow


def _bin_prefix_gather(coef, bbox, payload, key_sorted, starts, counts_small,
                       broad_sel, n_broad, broad_dropped, perm,
                       pair_budget: int, T: int, K: int, broad_cap: int,
                       n_ty: int, n_tx: int, tile_h: int, n_slabs: int,
                       rank_space: bool, y_sorted: bool) -> Bins:
    """Prefix-gather bin assembly (see bin_triangles docstring, pair_budget).

    Gathers table rows ONCE for the first Lp sorted pairs, then assembles the
    [n_tiles, K] setup blocks from contiguous row slices — replacing the
    n_tiles*K-row random gather whose per-row latency dominates binning at
    high triangle counts. Produces the same Bins (incl. the padding-id
    contract: slots >= count carry id -1).

    (A windowed per-band sub-gather variant once lived here — XLA row-gather
    cost grows with source-table size, tools/micro_gather_probes.py — but its
    rank-space sorts ate the gain at every measured scale, its window-miss
    pad rows could corrupt the y-sorted slab bounds, and flat_bins superseded
    it; removed.)"""
    n_tiles = n_ty * n_tx
    # clamp to the sorted-pair array length: tiny scenes have fewer keys than
    # the 128-row gather floor (slicing clamps, but the sentinel-spread iota
    # below must match the real prefix length)
    Lp = min(max(int(pair_budget), 128), int(key_sorted.shape[0]))

    # table rows: [coef (16)][payload (P)][id (1)][y0, y1 (2, y-sorted only)]
    parts = [coef]
    P = 0
    if payload is not None:
        P = payload.shape[1]
        parts.append(payload)
    parts.append(jax.lax.bitcast_convert_type(
        jnp.arange(T, dtype=I32), jnp.float32)[:, None])
    if y_sorted:
        parts.append(bbox[:, (1, 3)].astype(jnp.float32))
    table = jnp.concatenate(parts, axis=1)
    # Materialize the concat BEFORE the big row gather: fused, XLA turns the
    # gather-of-concat into one narrow gather PER PART, and row-gather cost is
    # per row (flat in width) — 3 narrow gathers cost ~3x one wide one
    # (measured 65 -> 29 ms at 1.7M rows, tools/micro_gather_probes.py).
    table = jax.lax.optimization_barrier(table)
    if rank_space:
        table = table[perm]  # rank-ordered rows: ONE [T]-row gather
    Cp = table.shape[1]
    neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    pad_row = jnp.concatenate([
        jnp.zeros((16 + P,), jnp.float32), neg1[None],
        jnp.zeros((Cp - 17 - P,), jnp.float32)])

    # Sentinel keys decode to row 0; at a generous budget 20-30% of the
    # prefix would hammer that ONE row and HBM serializes on it (the hidden
    # half of the "65 ms gather": ~38 ns/row with the duplicated tail vs ~17
    # spread — tools/micro_gather_probes.py dup). Spread sentinel ranks
    # over ascending rows instead; the fetched garbage is never reachable
    # (budget cuts are counted and ranges clamp before any sentinel).
    key_pref = key_sorted[:Lp]
    is_sent = key_pref >= I32(n_tiles) * (T + 1)
    spread = ((jnp.arange(Lp, dtype=I32) * I32(-1640531527))
              & I32(0x7FFFFFFF)) % T  # hashed: ascending runs also serialize
    ranks_pref = jnp.where(is_sent, spread, key_pref % (T + 1))

    # THE gather: Lp rows instead of n_tiles*K. Sentinel tail rows are
    # garbage — they sort after every real pair, so no tile range reaches
    # them unless that tile's rows were cut by the budget (counted below).
    table_g = table[jnp.minimum(ranks_pref, T - 1)]         # [Lp, Cp]
    starts_c = jnp.minimum(starts[:-1], Lp)
    budget_cap = jnp.maximum(Lp - starts[:-1], 0)

    small_rows = _extract_ranges_rows(table_g, starts_c, K)  # [n_tiles, K, Cp]

    # capacity + budget caps; everything cut is counted, never silent
    n_broad = jnp.minimum(n_broad, K)
    cnt_s = jnp.minimum(jnp.minimum(counts_small, K - n_broad), budget_cap)
    small_overflow = jnp.sum(counts_small - cnt_s)
    counts = cnt_s + n_broad

    # broad rows ride the same per-tile shifted-slice trick as the legacy
    # path, on whole rows; empty slots are pad_row (id -1)
    safe_b = jnp.maximum(broad_sel, 0)
    rows_b = jnp.where((broad_sel >= 0)[:, None], table[safe_b],
                       pad_row[None, :])
    padded_b = jnp.concatenate([
        jnp.broadcast_to(pad_row, (K, Cp)), rows_b,
        jnp.broadcast_to(pad_row, (max(K - broad_cap, 0) + 1, Cp)),
    ])
    bvals_rows = _extract_ranges_rows(padded_b, K - cnt_s, K)

    jj = jnp.arange(K, dtype=I32)[None, :]
    take_small = (jj < cnt_s[:, None])[..., None]
    rows = jnp.where(take_small, small_rows, bvals_rows)   # [n_tiles, K, Cp]

    slab_bounds = None
    if y_sorted:
        slab_bounds = _compute_slab_bounds(
            rows[..., 17 + P:19 + P], cnt_s, counts, n_ty, n_tx, tile_h,
            n_slabs, K)

    # reorder to the setup layout [coef][id][payload]
    setup = jnp.concatenate(
        [rows[..., :16], rows[..., 16 + P:17 + P], rows[..., 16:16 + P]],
        axis=-1)
    return Bins(
        setup=setup.reshape(n_ty, n_tx, K, 17 + P),
        counts=counts.reshape(n_ty, n_tx),
        overflow=(small_overflow + broad_dropped).astype(I32),
        slab_bounds=slab_bounds,
    )


def _emit_pair_keys_vals(small, n_cover, tx0, sy0, span_w, T: int,
                         n_slab_tiles: int, n_tx: int, small_span: int,
                         mid_cap: int | None = None, tier: int = 4):
    """Slab-granularity pair emission as (key, value) ARRAYS: key = the
    slab-tile id alone (no rank packed in — values carry the triangle id
    through the sort), so the key domain is n_slab_tiles + 1, never
    n_tiles * T. This is what frees the flat path from the packed-int32
    2^31 cap: lax.sort((keys, ids), num_keys=1, stable) moves ~2x the data
    of a keys-only sort but needs no domain headroom at all. Within a
    slab-tile the stable sort preserves emission order (tier-1 ids
    ascending, then mid ids ascending) — NOT globally id-sorted, so slab
    bins always require the kernel's tie_by_id depth-tie path.

    Same two-tier structure as _emit_pair_keys (always on here: slab mode
    is budget-gated by construction, and slab spans inflate the slot
    matrix), but tier-1 is `tier`=4 slots wide: at 8-row slab granularity a
    tiny triangle straddling both a slab boundary and a tile-column boundary
    covers 4 slab-tiles, so 3-4-cover triangles are COMMON — with a 2-wide
    tier the mid matrix (capped at ~T/4) overflowed by ~440k pairs at
    config-5 scale. Returns (keys, vals, mid_overflow)."""
    SENT = I32(n_slab_tiles)
    sw = jnp.maximum(span_w, 1)[:, None]
    iota_t = jnp.arange(T, dtype=I32)

    TIER = min(tier, small_span)
    s2 = jnp.arange(TIER, dtype=I32)[None, :]
    tile2 = (sy0[:, None] + s2 // sw) * n_tx + (tx0[:, None] + s2 % sw)
    in2 = (small & (n_cover <= TIER))[:, None] & (s2 < n_cover[:, None])
    key2 = jnp.where(in2, tile2, SENT)
    val2 = jnp.broadcast_to(iota_t[:, None], key2.shape)

    is_mid = small & (n_cover > TIER)
    M = (mid_cap if mid_cap is not None
         else max(128, _ceil_div(T, 4 * 128) * 128))
    M = min(M, T)
    midkey = jnp.where(is_mid, iota_t, jnp.int32(2**31 - 1))
    midsel = jax.lax.sort(midkey)[:M]
    midok = midsel != 2**31 - 1
    midsafe = jnp.where(midok, midsel, 0)
    packed = jnp.stack([tx0, sy0, jnp.maximum(span_w, 1), n_cover], axis=1)
    packed = jax.lax.optimization_barrier(packed)
    pm = packed[midsafe]                                      # [M, 4]
    sm = jnp.arange(small_span, dtype=I32)[None, :]
    msw = pm[:, 2:3]
    tile_m = (pm[:, 1:2] + sm // msw) * n_tx + (pm[:, 0:1] + sm % msw)
    in_m = midok[:, None] & (sm < pm[:, 3:4])
    key_m = jnp.where(in_m, tile_m, SENT)
    val_m = jnp.broadcast_to(midsafe[:, None], key_m.shape)
    keys = jnp.concatenate([key2.reshape(-1), key_m.reshape(-1)])
    vals = jnp.concatenate([val2.reshape(-1), val_m.reshape(-1)])
    mid_overflow = (jnp.sum(jnp.where(is_mid, n_cover, 0))
                    - jnp.sum(jnp.where(midok, pm[:, 3], 0)))
    return keys, vals, mid_overflow


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "small_span", "broad_cap", "pair_budget", "mid_cap",
                     "n_slabs", "ordered", "row_bands"),
)
def bin_triangles_flat(
    coef,
    bbox,
    valid,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    capacity: int,
    small_span: int,
    broad_cap: int,
    payload,
    pair_budget: int,
    mid_cap: int | None = None,
    n_slabs: int = 1,
    ordered: bool = False,
    row_bands: int = 1,
) -> FlatBins:
    """Flat binning for render_fused(flat_bins=True): sort the (tile, tri)
    pairs and gather the sorted-prefix table ONCE — NO dense [tiles, K, C]
    setup assembly (the kernel DMAs per-tile contiguous row ranges from HBM
    and reads the shared broad block from VMEM). All drops (capacity,
    budget, broad_cap, mid_cap) are counted in overflow, never silent.

    n_slabs == 1 (legacy): one range per tile, same span/packed-key/sort
    scheme as bin_triangles (packed-key domain required); per-tile lists are
    id-ordered (rank space never needed).

    n_slabs > 1 (slab windows, must equal tile_h // 8): pairs are emitted at
    8-PIXEL-ROW slab granularity — each (tile, slab) gets its OWN exact
    contiguous range of the sorted table, so the kernel's per-slab chunk
    loop walks only the triangles whose bbox touches that slab (a triangle
    spanning a slab boundary appears in both ranges; the depth carry is
    idempotent). This is the flat path's slab culling: the dense path's
    conservative y-sorted slab_bounds machinery (1M-row rank sorts) is
    replaced by the binning sort itself. Keys are the slab-tile id alone
    with the triangle id CARRIED as a sort value (_emit_pair_keys_vals), so
    the packed-int32 2^31 domain cap does NOT apply — a full 4K frame at 1M
    triangles bins in one sort, no row banding needed. starts/counts come
    back [n_ty * n_slabs, n_tx] ((tile, slab) row-major). `capacity` is the
    PER-SLAB window capacity. Slab lists are NOT globally id-ordered
    (two-tier emission order), so the kernel must tie-break by the id
    channel (tie_by_id).

    Two-tier span emission (vs bin_triangles' single [T, small_span] slot
    matrix): most triangles in a dense scene cover 1-2 tiles, so a uniform
    small_span=8 matrix is ~3/4 sentinel slots and the pair sort pays for
    all of them. Tier 1 gives every triangle [T, 2] slots; triangles
    covering 3..small_span tiles are COMPACTED to a [mid_cap, small_span]
    matrix (one T-key sort + one widened row gather). Sorted keys are
    identical to the single-tier emission, so bins do not change. mid_cap
    None = auto (T/4, 128-quantized); overflow counts dropped mid pairs
    when a scene exceeds it.

    row_bands > 1 (the SHARED cross-band binning pass; height must be the
    FULL frame height, divisible by row_bands): pairs are emitted over the
    BANDED tile grid — the frame split into row_bands horizontal bands of
    band_h = height // row_bands pixel rows, each band tiled independently
    from its own top edge (exactly the per-band grids the banded/sharded
    render uses; the last tile row of a band is truncated at the band
    boundary, so banded rows are NOT the unbanded rows when band_h %
    tile_h != 0). ONE sort/gather produces ONE table whose starts/counts
    come back [row_bands * ceil(band_h/tile_h), n_tx] (band-major): every
    band's render consumes its own row-slice of the SAME table, replacing
    row_bands separate compaction+sort+gather passes (the measured 56%
    per-band binning redundancy of the replicated-scene band decomposition,
    BENCH_r04). Keys are the banded-tile id alone with the triangle id
    carried as a sort VALUE (_emit_pair_keys_vals, tier 2 — band grids keep
    the unbanded tile_h quantization, so 1-2-tile covers dominate), so the
    packed-int32 2^31 key-domain cap does not apply. Windows are NOT
    id-ordered (two-tier emission) — the kernel must tie-break depth by the
    id channel. Broads are the one shared block walked by every tile of
    every band.

    ordered (raster_ordered's sequential-blend kernel; n_slabs == 1 only):
    broad triangles are emitted INTO the per-tile windows — one [broad_cap,
    n_tiles] key matrix masked to each broad's tile-span rectangle — instead
    of the shared broad block, so every tile's window holds ALL triangles
    touching it in STRICT id order (the packed key embeds the id, so the
    sort itself guarantees submission order; the shared-block design cannot,
    because smalls and broads would need an in-kernel merge). The broad
    block comes back empty (n_broad == 0). Costs O(broad_cap * n_tiles)
    keys — fine at ordered-draw scales, unacceptable for 1M-tri scenes.
    """
    T = coef.shape[0]
    P = payload.shape[1]
    assert 17 + P <= 128, "flat table rows are 128 lanes: [coef16][id][P]"
    n_ty = _ceil_div(height, tile_h)
    n_tx = _ceil_div(width, tile_w)
    n_tiles = n_ty * n_tx
    K = capacity

    if row_bands > 1:
        assert n_slabs == 1 and not ordered, (
            "row_bands composes with the plain flat kernel only")
        assert height % row_bands == 0, (
            f"row_bands={row_bands} must divide the frame height {height}")
        band_h = height // row_bands
        n_tyb = _ceil_div(band_h, tile_h)
        n_rows = row_bands * n_tyb
        n_band_tiles = n_rows * n_tx

        def brow(y):  # banded tile-row index: monotone, exact per band grid
            b = y // band_h
            return b * n_tyb + (y - b * band_h) // tile_h

        tx0, tx1 = bbox[:, 0] // tile_w, bbox[:, 2] // tile_w
        ry0, ry1 = brow(bbox[:, 1]), brow(bbox[:, 3])
        span_w = tx1 - tx0 + 1
        n_cover = jnp.where(valid, span_w * (ry1 - ry0 + 1), 0)
        small = valid & (n_cover > 0) & (n_cover <= small_span)
        broad = valid & (n_cover > small_span)
        key_flat, val_flat, mid_overflow = _emit_pair_keys_vals(
            small, n_cover, tx0, ry0, span_w, T, n_band_tiles, n_tx,
            small_span, mid_cap, tier=2)
        key_sorted, val_sorted = jax.lax.sort(
            (key_flat, val_flat), num_keys=1)
        starts = jnp.searchsorted(
            key_sorted, jnp.arange(n_band_tiles + 1, dtype=I32))
        n_ranges, range_rows = n_band_tiles, n_rows
        sent_floor = I32(n_band_tiles)
    elif n_slabs > 1:
        assert n_slabs == tile_h // 8 and tile_h % 8 == 0
        n_sy = n_ty * n_slabs
        n_slab_tiles = n_sy * n_tx
        tx0, tx1 = bbox[:, 0] // tile_w, bbox[:, 2] // tile_w
        sy0, sy1 = bbox[:, 1] // 8, bbox[:, 3] // 8
        span_w = tx1 - tx0 + 1
        n_cover = jnp.where(valid, span_w * (sy1 - sy0 + 1), 0)
        small = valid & (n_cover > 0) & (n_cover <= small_span)
        broad = valid & (n_cover > small_span)
        key_flat, val_flat, mid_overflow = _emit_pair_keys_vals(
            small, n_cover, tx0, sy0, span_w, T, n_slab_tiles, n_tx,
            small_span, mid_cap)
        key_sorted, val_sorted = jax.lax.sort(
            (key_flat, val_flat), num_keys=1)
        starts = jnp.searchsorted(
            key_sorted, jnp.arange(n_slab_tiles + 1, dtype=I32))
        n_ranges, range_rows = n_slab_tiles, n_sy
        sent_floor = I32(n_slab_tiles)
    else:
        assert (n_tiles + 1) * (T + 1) <= 2**31 - 1, (
            "flat binning needs the packed int32 key domain (use n_slabs > 1 "
            "for the value-carrying sort with no domain cap)")
        # --- small/broad split + packed-key sort (as bin_triangles) ---
        tx0, ty0 = bbox[:, 0] // tile_w, bbox[:, 1] // tile_h
        tx1, ty1 = bbox[:, 2] // tile_w, bbox[:, 3] // tile_h
        span_w, span_h = tx1 - tx0 + 1, ty1 - ty0 + 1
        n_cover = jnp.where(valid, span_w * span_h, 0)
        small = valid & (n_cover > 0) & (n_cover <= small_span)
        broad = valid & (n_cover > small_span)

        key_flat, mid_overflow = _emit_pair_keys(
            small, n_cover, tx0, ty0, span_w, jnp.arange(T, dtype=I32),
            T, n_tiles, n_tx, small_span, mid_cap, auto_tier=True)
        if ordered:
            # broads join the windows (see docstring): [Bc, n_tiles] keys
            # masked to each broad's tile-span rectangle. The packed key
            # embeds the id, so the sort places them in id order among the
            # smalls of every tile they touch.
            Bc = max(int(broad_cap), 1)
            bkey = jnp.where(broad, jnp.arange(T, dtype=I32), I32(T))
            bsel = (jnp.sort(bkey)[:Bc] if T >= Bc else jnp.pad(
                jnp.sort(bkey), (0, Bc - T), constant_values=T))
            bok = bsel < T
            bsafe = jnp.where(bok, bsel, 0)
            rect = jnp.stack([tx0, ty0, tx1, ty1], axis=1)[bsafe]  # [Bc, 4]
            tiles = jnp.arange(n_tiles, dtype=I32)
            tty, ttx = tiles // n_tx, tiles % n_tx
            in_rect = (bok[:, None]
                       & (ttx[None, :] >= rect[:, 0:1])
                       & (ttx[None, :] <= rect[:, 2:3])
                       & (tty[None, :] >= rect[:, 1:2])
                       & (tty[None, :] <= rect[:, 3:4]))
            bkeys = jnp.where(in_rect, tiles[None, :] * (T + 1) + bsel[:, None],
                              I32(n_tiles) * (T + 1))
            key_flat = jnp.concatenate([key_flat, bkeys.reshape(-1)])
            # broads beyond broad_cap are dropped and counted
            mid_overflow = mid_overflow + jnp.maximum(
                jnp.sum(broad.astype(I32)) - Bc, 0)
        key_sorted = jax.lax.sort(key_flat)
        val_sorted = None
        bounds = jnp.arange(n_tiles + 1, dtype=I32) * (T + 1)
        starts = jnp.searchsorted(key_sorted, bounds)
        n_ranges, range_rows = n_tiles, n_ty
        sent_floor = I32(n_tiles) * (T + 1)
    counts_small = (starts[1:] - starts[:-1]).astype(I32)
    Lp = min(max(int(pair_budget), 128), int(key_sorted.shape[0]))

    # --- the ONE table + ONE prefix gather ---
    # Rows are built 128 lanes wide up front: the zero tail rides the gather
    # for free (row-gather cost is per row, flat in width) and full-width DMA
    # slices are the only ones Mosaic accepts.
    idc = jax.lax.bitcast_convert_type(
        jnp.arange(T, dtype=I32), jnp.float32)[:, None]
    table = jnp.concatenate(
        [coef, idc, payload, jnp.zeros((T, 128 - 17 - P), jnp.float32)],
        axis=1)
    table = jax.lax.optimization_barrier(table)
    # Sentinel ranks spread over ascending rows, NOT row 0: a duplicated-row
    # tail serializes HBM on one row (~2x whole-gather cost; see
    # _bin_prefix_gather). Garbage rows are unreachable (counts clamp first).
    key_pref = key_sorted[:Lp]
    is_sent = key_pref >= sent_floor
    spread = ((jnp.arange(Lp, dtype=I32) * I32(-1640531527))
              & I32(0x7FFFFFFF)) % T  # hashed: ascending runs also serialize
    real = (val_sorted[:Lp] if val_sorted is not None
            else key_pref % (T + 1))  # slab mode carries the id as the value
    ranks = jnp.where(is_sent, spread, real)
    table_g = table[jnp.minimum(ranks, T - 1)]              # [Lp, 128]
    # K zero pad rows: a DMA window [start, start+K) at start <= Lp never
    # reads out of bounds. Zero rows can never rasterize (all-zero edge
    # coefficients fail the top-left fill rule) and every consumer masks by
    # slot < count anyway.
    table_g = jnp.concatenate([table_g, jnp.zeros((K, 128), jnp.float32)])

    # channel-major payload for the kernel's phase-2 slot gathers. Lane pad:
    # phase 2 DMAs [P, K+128] at 128-aligned offsets <= Lp. Ordered mode
    # ships ALL channels (coef+id+payload) channel-major instead: its kernel
    # reads per-triangle values exclusively by gather-splat from the cm
    # window (Mosaic cannot broadcast [1,1] -> [tile_h,128] in one op).
    Lpad = _ceil_div(Lp + K + 128, 128) * 128
    n_cm = 17 + P if ordered else P
    cm_lo = 0 if ordered else 17
    P8 = _ceil_div(n_cm, 8) * 8  # Mosaic: DMA slices 8-aligned on sublanes
    table_cm = jnp.transpose(table_g[:, cm_lo:17 + P], (1, 0))
    table_cm = jnp.pad(table_cm,
                       ((0, P8 - n_cm), (0, Lpad - table_cm.shape[1])))

    # --- budget/capacity caps (counted) ---
    starts_c = jnp.minimum(starts[:-1], Lp)
    budget_cap = jnp.maximum(Lp - starts[:-1], 0)
    cnt = jnp.minimum(jnp.minimum(counts_small, K), budget_cap)
    small_overflow = jnp.sum(counts_small - cnt)

    # --- shared broad block (every tile walks it) ---
    # broad_cap == 0 matches the dense path: every broad triangle is DROPPED
    # and counted (the kernel's tie_by_id=False fast path requires slot
    # order == id order, which a kept broad would break). ordered mode
    # already emitted the broads into the windows (and counted its drops).
    Bc = 0 if ordered else int(broad_cap)
    if Bc == 0 and ordered:
        n_broad = jnp.zeros((), I32)
        broad_dropped = jnp.zeros((), I32)
        broad_rows = jnp.zeros((8, 128), jnp.float32)
        broad_cm = jnp.zeros((table_cm.shape[0], 128), jnp.float32)
    elif Bc == 0:
        n_broad = jnp.zeros((), I32)
        broad_dropped = jnp.sum(broad.astype(I32))
        broad_rows = jnp.zeros((8, 128), jnp.float32)
        broad_cm = jnp.zeros((table_cm.shape[0], 128), jnp.float32)
    else:
        B_pad = _ceil_div(Bc, 8) * 8
        broad_key = jnp.where(broad, jnp.arange(T, dtype=I32), I32(T))
        broad_sorted = (jnp.sort(broad_key)[:Bc] if T >= Bc else jnp.pad(
            jnp.sort(broad_key), (0, Bc - T), constant_values=T))
        n_broad = jnp.minimum(jnp.sum(broad.astype(I32)), Bc)
        jb = jnp.arange(Bc, dtype=I32)
        broad_ids = jnp.where(jb < n_broad, broad_sorted, -1)
        broad_dropped = jnp.maximum(jnp.sum(broad.astype(I32)) - Bc, 0)
        broad_rows = jnp.where((broad_ids >= 0)[:, None],
                               table[jnp.maximum(broad_ids, 0)], 0.0)
        broad_rows = jnp.pad(broad_rows, ((0, B_pad - Bc), (0, 0)))
        B_pad128 = _ceil_div(Bc, 128) * 128
        broad_cm = jnp.pad(jnp.transpose(broad_rows[:Bc, 17:17 + P], (1, 0)),
                           ((0, 0), (0, B_pad128 - Bc)))

    return FlatBins(
        table=table_g,
        table_cm=table_cm,
        starts=starts_c.reshape(range_rows, n_tx),
        counts=cnt.reshape(range_rows, n_tx),
        broad=broad_rows,
        broad_cm=broad_cm,
        n_broad=n_broad,
        overflow=(small_overflow + broad_dropped + mid_overflow).astype(I32),
    )


def bin_triangles_flat_distributed(
    coef,
    bbox,
    valid,
    payload,
    height: int,
    width: int,
    *,
    tile_h: int,
    tile_w: int,
    capacity: int,
    small_span: int,
    broad_cap: int,
    pair_budget: int,
    row_bands: int,
    axis_name: str = "rows",
    mid_cap: int | None = None,
) -> FlatBins:
    """SPMD (shard_map) form of the shared cross-band binning: EVERY binning
    stage scales 1/N across the device mesh, so the banded bench's sum/8
    projection (each chip charged 1/8 of the binning) describes a real
    program, not replicated compute.

    Per device d (of N = row_bands, over `axis_name`):
      1. emit (banded-tile, tri) pairs for its own 1/N TRIANGLE SLICE over
         the FULL banded grid (same two-tier value-carrying emission as
         bin_triangles_flat(row_bands=...); values are GLOBAL triangle ids);
      2. sort its slice's pairs (keys are band-major, so band buckets come
         out contiguous) and cut one fixed-size bucket per destination band
         (drops COUNTED, never silent);
      3. ONE lax.all_to_all over ICI: device b receives every source's
         band-b bucket (~total_pairs/N values — the only communication);
      4. sort the received ~pairs/N pairs by tile and prefix-gather rows
         from the replicated triangle table (a LOCAL gather: the scene is
         replicated, exactly like the reference's shared-memory threads);
      5. broads (banded cover > small_span) are found per slice, all_gather
         merged (they are few), and shared as the usual broad block.

    Returns a FlatBins whose starts/counts cover THIS device's band rows
    ([ceil(band_h/tile_h), n_tx]) against its LOCAL merged table, ready for
    _render_from_flat_bins, with overflow = the GLOBAL (psum'd) drop count.
    Kept-pair sets match bin_triangles_flat(row_bands=...) exactly at zero
    overflow, so images are identical (depth resolve is order-free; windows
    are not id-ordered, so the kernel's tie_by_id path is required)."""
    T = coef.shape[0]
    P = payload.shape[1]
    assert 17 + P <= 128, "flat table rows are 128 lanes: [coef16][id][P]"
    N = row_bands
    assert height % N == 0, f"row_bands={N} must divide height {height}"
    band_h = height // N
    n_tyb = _ceil_div(band_h, tile_h)
    n_tx = _ceil_div(width, tile_w)
    tiles_per_band = n_tyb * n_tx
    n_band_tiles = N * tiles_per_band
    K = capacity
    d = jax.lax.axis_index(axis_name)
    SENT = I32(n_band_tiles)

    # replicated full table (cheap elementwise build; rows 128 lanes wide)
    idc = jax.lax.bitcast_convert_type(
        jnp.arange(T, dtype=I32), jnp.float32)[:, None]
    table = jnp.concatenate(
        [coef, idc, payload, jnp.zeros((T, 128 - 17 - P), jnp.float32)],
        axis=1)
    table = jax.lax.optimization_barrier(table)

    # --- 1. this device's triangle slice ---
    S0 = _ceil_div(T, N)
    pad = N * S0 - T
    bboxp = jnp.pad(bbox, ((0, pad), (0, 0)))
    validp = jnp.pad(valid, (0, pad))
    base = d * S0
    bb = jax.lax.dynamic_slice_in_dim(bboxp, base, S0)
    vv = jax.lax.dynamic_slice_in_dim(validp, base, S0)

    def brow(y):
        b = y // band_h
        return b * n_tyb + (y - b * band_h) // tile_h

    tx0, tx1 = bb[:, 0] // tile_w, bb[:, 2] // tile_w
    ry0, ry1 = brow(bb[:, 1]), brow(bb[:, 3])
    span_w = tx1 - tx0 + 1
    n_cover = jnp.where(vv, span_w * (ry1 - ry0 + 1), 0)
    small = vv & (n_cover > 0) & (n_cover <= small_span)
    broad_s = vv & (n_cover > small_span)

    keys, vals, mid_ov = _emit_pair_keys_vals(
        small, n_cover, tx0, ry0, span_w, S0, n_band_tiles, n_tx,
        small_span, mid_cap, tier=2)
    vals = vals + base  # slice-local -> GLOBAL triangle ids
    keys_s, vals_s = jax.lax.sort((keys, vals), num_keys=1)

    # --- 2. fixed-size per-band buckets of the sorted slice pairs ---
    bounds = jnp.arange(N + 1, dtype=I32) * I32(tiles_per_band)
    bstarts = jnp.searchsorted(keys_s, bounds)            # [N + 1]
    bcounts = (bstarts[1:] - bstarts[:-1]).astype(I32)
    # expected pairs per (source, dest) bucket ~ total/(N^2); 1.3x headroom
    S_b = max(128, _ceil_div(-(-13 * int(pair_budget) // 10), N * N)
              // 128 * 128 + 128)
    bucket_ov = jnp.sum(jnp.maximum(bcounts - S_b, 0))
    pk = jnp.concatenate([keys_s, jnp.full((S_b,), SENT, I32)])
    pv = jnp.concatenate([vals_s, jnp.zeros((S_b,), I32)])
    st = jnp.minimum(bstarts[:-1], keys_s.shape[0])
    kb = jax.vmap(lambda s: jax.lax.dynamic_slice(pk, (s,), (S_b,)))(st)
    vb = jax.vmap(lambda s: jax.lax.dynamic_slice(pv, (s,), (S_b,)))(st)
    mask = jnp.arange(S_b, dtype=I32)[None, :] < jnp.minimum(bcounts, S_b)[:, None]
    kb = jnp.where(mask, kb, SENT)
    vb = jnp.where(mask, vb, 0)

    # --- 3. THE exchange: device b receives every source's band-b bucket ---
    kx = jax.lax.all_to_all(kb, axis_name, split_axis=0, concat_axis=0)
    vx = jax.lax.all_to_all(vb, axis_name, split_axis=0, concat_axis=0)

    # --- 4. local merge sort + windows + prefix gather (all ~1/N sized) ---
    L = N * S_b
    k2s, v2s = jax.lax.sort((kx.reshape(L), vx.reshape(L)), num_keys=1)
    tile_bounds = d * I32(tiles_per_band) + jnp.arange(
        tiles_per_band + 1, dtype=I32)
    starts = jnp.searchsorted(k2s, tile_bounds)
    counts_small = (starts[1:] - starts[:-1]).astype(I32)

    is_sent = k2s >= SENT
    spread = ((jnp.arange(L, dtype=I32) * I32(-1640531527))
              & I32(0x7FFFFFFF)) % T  # hashed: dup/ascending runs serialize
    ranks = jnp.where(is_sent, spread, v2s)
    table_g = table[jnp.minimum(ranks, T - 1)]            # [L, 128]
    table_g = jnp.concatenate([table_g, jnp.zeros((K, 128), jnp.float32)])
    starts_c = jnp.minimum(starts[:-1], L)
    budget_cap = jnp.maximum(L - starts[:-1], 0)
    cnt = jnp.minimum(jnp.minimum(counts_small, K), budget_cap)
    small_overflow = jnp.sum(counts_small - cnt)

    Lpad = _ceil_div(L + K + 128, 128) * 128
    P8 = _ceil_div(P, 8) * 8
    table_cm = jnp.transpose(table_g[:, 17:17 + P], (1, 0))
    table_cm = jnp.pad(table_cm,
                       ((0, P8 - P), (0, Lpad - table_cm.shape[1])))

    # --- 5. broads: per-slice top list, all_gather + merge (few) ---
    Bc = int(broad_cap)
    bkey = jnp.where(broad_s, base + jnp.arange(S0, dtype=I32),
                     jnp.int32(2**31 - 1))
    btop = (jax.lax.sort(bkey)[:Bc] if S0 >= Bc
            else jnp.pad(jax.lax.sort(bkey), (0, Bc - S0),
                         constant_values=2**31 - 1))
    bg = jax.lax.all_gather(btop, axis_name).reshape(-1)  # [N * Bc]
    bg = jax.lax.sort(bg)[:Bc]
    n_broad_total = jax.lax.psum(jnp.sum(broad_s.astype(I32)), axis_name)
    # slices can individually clip at Bc before the merge; those drops are
    # inside n_broad_total - n_broad below (merged list keeps the smallest)
    n_broad = jnp.minimum(n_broad_total, Bc)
    jb = jnp.arange(Bc, dtype=I32)
    broad_ids = jnp.where(jb < n_broad, jnp.minimum(bg, T - 1), -1)
    broad_dropped = n_broad_total - n_broad
    B_pad = _ceil_div(Bc, 8) * 8
    broad_rows = jnp.where((broad_ids >= 0)[:, None],
                           table[jnp.maximum(broad_ids, 0)], 0.0)
    broad_rows = jnp.pad(broad_rows, ((0, B_pad - Bc), (0, 0)))
    B_pad128 = _ceil_div(Bc, 128) * 128
    broad_cm = jnp.pad(jnp.transpose(broad_rows[:Bc, 17:17 + P], (1, 0)),
                       ((0, 0), (0, B_pad128 - Bc)))

    overflow = (jax.lax.psum(
        (small_overflow + mid_ov + bucket_ov).astype(I32), axis_name)
        + broad_dropped.astype(I32))
    return FlatBins(
        table=table_g,
        table_cm=table_cm,
        starts=starts_c.reshape(n_tyb, n_tx),
        counts=cnt.reshape(n_tyb, n_tx),
        broad=broad_rows,
        broad_cm=broad_cm,
        n_broad=n_broad,
        overflow=overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "small_span", "broad_cap", "n_slabs", "pair_budget",
                     "mid_cap"),
)
def bin_triangles(
    coef,
    bbox,
    valid,
    height: int,
    width: int,
    tile_h: int = 64,
    tile_w: int = 128,
    capacity: int = 512,
    small_span: int = 32,
    broad_cap: int = 128,
    payload=None,
    n_slabs: int = 1,
    pair_budget: int | None = None,
    mid_cap: int | None = None,
) -> Bins:
    """coef f32 [T,16], bbox i32 [T,4] (x0,y0,x1,y1 inclusive), valid bool [T].

    payload: optional f32 [T, P] extra per-triangle channels appended after the id
    channel (used by the fused render kernel for texture metadata + corner attrs).
    n_slabs > 1: sort each tile's list by (bbox y0, tri) instead of (tri) and
    compute per-8-row-slab conservative slot ranges (Bins.slab_bounds) so the
    kernel's slab loop walks only the slots whose y span can reach the slab —
    culling with NO per-chunk conds (depth resolve is order-free, so bin order
    is semantically free; a superset range is always image-identical because
    the edge functions reject non-covering triangles anyway).

    pair_budget: opt-in fast path for HIGH-triangle-count scenes (packed-key
    domain only). The default path row-gathers the [n_tiles, K] setup table
    (n_tiles*K rows, mostly padding; ~50 ns/row on TPU — the dominant binning
    cost at 1M tris/4K). With a budget, table rows are gathered only for the
    first `pair_budget` entries of the SORTED pair array (real pairs sort
    before all sentinels, so the real-pair prefix is contiguous), and per-tile
    blocks are then CONTIGUOUS row slices (bandwidth-bound, not row-latency-
    bound). Bit-identical to the default path; pairs beyond the budget are
    dropped and COUNTED in overflow (audit with pipeline.audit_scene — a
    budget of ~2.5x the expected real pair count is safe). Setting it also
    opts this call into two-tier span emission at >= 4M slots
    (_emit_pair_keys): triangles covering 3..small_span tiles are compacted
    to an auto-sized mid matrix (~T/4 rows) and mids beyond it are DROPPED
    and counted — audit like any budgeted mode. Without pair_budget (and
    without an explicit mid_cap) emission never tiers and nothing below
    capacity is ever dropped. Ignored on the
    multi-key fallback path. ONLY a win when the row gather dominates
    (n_tiles*K ≳ 1M rows: 4K/1M tris went 402 -> 240 ms); at soup scale
    (1020x512) the row-block slices cost MORE than the ~5 ms gather they
    replace (measured 19.9 -> 27 ms — don't use it there).

    NOTE padding slots (slot >= counts[tile]) carry id -1 in the bitcast id
    channel but GARBAGE (row-0 or neighbor-row) values in the coef/payload
    channels — consumers must mask by id or by slot < count, never read
    padding values.
    """
    T = coef.shape[0]
    n_ty = _ceil_div(height, tile_h)
    n_tx = _ceil_div(width, tile_w)
    n_tiles = n_ty * n_tx
    K = capacity

    tx0 = bbox[:, 0] // tile_w
    ty0 = bbox[:, 1] // tile_h
    tx1 = bbox[:, 2] // tile_w
    ty1 = bbox[:, 3] // tile_h
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    n_cover = jnp.where(valid, span_w * span_h, 0)

    small = valid & (n_cover > 0) & (n_cover <= small_span)
    broad = valid & (n_cover > small_span)

    # --- small path: [T, SMALL_SPAN] tile ids, row-major over each span ---
    s = jnp.arange(small_span, dtype=I32)[None, :]            # [1, S]
    sw = jnp.maximum(span_w, 1)[:, None]                       # [T, 1]
    dy = s // sw
    dx = s % sw
    tile = (ty0[:, None] + dy) * n_tx + (tx0[:, None] + dx)    # [T, S]
    in_span = small[:, None] & (s < n_cover[:, None])
    tile = jnp.where(in_span, tile, n_tiles)                   # sentinel sorts last

    # Sort the (tile, tri) pairs tile-major. Fast path: ONE packed int32 key
    # (tile * (T+1) + rank) — a keys-only sort moves ~2-3x less data than the
    # multi-key fallback. Only taken when the packed domain fits int32 (the
    # fallback multi-key sort covers huge n_tiles x T combinations; int64 would
    # silently truncate under the default jax_enable_x64=False). For
    # y-sorted bins (n_slabs > 1), `rank` is the rank under (bbox y0, id) — ONE
    # cheap T-element sort — so each tile's list comes out y-sorted with the
    # id tie-break, same order the 3-key sort produced.
    tri_ids = jnp.arange(T, dtype=I32)[:, None]
    packed_fits = (n_tiles + 1) * (T + 1) <= 2**31 - 1
    y_sorted = n_slabs > 1
    use_prefix = (packed_fits and pair_budget is not None
                  and int(pair_budget) < T * small_span)
    # rank space: per-tile lists ordered by y0-rank instead of id (needed for
    # the y-sorted slab bounds). The sort key masks non-small triangles to
    # the end (broads/invalid never enter the pair lists).
    rank_space = y_sorted
    if rank_space:
        iota_t = jnp.arange(T, dtype=I32)
        y0s = jnp.where(small, bbox[:, 1], I32(2**30))
        _, perm = jax.lax.sort(
            (y0s, iota_t), num_keys=2
        )  # perm[r] = id of the r-th triangle ordered by (y0, id)
        # inverse permutation WITHOUT a scatter (XLA TPU scatters are slow):
        # sorting perm back to iota carries each rank to its id's position.
        _, rank = jax.lax.sort((perm, iota_t), num_keys=1)
        rank_b = jnp.broadcast_to(rank[:, None], tile.shape)
    else:
        perm = None
        rank_b = jnp.broadcast_to(tri_ids, tile.shape)

    mid_overflow = jnp.zeros((), I32)
    if packed_fits:
        rank_vec = rank if rank_space else jnp.arange(T, dtype=I32)
        # Two-tier emission is a drop mode (see _emit_pair_keys): on the
        # dense path it needs an explicit opt-in — pair_budget (the caller
        # already accepts audited drops) or mid_cap — and never auto-enables
        # for a plain bin_triangles call.
        key_flat, mid_overflow = _emit_pair_keys(
            small, n_cover, tx0, ty0, span_w, rank_vec,
            T, n_tiles, n_tx, small_span, mid_cap,
            auto_tier=pair_budget is not None)
        key_sorted = jax.lax.sort(key_flat)
        bounds = jnp.arange(n_tiles + 1, dtype=I32) * (T + 1)
        starts = jnp.searchsorted(key_sorted, bounds)
        counts_small = (starts[1:] - starts[:-1]).astype(I32)  # [n_tiles]
        j = jnp.arange(K, dtype=I32)[None, :]                  # [1, K]
        if not use_prefix:
            rank_g = _extract_ranges(key_sorted, starts[:-1], K) % (T + 1)
    else:
        rank_val = jnp.where(in_span, rank_b, 0)
        tile_sorted, rank_sorted = jax.lax.sort(
            (tile.reshape(-1), rank_val.reshape(-1)), num_keys=2
        )
        starts = jnp.searchsorted(
            tile_sorted, jnp.arange(n_tiles + 1, dtype=I32))
        counts_small = (starts[1:] - starts[:-1]).astype(I32)
        j = jnp.arange(K, dtype=I32)[None, :]
        rank_g = _extract_ranges(rank_sorted, starts[:-1], K)

    # --- broad path: few triangles, processed by every tile ---
    broad_key = jnp.where(broad, jnp.arange(T, dtype=I32), I32(T))
    broad_sorted = jnp.sort(broad_key)[:broad_cap] if T >= broad_cap else jnp.pad(
        jnp.sort(broad_key), (0, broad_cap - T), constant_values=T
    )
    n_broad = jnp.minimum(jnp.sum(broad.astype(I32)), broad_cap)
    jb = jnp.arange(broad_cap, dtype=I32)
    broad_ids = jnp.where(jb < n_broad, broad_sorted, -1)      # [broad_cap]
    broad_dropped = jnp.maximum(jnp.sum(broad.astype(I32)) - broad_cap, 0)
    # dropped mid pairs (two-tier emission, _emit_pair_keys) ride the same
    # overflow total on both the prefix and legacy assembly paths
    broad_dropped = broad_dropped + mid_overflow
    if rank_space:  # ranks of the broad ids ([broad_cap]-row gather: negligible)
        broad_sel = jnp.where(broad_ids >= 0,
                              rank[jnp.maximum(broad_ids, 0)], -1)
    else:
        broad_sel = broad_ids

    if use_prefix:
        return _bin_prefix_gather(
            coef, bbox, payload, key_sorted, starts, counts_small,
            broad_sel, n_broad, broad_dropped, perm,
            int(pair_budget), T, K, broad_cap, n_ty, n_tx, tile_h, n_slabs,
            rank_space, y_sorted,
        )

    # The per-tile lists stay in RANK space all the way to the final row
    # gather: converting ranks to ids here would be another [n_tiles, K]
    # gather from a [T] array (~10 ns/row); instead the setup TABLE is
    # permuted once (a [T]-row gather) and carries the ids as a channel.
    small_sel = jnp.where(j < counts_small[:, None], rank_g, -1)  # [n_tiles, K]

    # --- merge: per tile, smalls first then broads, contiguous ---
    n_broad = jnp.minimum(n_broad, K)
    cnt_s = jnp.minimum(counts_small, K - n_broad)  # reserve room for broads only
    small_overflow = jnp.sum(jnp.maximum(counts_small - (K - n_broad), 0))
    jj = jnp.arange(K, dtype=I32)[None, :]
    take_small = jj < cnt_s[:, None]
    # Each tile's broad suffix is the SAME broad_ids vector shifted by that
    # tile's cnt_s — per-tile dynamic slices of one padded vector, NOT a
    # [tiles, K] gather (a 522k-row gather from a 128-entry array pays the
    # same ~10 ns/row as any gather; the slice form is ~5x cheaper).
    padded_broads = jnp.concatenate(
        [jnp.full((K,), -1, I32), broad_sel,
         jnp.full((max(K - broad_cap, 0) + 1,), -1, I32)])
    bvals = _extract_ranges(padded_broads, K - cnt_s, K)
    merged = jnp.where(take_small, small_sel[:, :K], bvals)
    counts = cnt_s + n_broad

    # --- pre-gather setup + id channel (+ payload): [n_tiles, K, C] ---
    # Row-gather cost on TPU is per ROW (flat in channel count), so the slab-
    # bounds y0/y1 and (when y-sorted) the triangle-id channel ride the SAME
    # gather as temporary channels and are stripped/moved afterwards.
    parts = [coef]
    if payload is not None:
        parts.append(payload)
    if y_sorted:
        parts.append(jax.lax.bitcast_convert_type(
            jnp.arange(T, dtype=I32), jnp.float32)[:, None])   # id channel
        parts.append(bbox[:, (1, 3)].astype(jnp.float32))  # local y0, y1 rows
    table = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if len(parts) > 1:
        # Materialize before the [n_tiles*K]-row gather: a fused gather-of-
        # concat pays per-row latency once PER PART (see _bin_prefix_gather).
        table = jax.lax.optimization_barrier(table)
    if y_sorted:
        table = table[perm]  # rank-ordered rows: ONE [T]-row gather
    safe = jnp.maximum(merged, 0)
    gathered = table[safe]                                # [n_tiles, K, 16+P(+3)]

    slab_bounds = None
    if y_sorted:
        yb = gathered[..., -2:]
        id_ch = gathered[..., -3]
        gathered = gathered[..., :-3]
        slab_bounds = _compute_slab_bounds(
            yb, cnt_s, counts, n_ty, n_tx, tile_h, n_slabs, K)

    # Padding slots keep row-0 GARBAGE in coef/payload (zero-filling them costs
    # a full [tiles*K, C] select); only the id channel marks them (-1). The
    # kernels mask by id / slot<count (see docstring note).
    if y_sorted:
        neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
        id_bits = jnp.where(merged < 0, neg1, id_ch)[..., None]
    else:
        # tri-sorted bins: rank == id, so the merged sel IS the id
        id_bits = jax.lax.bitcast_convert_type(merged, jnp.float32)[..., None]
    setup = jnp.concatenate(
        [gathered[..., :16], id_bits, gathered[..., 16:]], axis=-1
    )  # [n_tiles, K, C] with C = 17 + P
    C = setup.shape[-1]

    return Bins(
        setup=setup.reshape(n_ty, n_tx, K, C),
        counts=counts.reshape(n_ty, n_tx),
        overflow=(small_overflow + broad_dropped).astype(I32),
        slab_bounds=slab_bounds,
    )
