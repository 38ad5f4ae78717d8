"""Tiled Pallas visibility rasterizer — the TPU hot loop.

TPU-native counterpart of the reference's SIMD per-pixel fill loop
(SURVEY.md CS-2 ★HOT LOOP: per pixel edge fns -> barycentrics -> z-test; SSE2 4-wide
"SIMDTriangle"). Here the "SIMD width" is a whole framebuffer tile: the kernel walks
each tile's binned triangle list (ops/binning.py) in chunks of CHUNK triangles,
evaluating all three edge functions + depth for CHUNK x N_PIXELS fragments as dense
2D VPU ops — triangle chunk on the sublane axis, flattened tile pixels on the lane
axis, so every broadcast is single-axis (a Mosaic requirement). The per-pixel winner
is a (min depth, min id) reduction over the chunk axis merged into a running best —
the order-independent equivalent of the sequential z-test (FORMULAS.md "Depth test").
Coverage/interp formulas mirror geometry.coverage_and_depth exactly.

Output is the visibility G-buffer (depth f32, winning tri id i32); texture/shading run
in the deferred jnp pass (ops/pipeline.py) where XLA fuses the gathers.
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


def _make_kernel(tile_h: int, tile_w: int, capacity: int):
    n_pix = tile_h * tile_w

    def kernel(counts_ref, off_ref, setup_ref, z_ref, id_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        n = counts_ref[ti, tj]
        y0 = ti * tile_h + off_ref[0, 0]
        x0 = tj * tile_w + off_ref[0, 1]

        flat = jax.lax.broadcasted_iota(I32, (1, n_pix), 1)
        fx = flat % tile_w
        fy = flat // tile_w
        px = (fx + x0).astype(F32) + F32(0.5)  # [1, N]
        py = (fy + y0).astype(F32) + F32(0.5)

        def chunk_body(c, carry):
            best_z, best_id = carry  # [1, N] f32 / i32
            k0 = pl.multiple_of(c * CHUNK, CHUNK)
            s = setup_ref[0, 0, pl.ds(k0, CHUNK), :]  # [CHUNK, 17]

            def col(i):
                return s[:, i : i + 1]  # [CHUNK, 1] -> lane-broadcasts against [1, N]

            A0, B0, C0 = col(0), col(1), col(2)
            A1, B1, C1 = col(3), col(4), col(5)
            A2, B2, C2 = col(6), col(7), col(8)
            inv_area2 = col(9)
            z0, z1, z2 = col(10), col(11), col(12)
            tl0, tl1, tl2 = col(13), col(14), col(15)
            ids = jax.lax.bitcast_convert_type(col(16), I32)  # [CHUNK, 1]

            # FORMULAS.md coverage + depth (same op order as geometry.py).
            E0 = (A0 * px + B0 * py) + C0  # [CHUNK, N]
            E1 = (A1 * px + B1 * py) + C1
            E2 = (A2 * px + B2 * py) + C2
            acc0 = (E0 > 0) | ((E0 == 0) & (tl0 > 0))
            acc1 = (E1 > 0) | ((E1 == 0) & (tl1 > 0))
            acc2 = (E2 > 0) | ((E2 == 0) & (tl2 > 0))
            inside = acc0 & acc1 & acc2 & (ids >= 0)

            b0 = E0 * inv_area2
            b1 = E1 * inv_area2
            b2 = E2 * inv_area2
            z = (b0 * z0 + b1 * z1) + b2 * z2  # [CHUNK, N]

            zsel = jnp.where(inside, z, jnp.inf)
            zmin = jnp.min(zsel, axis=0, keepdims=True)  # [1, N]
            idsel = jnp.where(inside & (zsel == zmin), ids, INT_MAX)
            idmin = jnp.min(idsel, axis=0, keepdims=True)

            take = (zmin < best_z) | ((zmin == best_z) & (idmin < best_id))
            return (
                jnp.where(take, zmin, best_z),
                jnp.where(take, idmin, best_id),
            )

        init = (
            jnp.full((1, n_pix), jnp.inf, F32),
            jnp.full((1, n_pix), INT_MAX, I32),
        )
        n_chunks = pl.cdiv(n, CHUNK)
        best_z, best_id = jax.lax.fori_loop(0, n_chunks, chunk_body, init)

        z_ref[...] = best_z.reshape(1, 1, 1, n_pix)
        id_ref[...] = jnp.where(
            best_z == jnp.inf, -1, best_id
        ).reshape(1, 1, 1, n_pix)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "capacity",
                     "interpret"),
)
def _raster_from_bins(bins_setup, bins_counts, offsets, height, width,
                      tile_h, tile_w, capacity, interpret):
    n_ty, n_tx = bins_counts.shape
    n_pix = tile_h * tile_w

    kernel = _make_kernel(tile_h, tile_w, capacity)
    grid = (n_ty, n_tx)
    z_flat, tri_flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, capacity, 17), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, n_pix), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n_pix), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ty, n_tx, 1, n_pix), F32),
            jax.ShapeDtypeStruct((n_ty, n_tx, 1, n_pix), I32),
        ],
        interpret=interpret,
    )(bins_counts, offsets, bins_setup)

    def unflatten(a):
        # [n_ty, n_tx, TH*TW] -> [Hp, Wp] -> crop
        a = a.reshape(n_ty, n_tx, tile_h, tile_w)
        a = jnp.transpose(a, (0, 2, 1, 3)).reshape(n_ty * tile_h, n_tx * tile_w)
        return a[:height, :width]

    return unflatten(z_flat), unflatten(tri_flat)


def rasterize_pallas(
    coef,
    bbox,
    valid,
    height: int,
    width: int,
    y_offset=0,
    x_offset=0,
    tile_h: int = 32,
    tile_w: int = 128,
    capacity: int = 1024,
    small_span: int = 16,
    broad_cap: int = 128,
    interpret: bool | None = None,
    pair_budget: int | None = None,
):
    """Binned tiled visibility raster. Returns (z, tri, overflow) — like
    rasterize_ref (+offsets) plus the bin-overflow count (dropped (tile, tri)
    pairs; nonzero means raise `capacity`).

    coef/bbox/valid from geometry.triangle_setup in FULL-frame coordinates;
    height/width are THIS shard's dims, y/x_offset its origin in the frame.
    tile_h must be a multiple of 8 and tile_w a multiple of 128 (VPU tiling).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    y_off = jnp.asarray(y_offset, I32)
    x_off = jnp.asarray(x_offset, I32)

    # Clip bboxes to this shard and localize.
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
        pair_budget=pair_budget,
    )
    offsets = jnp.stack([y_off, x_off]).reshape(1, 2)
    z, tri = _raster_from_bins(
        bins.setup, bins.counts, offsets, height, width,
        tile_h, tile_w, capacity, interpret,
    )
    return z, tri, bins.overflow
