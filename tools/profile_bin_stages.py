"""Attribute config-5 binning time to its internal stages on the TPU.

bin-only at 1M tris / 4K / t32 / K1536 / budget 1.7M measures ~116 ms; the
Lp-row table gather alone is ~29 ms (tools/micro_gather_probes.py) and the 8M-key
sort ~14 ms — this script times the actual stage compositions (sort, prefix
gather, per-tile row extraction at several lax.map batch sizes, full library
binning) to find where the remaining ~70 ms lives before committing to a
structural fix. Each variant is one remote compile; keep the list short.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time

I32 = jnp.int32


def main():
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import binning as B
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.render_fused import pack_payload, plan_layout
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3

    h, w = 2160, 3840
    tile_h, tile_w, K, small_span = 32, 128, 1536, 8
    n_tris = 1_000_000
    Lp = int(1.7 * n_tris)
    n_ty, n_tx = -(-h // tile_h), -(-w // tile_w)
    n_tiles = n_ty * n_tx

    soup = primitives.random_triangle_soup(n_tris, rng_seed=11, extent=1.6)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 50.0))
    light = make_light((0.3, 0.5, 1.0), 0.2)
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    layout = plan_layout([dict(textured=True, phong=False,
                               corner_rgba_is_q=False, meta=(0, 64, 64))],
                         mixed_sampling=False)
    setup, attrs10 = prepare_draw(soup, mdl, proj, m3.mat4mul(proj, mdl), mdl,
                                  light, (1.0, 1.0, 1.0, 1.0), "gouraud",
                                  w, h, True, False)
    payload = pack_payload(attrs10, layout, (0, 64, 64), 0.0)
    coef, bbox, valid = setup.coef, setup.bbox, setup.valid
    T = n_tris

    def sorted_keys(coef, bbox, valid):
        tx0, ty0 = bbox[:, 0] // tile_w, bbox[:, 1] // tile_h
        tx1, ty1 = bbox[:, 2] // tile_w, bbox[:, 3] // tile_h
        span_w, span_h = tx1 - tx0 + 1, ty1 - ty0 + 1
        n_cover = jnp.where(valid, span_w * span_h, 0)
        small = valid & (n_cover > 0) & (n_cover <= small_span)
        s = jnp.arange(small_span, dtype=I32)[None, :]
        sw = jnp.maximum(span_w, 1)[:, None]
        tile = (ty0[:, None] + s // sw) * n_tx + (tx0[:, None] + s % sw)
        in_span = small[:, None] & (s < n_cover[:, None])
        rank_b = jnp.broadcast_to(jnp.arange(T, dtype=I32)[:, None], tile.shape)
        key = jnp.where(in_span, tile * (T + 1) + rank_b,
                        I32(n_tiles * (T + 1)))
        key_sorted = jax.lax.sort(key.reshape(-1))
        bounds = jnp.arange(n_tiles + 1, dtype=I32) * (T + 1)
        return key_sorted, jnp.searchsorted(key_sorted, bounds)

    def table_of(coef, payload):
        idc = jax.lax.bitcast_convert_type(
            jnp.arange(T, dtype=I32), jnp.float32)[:, None]
        return jnp.concatenate([coef, payload, idc], axis=1)

    def v_sort(coef, bbox, valid, payload):
        ks, st = sorted_keys(coef, bbox, valid)
        return ks, st

    def v_gather(coef, bbox, valid, payload):
        ks, st = sorted_keys(coef, bbox, valid)
        table = table_of(coef, payload)
        ranks = ks[:Lp] % (T + 1)
        return table[jnp.minimum(ranks, T - 1)], st

    def v_extract(batch):
        def f(coef, bbox, valid, payload):
            ks, st = sorted_keys(coef, bbox, valid)
            table = table_of(coef, payload)
            ranks = ks[:Lp] % (T + 1)
            table_g = table[jnp.minimum(ranks, T - 1)]
            starts_c = jnp.minimum(st[:-1], Lp)
            return B._extract_ranges_rows(table_g, starts_c, K, batch=batch)
        return f

    def v_full(coef, bbox, valid, payload):
        bins = B.bin_triangles(coef, bbox, valid, h, w, tile_h=tile_h,
                               tile_w=tile_w, capacity=K,
                               small_span=small_span, broad_cap=128,
                               payload=payload, pair_budget=Lp)
        return bins.setup, bins.counts

    def v_concat(coef, bbox, valid, payload):
        ks, st = sorted_keys(coef, bbox, valid)
        return table_of(coef, payload), st

    def v_concat_wide(coef, bbox, valid, payload):
        ks, st = sorted_keys(coef, bbox, valid)
        idc = jax.lax.bitcast_convert_type(
            jnp.arange(T, dtype=I32), jnp.float32)[:, None]
        wide = jnp.concatenate(
            [coef, idc, payload,
             jnp.zeros((T, 128 - 17 - payload.shape[1]), jnp.float32)],
            axis=1)
        return wide, st

    # pure gather with a pre-materialized table (the micro-probe regime),
    # sort still inside so the index provenance matches
    table_pre = jax.block_until_ready(
        jax.jit(lambda c, p: table_of(c, p))(coef, payload))

    def v_gather_mat(table_pre, coef, bbox, valid, payload):
        ks, st = sorted_keys(coef, bbox, valid)
        ranks = ks[:Lp] % (T + 1)
        return table_pre[jnp.minimum(ranks, T - 1)], st

    variants = [
        ("sort+starts", v_sort),
        ("+concat only", v_concat),
        ("+concat 128-wide", v_concat_wide),
        ("+prefix gather", v_gather),
        ("sort+gather(mat)", None),  # special-cased below
        ("+extract b8", v_extract(8)),
        ("full bin (lib)", v_full),
    ]
    for name, fn in variants:
        try:
            if name == "sort+gather(mat)":
                dt = device_time(jax.jit(v_gather_mat), table_pre, coef, bbox,
                                 valid, payload, iters=4, repeats=2)
            else:
                dt = device_time(jax.jit(fn), coef, bbox, valid, payload,
                                 iters=4, repeats=2)
            print(f"{name:18s} {dt*1000:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
