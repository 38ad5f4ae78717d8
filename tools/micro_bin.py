"""Micro-attribution of soup binning cost on the TPU (scratch experiments).

Three generations of the same investigation, folded into one tool:
  --stage synthetic : isolated sort/gather/searchsorted costs at the soup shape
  --stage real      : REAL soup binning decomposed stage by stage (the useful one)
  --stage extract   : extraction-gather alternatives (flat gather vs map-dynslice)
Results drove ops/binning.py's design (packed-key sort, slice-based extraction,
rank-space lists); see ARCHITECTURE.md 'Performance' and the CLAUDE.md gather
cost-model gotcha.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time

I32 = jnp.int32

def stage_synthetic():
    rng = np.random.default_rng(3)
    T, S = 200_000, 8
    n_tiles = 1020
    K = 512
    C = 34

    keys_np = rng.integers(0, n_tiles * (T + 1), size=T * S, dtype=np.int32)
    keys = jnp.asarray(keys_np)
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    safe = jnp.asarray(rng.integers(0, T, size=(n_tiles, K), dtype=np.int32))

    def sort1(k, t):
        return jax.lax.sort(k + t.astype(I32)), jnp.float32(0)

    def sort2(k, t):
        v = k // 7
        a, b = jax.lax.sort((k + t.astype(I32), v), num_keys=2)
        return a + b, jnp.float32(0)

    def sort3(k, t):
        v = k // 7
        w = k // 3
        a, b, c = jax.lax.sort((k + t.astype(I32), v, w), num_keys=3)
        return a + b + c, jnp.float32(0)

    def gather(k, t):
        g = table[jnp.clip(safe + k[0], 0, T - 1)]
        return g, jnp.float32(0)

    def searchsorted(k, t):
        ks = k  # pretend sorted; cost model only
        bounds = jnp.arange(n_tiles + 1, dtype=I32) * (T + 1)
        return jnp.searchsorted(ks, bounds), jnp.float32(0)

    for name, fn, args in [
        ("sort 1-key 1.6M", sort1, (keys,)),
        ("sort 2-key 1.6M", sort2, (keys,)),
        ("sort 3-key 1.6M", sort3, (keys,)),
        ("gather 522k x 34ch", gather, (keys[:1],)),
        ("searchsorted 1021", searchsorted, (keys,)),
    ]:
        dt = device_time(lambda *a: fn(*a), *args, jnp.float32(0.5), iters=8)
        print(f"{name:22s} {dt*1000:8.2f} ms", flush=True)



def stage_real():
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops.binning import bin_triangles
    from dtrenderer_tpu.ops.pipeline import prepare_draw
    from dtrenderer_tpu.ops.render_fused import pack_payload, plan_layout
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3

    h, w = 1080, 1920
    soup = primitives.random_triangle_soup(200_000, rng_seed=11, extent=1.6)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    layout = plan_layout([dict(textured=False, phong=False,
                               corner_rgba_is_q=False, meta=(0, 1, 1))],
                         mixed_sampling=False)

    def prep(t):
        model = m3.mat4mul(mdl, m3.rotate_y(t - jnp.float32(0.5)))
        mvp = m3.mat4mul(proj, model)
        setup, attrs10 = prepare_draw(soup, model, proj, mvp, model, light,
                                      (1.0, 1.0, 1.0, 1.0), "gouraud",
                                      w, h, True, False)
        return setup.coef, setup.bbox, setup.valid, attrs10

    def prep_pack(t):
        coef, bbox, valid, attrs10 = prep(t)
        payload = pack_payload(attrs10, layout, (0, 1, 1), 0.0)
        return coef, bbox, valid, payload

    def full_bin(t, tile_h, with_yb):
        coef, bbox, valid, payload = prep_pack(t)
        bins = bin_triangles(coef, bbox, valid, h, w, tile_h=tile_h,
                             tile_w=128, capacity=512, small_span=8,
                             broad_cap=128, payload=payload,
                             n_slabs=(tile_h // 8 if with_yb else 1))
        return bins.setup, bins.counts

    def keysort_only(t):
        coef, bbox, valid, payload = prep_pack(t)
        T = coef.shape[0]
        n_tiles = ((h + 15) // 16) * (w // 128)
        tx0 = bbox[:, 0] // 128
        ty0 = bbox[:, 1] // 16
        tx1 = bbox[:, 2] // 128
        ty1 = bbox[:, 3] // 16
        span_w = tx1 - tx0 + 1
        n_cover = jnp.where(valid, span_w * (ty1 - ty0 + 1), 0)
        small = valid & (n_cover > 0) & (n_cover <= 8)
        s = jnp.arange(8, dtype=I32)[None, :]
        sw = jnp.maximum(span_w, 1)[:, None]
        tile = (ty0[:, None] + s // sw) * (w // 128) + (tx0[:, None] + s % sw)
        in_span = small[:, None] & (s < n_cover[:, None])
        tile = jnp.where(in_span, tile, n_tiles)
        rank_b = jnp.broadcast_to(jnp.arange(T, dtype=I32)[:, None], tile.shape)
        key = jnp.where(in_span, tile * (T + 1) + rank_b,
                        I32(n_tiles * (T + 1)))
        return jax.lax.sort(key.reshape(-1)), jnp.float32(0)

    def bin_to_stage(t, stage):
        """Re-run bin_triangles' small path up to `stage` (noyb), to localize
        the cost the isolated micro-benches cannot explain."""
        coef, bbox, valid, payload = prep_pack(t)
        T = coef.shape[0]
        tile_w, tile_h, K, S = 128, 16, 512, 8
        n_ty, n_tx = (h + tile_h - 1) // tile_h, w // tile_w
        n_tiles = n_ty * n_tx
        tx0 = bbox[:, 0] // tile_w
        ty0 = bbox[:, 1] // tile_h
        span_w = bbox[:, 2] // tile_w - tx0 + 1
        span_h = bbox[:, 3] // tile_h - ty0 + 1
        n_cover = jnp.where(valid, span_w * span_h, 0)
        small = valid & (n_cover > 0) & (n_cover <= S)
        s = jnp.arange(S, dtype=I32)[None, :]
        sw = jnp.maximum(span_w, 1)[:, None]
        tile = (ty0[:, None] + s // sw) * n_tx + (tx0[:, None] + s % sw)
        in_span = small[:, None] & (s < n_cover[:, None])
        rank_b = jnp.broadcast_to(jnp.arange(T, dtype=I32)[:, None], tile.shape)
        key = jnp.where(in_span, tile * (T + 1) + rank_b,
                        I32(n_tiles * (T + 1)))
        key_sorted = jax.lax.sort(key.reshape(-1))
        if stage == "sort":
            return key_sorted, jnp.float32(0)
        bounds = jnp.arange(n_tiles + 1, dtype=I32) * (T + 1)
        starts = jnp.searchsorted(key_sorted, bounds)
        counts_small = (starts[1:] - starts[:-1]).astype(I32)
        from dtrenderer_tpu.ops.binning import _extract_ranges
        rank_g = _extract_ranges(key_sorted, starts[:-1], K) % (T + 1)
        if stage == "extract":
            return rank_g, counts_small
        j = jnp.arange(K, dtype=I32)[None, :]
        small_ids = jnp.where(j < counts_small[:, None], rank_g, -1)
        safe = jnp.maximum(small_ids, 0)
        table = jnp.concatenate([coef, payload], axis=1)
        gathered = table[safe]
        if stage == "gather":
            return gathered, counts_small
        id_bits = jax.lax.bitcast_convert_type(small_ids, jnp.float32)[..., None]
        setup = jnp.concatenate(
            [gathered[..., :16], id_bits, gathered[..., 16:]], axis=-1)
        return setup, counts_small

    variants = [
        ("prepare_draw only", lambda t: prep(t)),
        ("prepare+pack", lambda t: prep_pack(t)),
        ("prep+key+sort only", keysort_only),
        ("stage sort", lambda t: bin_to_stage(t, "sort")),
        ("stage extract", lambda t: bin_to_stage(t, "extract")),
        ("stage gather", lambda t: bin_to_stage(t, "gather")),
        ("stage full-small", lambda t: bin_to_stage(t, "all")),
        ("full bin tile16 yb", lambda t: full_bin(t, 16, True)),
        ("full bin tile16 noyb", lambda t: full_bin(t, 16, False)),
    ]
    for name, fn in variants:
        try:
            dt = device_time(fn, jnp.float32(0.5), iters=8)
            print(f"{name:22s} {dt*1000:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED {str(e)[:120]}", flush=True)



def stage_extract():
    rng = np.random.default_rng(5)
    T, S = 200_000, 8
    n_tiles, K = 1020, 512
    P = T * S

    key_sorted = jnp.asarray(np.sort(
        rng.integers(0, n_tiles * (T + 1), size=P, dtype=np.int32)))
    starts_np = np.sort(rng.integers(0, P - K, size=n_tiles, dtype=np.int32))
    starts = jnp.asarray(starts_np)
    table = jnp.asarray(rng.normal(size=(T, 50)).astype(np.float32))

    def extract_gather(t):
        j = jnp.arange(K, dtype=I32)[None, :]
        pos = jnp.minimum(starts[:, None] + j + t.astype(I32), P - 1)
        return key_sorted[pos], jnp.float32(0)

    def extract_scan(t):
        ks = key_sorted  # captured
        def per_tile(s):
            return jax.lax.dynamic_slice(ks, (s + t.astype(I32),), (K,))
        return jax.lax.map(per_tile, starts), jnp.float32(0)

    def extract_scan_batched(t):
        ks = key_sorted
        def per_batch(sb):  # [B] starts -> [B, K]
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(ks, (s + t.astype(I32),), (K,))
            )(sb)
        return jax.lax.map(per_batch, starts.reshape(-1, 20)), jnp.float32(0)

    def table_gather(t):
        idx = jnp.clip(key_sorted[:n_tiles * K].reshape(n_tiles, K)
                       % (T + 1) + t.astype(I32), 0, T - 1)
        return table[idx], jnp.float32(0)

    for name, fn in [
        ("extract flat-gather", extract_gather),
        ("extract map-dynslice", extract_scan),
        ("extract map20-vmap", extract_scan_batched),
        ("table row-gather 50ch", table_gather),
    ]:
        try:
            dt = device_time(fn, jnp.float32(0.5), iters=8)
            print(f"{name:24s} {dt*1000:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {str(e)[:120]}", flush=True)



if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["synthetic", "real", "extract"],
                    default="real")
    args = ap.parse_args()
    {"synthetic": stage_synthetic, "real": stage_real,
     "extract": stage_extract}[args.stage]()
