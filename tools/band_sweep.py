"""Multi-chip scaling evidence from ONE chip: band-height sweep.

Renders the bench.py fill-rate scene as k sequential row bands (k = 1, 2, 4,
8) with the SAME full-frame viewport (frame_height=1080, y_offset per band) —
exactly the per-device work of a k-row shard_map — and times the SUM of all
bands. The ratio sum(k bands) / (k * time(full frame) / k) exposes the
replicated per-band overhead (vertex transform, binning, tile padding) that
makes real multi-chip scaling sublinear; with auto shard_budget (the default
for band renders) vs budget disabled shows how much the compaction fix
recovers. Results go to ARCHITECTURE.md + BENCH extra (VERDICT round-2 weak
#4: replace the assumed linear x8 with an evidence-based projection).

Usage: timeout 1800 python tools/band_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


def main():
    from dtrenderer_tpu.models import primitives
    from dtrenderer_tpu.ops import fb as fblib
    from dtrenderer_tpu.ops.pipeline import DrawSpec, draw_meshes
    from dtrenderer_tpu.ops.shading import make_light
    from dtrenderer_tpu.utils import math3d as m3

    h, w = 1080, 1920
    sphere = primitives.uv_sphere(24, 32)
    tex = primitives.checkerboard(64, 8)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    light = make_light((0.4, 0.6, 1.0), 0.15)
    models = [
        jnp.asarray(m3.model_matrix((x, y, -3.2), m3.rotate_y(0.3 * (x + y)),
                                    1.05))
        for x in (-1.2, 0.0, 1.2) for y in (-0.7, 0.7)
    ]
    # tile_h=32 for all band heights so tile-grid padding is comparable
    base_opts = dict(tile_h=32, tile_w=128, capacity=256, batch_rows=32)

    def bands_frame(k, budget_on):
        band_h = h // k  # 1080, 540, 270, 135

        def frame(color, depth, t):
            rot_t = m3.rotate_y(t - jnp.float32(0.5))
            draws = [DrawSpec(sphere, m3.mat4mul(mdl, rot_t), texture=tex,
                              shading="phong") for mdl in models]
            outs_c, outs_d = [], []
            for b in range(k):
                bh = band_h if b < k - 1 else h - band_h * (k - 1)
                fb = fblib.clear(
                    fblib.create(bh, w),
                    jnp.asarray([0.02, 0.02, 0.05, 1.0], jnp.float32))
                opts = dict(base_opts)
                if not budget_on:
                    opts["shard_budget"] = 10**9  # disables compaction
                fb = draw_meshes(
                    fb, proj, draws, light=light, sampling_mode="bilinear",
                    frame_height=h, frame_width=w, y_offset=b * band_h,
                    raster_opts=opts,
                )
                outs_c.append(fb.color)
                outs_d.append(fb.depth)
            return jnp.concatenate(outs_c, 0), jnp.concatenate(outs_d, 0)

        return frame

    fb0 = fblib.create(h, w)
    t = jnp.float32(0.5)
    results = {}
    base_dt = None
    for k in (1, 2, 4, 8):
        for budget_on in (True, False):
            if k == 1 and not budget_on:
                continue  # no compaction at k=1 either way
            fn = bands_frame(k, budget_on)
            dt = device_time(fn, fb0.color, fb0.depth, t, iters=8, repeats=3)
            tag = f"k={k} budget={'on' if budget_on else 'off'}"
            if k == 1:
                base_dt = dt
            # per-band time * k vs the full-frame time = total overhead factor;
            # a perfect 8-chip shard would take dt/k wall-clock per frame.
            results[tag] = dt
            speedup = base_dt / (dt / k) if base_dt else float("nan")
            print(f"{tag:18s} sum-of-bands {dt*1000:7.2f} ms  "
                  f"projected x{k}-chip speedup {speedup:5.2f}", flush=True)
    print("\nprojected 8-chip fill rate = covered_pix / (t_k8 / 8)")


if __name__ == "__main__":
    main()
