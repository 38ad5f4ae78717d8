"""Does flat_bins pay at soup scale (200k tris @1080p)? The dense prefix
path did NOT (extract overhead, CLAUDE.md) — flat has no extract, so re-test.

RESULT (2026-08-17, repeats=2): NO — keep the soup on dense bins.
  CURRENT dense t16   19.90 ms (10.05 Mtris/s)
  flat t16            24.48 ms   flat t16 cap384  24.35   flat t8 cols4  28.95
  flat t16 tight bgt  24.06 ms
At 1020 tiles / 200k tris the dense assembly is only a few ms while flat
pays per-tile window overheads the small frame cannot amortize — and the
round-3 cross-step DMA prefetch did NOT close the gap (24.1 vs 20.0 ms
re-measured), so the delta is per-step manual-copy overhead, not exposed
latency. flat_bins wins where dense assembly dominates (1M tris / 2040
tiles at 4K: 243 -> ~200 ms).
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
    from dtrenderer_tpu.utils import math3d as m3

    h, w = 1080, 1920
    n_tris = 200_000
    soup = primitives.random_triangle_soup(n_tris, rng_seed=11, extent=1.6)
    proj = jnp.asarray(m3.perspective(np.pi / 3, w / h, 0.1, 100.0))
    mdl = jnp.asarray(m3.model_matrix((0, 0, -2.8), m3.rotate_y(0.15)))
    fb0 = fblib.create(h, w)

    def make_frame(opts):
        def frame(color, depth, t):
            fb = fblib.Framebuffer(color=color, depth=depth)
            fb = fblib.clear(fb, jnp.asarray([0.02, 0.02, 0.05, 1.0],
                                             jnp.float32))
            rot_t = m3.rotate_y(t - jnp.float32(0.5))
            fb = draw_meshes(
                fb, proj,
                [DrawSpec(soup, m3.mat4mul(mdl, rot_t), shading="gouraud")],
                sampling_mode="nearest", near_clip=False, raster_opts=opts)
            return fb.color, fb.depth
        return frame

    base = dict(tile_h=16, capacity=512, small_span=8,
                use_ybounds=False, cols=2, batch_rows=16)
    budget = 128 * ((int(1.4 * n_tris) + 127) // 128)
    variants = [
        ("CURRENT dense t16", base),
        ("flat t16", dict(base, flat_bins=True, pair_budget=budget)),
        ("flat t16 cap384", dict(base, flat_bins=True, pair_budget=budget,
                                 capacity=384)),
        ("flat t8 cols4", dict(base, flat_bins=True, pair_budget=budget,
                               tile_h=8, cols=4, capacity=384)),
        ("flat t16 tight budget",
         dict(base, flat_bins=True,
              pair_budget=128 * ((int(1.15 * n_tris) + 127) // 128))),
    ]
    for name, opts in variants:
        try:
            dt = device_time(make_frame(opts), fb0.color, fb0.depth,
                             jnp.float32(0.5), iters=8, repeats=2)
            print(f"{name:24s} {dt*1000:7.2f} ms  "
                  f"({n_tris/dt/1e6:.2f} Mtris/s)", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
