"""Config-5 (1M-tri soup @4K) single-chip timing across raster_opts variants.

The BASELINE config-5 stress scene through the production pipeline. Each
variant is one remote compile (4K programs are big: budget 5-15 min cold).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


def main():
    from dtrenderer_tpu.models.scenes import make_config5
    from dtrenderer_tpu.ops import fb as fblib

    variants = [
        ("t32c2048 chunk16 (r1 cfg)", dict(capacity=2048)),
        ("t32c2048 noyb cols2", dict(capacity=2048, use_ybounds=False,
                                     cols=2)),
        ("t32c2048 yb cols2", dict(capacity=2048, cols=2)),
    ]
    for name, opts in variants:
        spec = make_config5(capacity=opts.pop("capacity"))
        extra = opts

        def frame(color, depth, t, _spec=spec, _extra=dict(extra)):
            # monkey-light: re-wrap the scene frame with extra raster opts by
            # calling the underlying draw directly would duplicate scene code;
            # instead thread extras through make_config5's frame closure via
            # raster_opts injection below.
            return _spec.frame(color, depth, t)

        # inject extra opts into the scene's draw call (scenes binds draw_mesh
        # by name at import, so patch the scenes module)
        import dtrenderer_tpu.models.scenes as pl_mod

        orig = pl_mod.draw_mesh

        def patched(*a, raster_opts=None, _extra=dict(extra), **kw):
            ro = dict(raster_opts or {})
            ro.update(_extra)
            return orig(*a, raster_opts=ro, **kw)

        fb0 = fblib.create(spec.height, spec.width)
        t0 = time.time()
        try:
            pl_mod.draw_mesh = patched
            dt = device_time(frame, fb0.color, fb0.depth, jnp.float32(0.5),
                             iters=4)
            mt = spec.n_tris / dt / 1e6
            print(f"{name:28s} {dt*1000:8.1f} ms  {mt:6.2f} Mtris/s  "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED {str(e)[:130]}", flush=True)
        finally:
            pl_mod.draw_mesh = orig


if __name__ == "__main__":
    main()
