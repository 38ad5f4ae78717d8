"""Config-5 (1M-tri soup @4K) single-chip timing across raster_opts variants.

The BASELINE config-5 stress scene through the production pipeline
(models/scenes.make_config5(extra_opts=...)). Each variant is one remote
compile (4K programs are big: budget 5-15 min cold). Every variant is
audited (overflow == 0) before its timing is trusted.

Usage: python tools/bench_4k.py [--skip-audit] [index ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


VARIANTS = [
    # (name, make_config5 kwargs)
    ("production (flat t32 c1536)", dict()),
    # slab audit (round 4, tools snippet in /tmp/coveraudit): config-5 tris
    # average ~4 SLAB-tiles (8-24 px tall), so slab granularity inflates
    # pairs x1.7-2.4 and small_span must be 32 to keep broads tiny (ss8:
    # 47.6k broads / ss16: 4.9k / ss32: 11). capacity is per-slab (max 604
    # at ss8; give headroom for the ex-broads at ss32).
    ("flat_slabs ss32 c768 chunk32", dict(
        capacity=768, extra_opts=dict(flat_slabs=True, small_span=32,
                                      pair_budget=2_600_000))),
    ("flat_slabs ss32 c768 chunk16", dict(
        capacity=768, extra_opts=dict(flat_slabs=True, small_span=32,
                                      chunk=16, pair_budget=2_600_000))),
    ("flat_slabs ss32 c768 cols4", dict(
        capacity=768, extra_opts=dict(flat_slabs=True, small_span=32,
                                      pair_budget=2_600_000, cols=4))),
    ("production row_bands=8", dict(extra_opts=dict(row_bands=8))),
    ("flat_slabs c512 row_bands=8", dict(
        capacity=512, extra_opts=dict(flat_slabs=True, chunk=16,
                                      row_bands=8))),
]


def main():
    from dtrenderer_tpu.models.scenes import make_config5
    from dtrenderer_tpu.ops import fb as fblib

    args = [a for a in sys.argv[1:]]
    skip_audit = "--skip-audit" in args
    idxs = [int(a) for a in args if a.isdigit()]
    chosen = [VARIANTS[i] for i in idxs] if idxs else VARIANTS

    for name, kw in chosen:
        spec = make_config5(**kw)
        fb0 = fblib.create(spec.height, spec.width)
        t0 = time.time()
        try:
            if not skip_audit:
                overflow, maxcount, cap = spec.audit()
                print(f"{name:30s} audit overflow={overflow} "
                      f"max={maxcount}/{cap}", flush=True)
                if overflow:
                    print(f"{name:30s} SKIPPED (overflow)", flush=True)
                    continue
            dt = device_time(spec.frame, fb0.color, fb0.depth,
                             jnp.float32(0.5), iters=4)
            mt = spec.n_tris / dt / 1e6
            print(f"{name:30s} {dt*1000:8.1f} ms  {mt:6.2f} Mtris/s  "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:30s} FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
