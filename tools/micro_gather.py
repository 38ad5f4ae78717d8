"""Does XLA's TPU row-gather cost scale with row WIDTH or row COUNT?

Times [rows x C] table gathers at the soup-binning shape for several C.
If cost is ~flat in C (latency per row), channel slimming does not speed
binning's setup gather and only row-count reduction helps.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


def main():
    rng = np.random.default_rng(3)
    T = 200_000
    rows = 1020 * 512
    idx = jnp.asarray(rng.integers(0, T, size=rows, dtype=np.int32))

    for C in (4, 8, 17, 32, 64):
        table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))

        def g(i, t):
            return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

        dt = device_time(g, idx, jnp.float32(0.5), iters=8)
        print(f"gather {rows//1000}k x {C:3d}ch  {dt*1000:8.2f} ms", flush=True)

    # half the rows, widest C: row-count scaling probe
    idx_h = idx[: rows // 2]
    table = jnp.asarray(rng.normal(size=(T, 32)).astype(np.float32))

    def gh(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    dt = device_time(gh, idx_h, jnp.float32(0.5), iters=8)
    print(f"gather {rows//2000}k x  32ch  {dt*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
