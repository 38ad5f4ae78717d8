"""Follow-up to micro_gather4k.py: is the superlinear per-row cost of the big
Lp-row gather driven by the SOURCE table size or by the per-call OUTPUT row
count? Output-chunked gathers from the FULL table need no index locality and
drop into _bin_prefix_gather bit-exactly; sub-table gathers need a y-sorted
table + windowing. Measure both at repeats=3 (run-to-run variance on the
tunnel bit hard in round 1 of this probe: 28.9 vs 57.4 ms for the SAME
gather)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


def main():
    rng = np.random.default_rng(7)
    T = 1_000_000
    C = 21
    Lp = 1_700_000
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=Lp, dtype=np.int32))

    def g_full(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    def make_chunked(n_chunks):
        L = Lp // n_chunks

        def g(i, t):
            tt = t.astype(jnp.int32)

            def per(j):
                ib = jax.lax.dynamic_slice(i, (j * L,), (L,))
                return table[jnp.clip(ib + tt, 0, T - 1)]

            outs = jax.lax.map(per, jnp.arange(n_chunks, dtype=jnp.int32))
            return outs.reshape(-1, C)
        return g

    def make_chunked_unrolled(n_chunks):
        L = Lp // n_chunks

        def g(i, t):
            tt = t.astype(jnp.int32)
            outs = [table[jnp.clip(i[j * L:(j + 1) * L] + tt, 0, T - 1)]
                    for j in range(n_chunks)]
            return jnp.concatenate(outs)
        return g

    variants = [
        ("full 1.7M one gather   ", g_full),
        ("out-chunk  8 (lax.map) ", make_chunked(8)),
        ("out-chunk 16 (lax.map) ", make_chunked(16)),
        ("out-chunk  8 (unrolled)", make_chunked_unrolled(8)),
        ("out-chunk 32 (lax.map) ", make_chunked(32)),
    ]
    for name, fn in variants:
        dt = device_time(fn, idx, jnp.float32(0.5), iters=4, repeats=3)
        print(f"{name}  {dt*1000:8.2f} ms  ({dt/Lp*1e9:.1f} ns/row)",
              flush=True)


if __name__ == "__main__":
    main()
