"""Config-5-scale row-gather cost probes: does the prefix-gather binning's
Lp-row table gather (the suspected remaining 4K wall) get cheaper with
(a) fewer rows, (b) index locality, or (c) smaller source tables?

Background (CLAUDE.md / ARCHITECTURE.md): XLA TPU row-gathers pay a per-ROW
latency (~10 ns/row small-scale, ~47 ns/row at multi-million-row scale,
flat in row width). The prefix-gather path (binning.py pair_budget) gathers
Lp ~ 1.7M rows from a [1M, 21] table. If the per-row cost at that scale is
driven by the source table's working set (cache/TLB), a y-partitioned
gather (8 gathers of Lp/8 rows from [T/8] sub-tables — indices are already
band-local because pairs sort tile-major) could cut it ~4x. This measures
exactly that before any binning rework.
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
    rng = np.random.default_rng(7)
    T = 1_000_000
    C = 21
    Lp = 1_700_000
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    idx_rand = jnp.asarray(rng.integers(0, T, size=Lp, dtype=np.int32))
    # band-local indices: index i points inside the T/8 window matching its
    # own position (the access pattern a y-sorted table + tile-major pairs
    # would produce).
    win = T // 8
    base = (np.arange(Lp, dtype=np.int64) * 8 // Lp).astype(np.int32) * win
    idx_local = jnp.asarray(
        base + rng.integers(0, win, size=Lp, dtype=np.int32))

    def g(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    for name, idx in (("random", idx_rand), ("band-local", idx_local)):
        dt = device_time(g, idx, jnp.float32(0.5), iters=4, repeats=2)
        print(f"gather 1.7M x {C}ch from [1M] ({name:10s})  {dt*1000:8.2f} ms"
              f"  ({dt/Lp*1e9:.1f} ns/row)", flush=True)

    # (c) split: 8 gathers of Lp/8 rows, each from its own [T/8, C] slice.
    def g_split(i, t):
        outs = []
        for b in range(8):
            sub = jax.lax.dynamic_slice(table, (b * win, 0), (win, C))
            ib = jax.lax.dynamic_slice(i, (b * (Lp // 8),), (Lp // 8,))
            ib = jnp.clip(ib - b * win + t.astype(jnp.int32), 0, win - 1)
            outs.append(sub[ib])
        return jnp.concatenate(outs)

    dt = device_time(g_split, idx_local, jnp.float32(0.5), iters=4, repeats=2)
    print(f"gather 8 x 212k x {C}ch from [125k] slices       {dt*1000:8.2f} ms"
          f"  ({dt/Lp*1e9:.1f} ns/row)", flush=True)

    # (a) row-count scaling at this scale
    for frac, n in (("1.0x", Lp), ("0.75x", 3 * Lp // 4), ("0.5x", Lp // 2)):
        dt = device_time(g, idx_rand[:n], jnp.float32(0.5), iters=4, repeats=2)
        print(f"gather {frac:5s} rows ({n//1000}k, random)            "
              f"{dt*1000:8.2f} ms  ({dt/n*1e9:.1f} ns/row)", flush=True)

    # sorted-ascending indices (pure locality, same table size)
    idx_sorted = jnp.sort(idx_rand)
    dt = device_time(g, idx_sorted, jnp.float32(0.5), iters=4, repeats=2)
    print(f"gather 1.7M x {C}ch from [1M] (sorted asc)      {dt*1000:8.2f} ms"
          f"  ({dt/Lp*1e9:.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
