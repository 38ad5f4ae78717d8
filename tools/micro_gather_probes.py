"""THE gather cost-model probe file (consolidates rounds 2-3's micro_gather,
micro_gather4k, micro_gather4k2, micro_gather_fix — one probe per conclusion).

Measured conclusions (v5e, tunnel; see CLAUDE.md "Platform gotchas" and the
tpu-gather-cost-model memory note — re-run a probe before trusting a number
in a new regime):

  width    XLA TPU row-gathers pay a PER-ROW latency, flat in row width
           (~10 ns/row at ~0.5M-row scale, ~17 ns random / up to ~47 ns at
           multi-million-row scale). Extra channels ride a gather for free;
           only row-count reduction speeds it up.            -> probe_width
  concat   Gather-of-concat fuses into one narrow gather PER PART: 3 narrow
           gathers cost ~3x one wide one. Materialize the concat with an
           optimization_barrier BEFORE a big row gather.     -> probe_width
  order    ASCENDING index runs gather ~2x SLOWER than random (34.9 vs 17.0
           ns/row) — never "optimize" gather order by sorting indices.
           Interleave/transpose tricks do NOT recover it.    -> probe_order
  dup      A DUPLICATED-row tail (e.g. all sentinels decoding to row 0)
           serializes HBM on that row (~24 vs ~18 ns/row for the whole
           gather) — spread sentinel ranks by hashing (ascending spreads
           also serialize, see `order`).                     -> probe_dup
  source   Per-row cost is driven by the SOURCE working set at large scale;
           output-chunking a gather from the full table does not help, and
           sub-table windowing only pays with a materialized (barriered)
           sub-table — the rank-space sorts it needs ate the gain at every
           measured scale (binning.py removed that path).    -> probe_order

Usage: python tools/micro_gather_probes.py [width|order|dup]  (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time


def _report(name, dt, rows):
    print(f"{name:32s} {dt*1000:8.2f} ms  ({dt/rows*1e9:5.1f} ns/row)",
          flush=True)


def probe_width():
    """Row-gather cost vs row width, and gather-of-concat vs materialized."""
    rng = np.random.default_rng(3)
    T, rows = 1_000_000, 1_500_000
    idx = jnp.asarray(rng.integers(0, T, size=rows, dtype=np.int32))
    for C in (1, 8, 21, 64):
        table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))

        def g(i, t, table=table):
            return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

        dt = device_time(g, idx, jnp.float32(0.5), iters=4, repeats=2)
        _report(f"width C={C}", dt, rows)

    parts = [jnp.asarray(rng.normal(size=(T, c)).astype(np.float32))
             for c in (16, 4, 1)]

    def g_concat(i, t, barrier):
        tab = jnp.concatenate(parts, axis=1)
        if barrier:
            tab = jax.lax.optimization_barrier(tab)
        return tab[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    for barrier in (False, True):
        dt = device_time(lambda i, t, b=barrier: g_concat(i, t, b),
                         idx, jnp.float32(0.5), iters=4, repeats=2)
        _report(f"concat(16+4+1) barrier={barrier}", dt, rows)


def probe_order():
    """Ascending-run (sorted-pair) index penalty vs random indices."""
    rng = np.random.default_rng(7)
    T, C, Lp = 1_000_000, 21, 1_700_000
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    # piecewise-ascending: 2040 runs (tiles) of ascending strided values —
    # the real sorted-pair rank pattern of config-5 binning.
    runs = 2040
    run_len = Lp // runs
    base = rng.integers(0, T // 4, size=runs, dtype=np.int64)
    stride = np.maximum((T - base) // run_len, 1)
    idx_pw = (base[:, None] + np.arange(run_len, dtype=np.int64)
              * stride[:, None]).reshape(-1)
    idx_pw = np.minimum(idx_pw, T - 1).astype(np.int32)
    idx_rand = rng.integers(0, T, size=idx_pw.shape[0], dtype=np.int32)
    n = idx_pw.shape[0]

    def g(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    for name, i in (("piecewise-ascending", idx_pw), ("random", idx_rand)):
        dt = device_time(g, jnp.asarray(i), jnp.float32(0.5),
                         iters=4, repeats=2)
        _report(name, dt, n)


def probe_dup():
    """Duplicated-row tail (sentinels all -> row 0) HBM serialization."""
    rng = np.random.default_rng(7)
    T, C, Lp = 1_000_000, 21, 1_700_000
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    real = int(0.75 * Lp)
    idx = rng.integers(0, T, size=real, dtype=np.int32)
    pad = Lp - real

    def g(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    for name, tail in (
        ("tail=row0 (sentinel)", np.zeros(pad, np.int32)),
        ("tail=hashed spread", ((np.arange(pad) * np.int64(2654435769))
                                % T).astype(np.int32)),
        ("tail=random", rng.integers(0, T, size=pad, dtype=np.int32)),
    ):
        full = jnp.asarray(np.concatenate([idx, tail]))
        dt = device_time(g, full, jnp.float32(0.5), iters=4, repeats=2)
        _report(name, dt, Lp)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("width", "all"):
        probe_width()
    if which in ("order", "all"):
        probe_order()
    if which in ("dup", "all"):
        probe_dup()
