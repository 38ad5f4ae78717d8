"""Probes for the two candidate fixes to the 65 ms prefix gather (the real
config-5 binning wall per tools/profile_bin_stages.py):

(1) fusion hypothesis: the banded sub-table gather (measured 6.6 ns/row in
    micro_gather4k.py with a MATERIALIZED table) regresses to full-table cost
    in binning because XLA fuses `table[perm]` + window dynamic_slice into the
    final gather — an optimization_barrier should restore the fast regime.
(2) sorted-index penalty: piecewise-ascending indices (the sorted-pair order)
    gather at ~35-38 ns/row vs 17 random. Gathering in a TRANSPOSED
    (interleaved) order and un-permuting with a structured reshape/transpose
    (bandwidth-bound, not a second gather) should land near the random rate.
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
    perm = jnp.asarray(rng.permutation(T).astype(np.int32))
    # piecewise-ascending indices: 2040 runs (tiles) of ascending values with
    # stride ~T/run_len — the real sorted-pair rank pattern.
    runs = 2040
    run_len = Lp // runs
    base = rng.integers(0, T // 4, size=runs, dtype=np.int64)
    stride = np.maximum((T - base) // run_len, 1)
    idx_pw = (base[:, None] + np.arange(run_len, dtype=np.int64)
              * stride[:, None]).reshape(-1)
    idx_pw = jnp.asarray(np.minimum(idx_pw, T - 1).astype(np.int32))
    Lp = int(idx_pw.shape[0])
    win = T // 8

    def g_direct(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    # (1a) fused: permuted table feeding split sub-gathers, no barrier
    def g_split(barrier):
        def f(i, t):
            tp = table[jnp.clip(perm + t.astype(jnp.int32), 0, T - 1)]
            if barrier:
                tp = jax.lax.optimization_barrier(tp)
            outs = []
            for b in range(8):
                sub = jax.lax.dynamic_slice(tp, (b * win, 0), (win, C))
                if barrier:
                    sub = jax.lax.optimization_barrier(sub)
                ib = jax.lax.dynamic_slice(i, (b * (Lp // 8),), (Lp // 8,))
                ib = jnp.clip(ib // 8, 0, win - 1)  # band-local-ish
                outs.append(sub[ib])
            return jnp.concatenate(outs)
        return f

    # (2) transposed-order gather + structured un-permute
    A, B = 1000, Lp // 1000

    def g_interleave(i, t):
        i2 = jnp.transpose(i[:A * B].reshape(A, B), (1, 0)).reshape(-1)
        out = table[jnp.clip(i2 + t.astype(jnp.int32), 0, T - 1)]
        out = jnp.transpose(out.reshape(B, A, C), (1, 0, 2)).reshape(-1, C)
        tail = table[jnp.clip(i[A * B:], 0, T - 1)]
        return jnp.concatenate([out, tail])

    def g_interleave_bar(i, t):
        i2 = jnp.transpose(i[:A * B].reshape(A, B), (1, 0)).reshape(-1)
        i2 = jax.lax.optimization_barrier(i2)
        out = table[jnp.clip(i2 + t.astype(jnp.int32), 0, T - 1)]
        out = jax.lax.optimization_barrier(out)
        out = jnp.transpose(out.reshape(B, A, C), (1, 0, 2)).reshape(-1, C)
        tail = table[jnp.clip(i[A * B:], 0, T - 1)]
        return jnp.concatenate([out, tail])

    variants = [
        ("direct piecewise-asc", g_direct),
        ("split8 fused (no barrier)", g_split(False)),
        ("split8 + opt barrier", g_split(True)),
        ("interleaved + transpose", g_interleave),
        ("interleaved + barrier", g_interleave_bar),
    ]
    for name, fn in variants:
        dt = device_time(fn, idx_pw, jnp.float32(0.5), iters=4, repeats=2)
        print(f"{name:28s} {dt*1000:8.2f} ms  ({dt/Lp*1e9:.1f} ns/row)",
              flush=True)


def probe_sentinel_tail():
    """Does a duplicated-row tail (sentinel pairs all decoding to row 0)
    explain the 38 ns/row real-index gather vs 17 ns synthetic?"""
    rng = np.random.default_rng(7)
    T, C, Lp = 1_000_000, 21, 1_700_000
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    runs, real = 2040, int(0.75 * 1_700_000)
    run_len = real // runs
    base = rng.integers(0, T // 4, size=runs, dtype=np.int64)
    stride = np.maximum((T - base) // run_len, 1)
    idx = (base[:, None] + np.arange(run_len, dtype=np.int64)
           * stride[:, None]).reshape(-1)
    idx = np.minimum(idx, T - 1).astype(np.int32)
    pad = Lp - idx.shape[0]

    def g(i, t):
        return table[jnp.clip(i + t.astype(jnp.int32), 0, T - 1)]

    for name, tail in (
        ("tail=row0 (sentinel)", np.zeros(pad, np.int32)),
        ("tail=iota (spread)", (np.arange(pad) % T).astype(np.int32)),
        ("tail=random", rng.integers(0, T, size=pad, dtype=np.int32)),
    ):
        full = jnp.asarray(np.concatenate([idx, tail]))
        dt = device_time(g, full, jnp.float32(0.5), iters=4, repeats=2)
        print(f"{name:24s} {dt*1000:8.2f} ms  ({dt/Lp*1e9:.1f} ns/row)",
              flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--sentinel" in _s.argv:
        probe_sentinel_tail()
    else:
        main()
