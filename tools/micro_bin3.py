"""Third-stage micro-attribution: the binning EXTRACTION gathers on the TPU.

bin_triangles spends ~18 ms (soup shape) after the sort in two 522k-row
gathers: key_sorted[pos] (slot extraction — per-tile CONTIGUOUS ranges) and
table[safe] (setup row gather — true random). This times alternatives for the
first: flat gather vs a lax.map of per-tile dynamic slices.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from dtrenderer_tpu.utils.benchlib import device_time

I32 = jnp.int32


def main():
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
    main()
