"""Micro-attribution of soup binning cost on the TPU: sort vs gather vs rest.

Each variant isolates one stage of ops/binning.py at the soup-bench shape
(T=200k, small_span=8, 1080p/tile 16x128 -> 1020 tiles, K=512). Results drive
tuning decisions; see ARCHITECTURE.md 'Performance'.
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
    rng = np.random.default_rng(3)
    T, S = 200_000, 8
    n_tiles = 1020
    K = 512
    C = 34

    keys_np = rng.integers(0, n_tiles * (T + 1), size=T * S, dtype=np.int32)
    keys = jnp.asarray(keys_np)
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    safe = jnp.asarray(rng.integers(0, T, size=(n_tiles, K), dtype=np.int32))

    def sort1(k, t):
        return jax.lax.sort(k + t.astype(I32)), jnp.float32(0)

    def sort2(k, t):
        v = k // 7
        a, b = jax.lax.sort((k + t.astype(I32), v), num_keys=2)
        return a + b, jnp.float32(0)

    def sort3(k, t):
        v = k // 7
        w = k // 3
        a, b, c = jax.lax.sort((k + t.astype(I32), v, w), num_keys=3)
        return a + b + c, jnp.float32(0)

    def gather(k, t):
        g = table[jnp.clip(safe + k[0], 0, T - 1)]
        return g, jnp.float32(0)

    def searchsorted(k, t):
        ks = k  # pretend sorted; cost model only
        bounds = jnp.arange(n_tiles + 1, dtype=I32) * (T + 1)
        return jnp.searchsorted(ks, bounds), jnp.float32(0)

    for name, fn, args in [
        ("sort 1-key 1.6M", sort1, (keys,)),
        ("sort 2-key 1.6M", sort2, (keys,)),
        ("sort 3-key 1.6M", sort3, (keys,)),
        ("gather 522k x 34ch", gather, (keys[:1],)),
        ("searchsorted 1021", searchsorted, (keys,)),
    ]:
        dt = device_time(lambda *a: fn(*a), *args, jnp.float32(0.5), iters=8)
        print(f"{name:22s} {dt*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
