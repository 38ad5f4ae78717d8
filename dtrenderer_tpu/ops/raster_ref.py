"""Pure-jnp reference rasterizer: the device-side oracle path.

Plays the role of the reference's scalar `SlowTriangle` path (SURVEY.md §2 #4 / §4.5:
the slow path is the correctness oracle for the SIMD path) — here the pure-jnp full-frame
evaluation is the oracle for the Pallas tile kernel, and both are checked against the
scalar NumPy oracle in tests/oracle.py.

Produces a visibility G-buffer (depth f32[H,W], tri i32[H,W], -1 = background); texture
sampling / shading happen in the deferred pass (ops/shade_deferred.py). Because the
depth test is a pure (min, first-index-on-tie) reduction (FORMULAS.md "Depth test"),
rasterization is order-independent and implemented as a chunked scan over triangles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dtrenderer_tpu.ops.geometry import coverage_and_depth

F32 = jnp.float32


def _pad_to_multiple(x, multiple, axis=0, fill=0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize_ref(coef, valid, height, width, chunk=8, y_offset=0, x_offset=0):
    """Full-frame (or band) visibility rasterization.

    coef: f32 [T, 16] packed triangle setup (geometry.py layout), valid: bool [T].
    y_offset/x_offset: origin of this [height, width] region within the full frame
    (traced scalars ok) — used when the framebuffer is sharded into tiles/bands
    across the device mesh (parallel/shard.py).
    Returns (depth f32 [H, W] with +inf background, tri i32 [H, W] with -1 background).
    """
    T = coef.shape[0]
    coef = _pad_to_multiple(coef, chunk)
    valid = _pad_to_multiple(valid, chunk)
    Tp = coef.shape[0]
    n_chunks = Tp // chunk

    y_offset = jnp.asarray(y_offset, F32)
    x_offset = jnp.asarray(x_offset, F32)
    ys = jnp.arange(height, dtype=F32) + (F32(0.5) + y_offset)
    xs = jnp.arange(width, dtype=F32) + (F32(0.5) + x_offset)
    py = ys[:, None]  # [H, 1]
    px = xs[None, :]  # [1, W]

    coef_c = coef.reshape(n_chunks, chunk, 16)
    valid_c = valid.reshape(n_chunks, chunk)
    ids_c = jnp.arange(Tp, dtype=jnp.int32).reshape(n_chunks, chunk)

    def step(carry, inputs):
        zbuf, tri = carry
        c_coef, c_valid, c_ids = inputs
        # Broadcast: [chunk, 1, 1, 16] against [1, H, 1]/[1, 1, W] pixel centers.
        inside, z, _ = coverage_and_depth(
            c_coef[:, None, None, :], px[None], py[None]
        )
        hit = inside & c_valid[:, None, None]
        zmask = jnp.where(hit, z, jnp.inf)
        # argmin returns the FIRST min index -> lowest triangle index on ties,
        # matching the sequential first-drawn-wins contract (FORMULAS.md).
        best = jnp.argmin(zmask, axis=0)
        zbest = jnp.min(zmask, axis=0)
        ibest = c_ids[best]
        take = zbest < zbuf  # strict: earlier chunks win ties
        return (
            jnp.where(take, zbest, zbuf),
            jnp.where(take, ibest, tri),
        ), None

    init = (
        jnp.full((height, width), jnp.inf, F32),
        jnp.full((height, width), -1, jnp.int32),
    )
    (zbuf, tri), _ = jax.lax.scan(step, init, (coef_c, valid_c, ids_c))
    tri = jnp.where(tri >= T, -1, tri)  # drop padding ids (defensive; padding is invalid)
    return zbuf, tri
