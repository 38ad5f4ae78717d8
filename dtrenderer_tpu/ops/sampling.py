"""Texture sampling: vectorized HBM gathers (nearest + bilinear).

TPU-native counterpart of the texel-fetch inside the reference's triangle hot loop
(SURVEY.md CS-2 "perspective-correct UV -> texel fetch"): instead of one fetch inside a
per-pixel loop, whole [H, W] UV fields gather at once; XLA lowers these to batched
gathers and fuses the surrounding arithmetic. Formulas/op order: FORMULAS.md
§"Texture sampling" (clamp-to-edge, v-up Wavefront convention).
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def sample_nearest(tex, u, v):
    """tex f32 [th, tw, 4]; u, v broadcastable f32 -> [..., 4]."""
    th, tw = tex.shape[0], tex.shape[1]
    tx = jnp.clip(jnp.floor(u * F32(tw)).astype(jnp.int32), 0, tw - 1)
    ty = jnp.clip(jnp.floor((F32(1.0) - v) * F32(th)).astype(jnp.int32), 0, th - 1)
    return tex[ty, tx]


def _lerp2(a, b, t):
    return a + (b - a) * t


def sample_bilinear(tex, u, v):
    th, tw = tex.shape[0], tex.shape[1]
    fx = u * F32(tw) - F32(0.5)
    fy = (F32(1.0) - v) * F32(th) - F32(0.5)
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    ax = (fx - x0f)[..., None]
    ay = (fy - y0f)[..., None]
    x0i = x0f.astype(jnp.int32)
    y0i = y0f.astype(jnp.int32)
    x0 = jnp.clip(x0i, 0, tw - 1)
    x1 = jnp.clip(x0i + 1, 0, tw - 1)
    y0 = jnp.clip(y0i, 0, th - 1)
    y1 = jnp.clip(y0i + 1, 0, th - 1)
    t00 = tex[y0, x0]
    t10 = tex[y0, x1]
    t01 = tex[y1, x0]
    t11 = tex[y1, x1]
    return _lerp2(_lerp2(t00, t10, ax), _lerp2(t01, t11, ax), ay)


def sample(tex, u, v, mode: str):
    if mode == "nearest":
        return sample_nearest(tex, u, v)
    if mode == "bilinear":
        return sample_bilinear(tex, u, v)
    raise ValueError(f"unknown sampling mode: {mode!r}")
