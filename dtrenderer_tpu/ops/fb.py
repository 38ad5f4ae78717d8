"""Framebuffer: a device-resident pytree {color, depth}.

TPU-native counterpart of the reference's `PlatformRenderBuffer` + z-buffer
(SURVEY.md §2 #2/#4): instead of a Win32 DIB byte buffer written pixel-by-pixel, the
framebuffer is a pair of jnp arrays that every draw op consumes and returns functionally
(XLA turns the chain into in-place updates under jit).

color: f32[H, W, 4], linear-light premultiplied RGBA.
depth: f32[H, W], viewport depth in [0,1], +inf = empty.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dtrenderer_tpu.utils import color as colorlib


class Framebuffer(NamedTuple):
    color: jnp.ndarray  # f32 [H, W, 4]
    depth: jnp.ndarray  # f32 [H, W]

    @property
    def height(self) -> int:
        return self.color.shape[0]

    @property
    def width(self) -> int:
        return self.color.shape[1]


def create(height: int, width: int) -> Framebuffer:
    return Framebuffer(
        color=jnp.zeros((height, width, 4), jnp.float32),
        depth=jnp.full((height, width), jnp.inf, jnp.float32),
    )


def clear(framebuffer: Framebuffer, clear_color=None) -> Framebuffer:
    """DTRRender_Clear equivalent: fill color, reset depth to +inf."""
    h, w = framebuffer.depth.shape
    if clear_color is None:
        col = jnp.zeros((h, w, 4), jnp.float32)
    else:
        col = jnp.broadcast_to(jnp.asarray(clear_color, jnp.float32), (h, w, 4))
    return Framebuffer(color=col, depth=jnp.full((h, w), jnp.inf, jnp.float32))


def pack(framebuffer: Framebuffer) -> jnp.ndarray:
    """Linear premultiplied f32 -> display sRGB u8 [H, W, 4] (blit-to-screen analog)."""
    return colorlib.pack_srgb_u8(framebuffer.color)
