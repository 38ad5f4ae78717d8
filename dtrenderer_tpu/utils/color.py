"""Color pipeline: sRGB transfer, premultiplied alpha, u8 packing.

TPU-native counterpart of the reference's color utilities (SURVEY.md §2 #4:
`DTRRender_SRGB1ToLinearSpaceV4`, `DTRRender_PreMultiplyAlpha1`). All functions are
vectorized over arbitrary leading dims; formulas and op order in FORMULAS.md §"Color
pipeline" (shared with the NumPy oracle in tests/oracle.py).
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def srgb_to_linear(c):
    """sRGB [0,1] -> linear [0,1], per channel (alpha should not pass through here)."""
    c = jnp.asarray(c, F32)
    return jnp.where(
        c <= 0.04045,
        c / 12.92,
        ((c + 0.055) / 1.055) ** 2.4,
    )


def linear_to_srgb(c):
    c = jnp.asarray(c, F32)
    return jnp.where(
        c <= 0.0031308,
        c * 12.92,
        1.055 * (c ** (1.0 / 2.4)) - 0.055,
    )


def premultiply(rgba):
    """[..., 4] straight-alpha -> premultiplied."""
    return jnp.concatenate([rgba[..., :3] * rgba[..., 3:4], rgba[..., 3:4]], axis=-1)


def unpremultiply(rgba):
    a = rgba[..., 3:4]
    safe = jnp.where(a > 0, a, 1.0)
    return jnp.concatenate([rgba[..., :3] / safe, rgba[..., 3:4]], axis=-1)


def blend_over(src, dst):
    """Premultiplied source-over: out = src + dst * (1 - src_a). [..., 4]."""
    return src + dst * (1.0 - src[..., 3:4])


def decode_srgb_u8(rgba_u8):
    """u8 [..., 4] sRGB straight-alpha -> linear premultiplied f32 (texture load path)."""
    c = jnp.asarray(rgba_u8, F32) / 255.0
    lin = jnp.concatenate([srgb_to_linear(c[..., :3]), c[..., 3:4]], axis=-1)
    return premultiply(lin)


def pack_srgb_u8(rgba_f32):
    """Linear premultiplied f32 -> sRGB straight-alpha u8 (display pack path).

    round-half-away via floor(x*255 + 0.5), per FORMULAS.md.
    """
    straight = unpremultiply(rgba_f32)
    srgb = jnp.concatenate(
        [linear_to_srgb(straight[..., :3]), straight[..., 3:4]], axis=-1
    )
    return jnp.floor(jnp.clip(srgb, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def rgba(r, g, b, a=1.0):
    """Literal linear premultiplied color constructor."""
    return premultiply(jnp.array([r, g, b, a], F32))
