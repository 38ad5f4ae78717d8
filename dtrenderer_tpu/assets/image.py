"""Bitmap loading: decode (native C++) + color-pipeline prep (device).

Counterpart of the reference's `DTRAsset_LoadBitmap` (SURVEY.md §2 #5: decode via
stb_image to 32-bit pixels, premultiply alpha). Decoding runs in the dtr_native C++
library (BMP/TGA/PNG from scratch); the sRGB->linear + premultiply conversion is the
device-side color pipeline (utils/color.py) so textures land on the TPU ready to
sample.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu.utils.color import decode_srgb_u8


def load_bitmap(path: str, premultiply_linear: bool = True):
    """Load an image file -> texture.

    Returns premultiplied linear f32 [H, W, 4] (ready for sampling.sample) by
    default, or the raw RGBA u8 array when premultiply_linear=False.
    """
    from dtrenderer_tpu.assets import native

    if native.available():
        rgba = native.decode_image_file(path)
    else:  # pure-Python fallback via PIL (test environments)
        from PIL import Image

        rgba = np.asarray(Image.open(path).convert("RGBA"), np.uint8)
    if not premultiply_linear:
        return rgba
    return decode_srgb_u8(jnp.asarray(rgba))


def decode_bytes(data: bytes, premultiply_linear: bool = True):
    from dtrenderer_tpu.assets import native

    rgba = native.decode_image_bytes(data)
    if not premultiply_linear:
        return rgba
    return decode_srgb_u8(jnp.asarray(rgba))
