"""Device-side text rendering from a baked monospace atlas.

Counterpart of the reference's `DTRRender_Text` (SURVEY.md §2 #4: font-atlas quads).
Instead of blitting one quad per glyph, the whole string renders in ONE masked gather
pass: each framebuffer pixel computes which character column it falls in, looks up the
glyph code (a dynamic i32 array — HUD text can change without retracing), and gathers
its coverage texel from the atlas. Alpha-blends like all 2D ops (color only).
"""

from __future__ import annotations

import jax.numpy as jnp

from dtrenderer_tpu.assets.font import FIRST_CHAR, GRID_COLS, Font
from dtrenderer_tpu.ops.fb import Framebuffer
from dtrenderer_tpu.utils.color import blend_over

F32 = jnp.float32


def draw_text(fb: Framebuffer, font: Font, codes, pos, color=(1, 1, 1, 1), scale=1):
    """codes: i32 [L] glyph codes (assets.font.encode_text); pos: top-left (x, y)."""
    codes = jnp.asarray(codes, jnp.int32)
    n = codes.shape[0]
    if n == 0:
        return fb
    h, w = fb.depth.shape
    cw, ch = font.cell_w, font.cell_h
    scale = int(scale)
    x0, y0 = pos

    ix = jnp.arange(w, dtype=jnp.int32)[None, :]
    iy = jnp.arange(h, dtype=jnp.int32)[:, None]
    # Local glyph-grid coords (integer; scale by pixel replication).
    lx = (ix - jnp.asarray(int(x0), jnp.int32)) // scale
    ly = (iy - jnp.asarray(int(y0), jnp.int32)) // scale
    col = lx // cw
    inside = (lx >= 0) & (col < n) & (ly >= 0) & (ly < ch)

    code = codes[jnp.clip(col, 0, n - 1)] - FIRST_CHAR
    cell_r = code // GRID_COLS
    cell_c = code % GRID_COLS
    ax = jnp.clip(cell_c * cw + (lx - col * cw), 0, font.atlas.shape[1] - 1)
    ay = jnp.clip(cell_r * ch + ly, 0, font.atlas.shape[0] - 1)
    ay = jnp.broadcast_to(ay, (h, w))
    ax = jnp.broadcast_to(ax, (h, w))
    coverage = font.atlas[ay, ax]  # [H, W]

    src = jnp.asarray(color, F32) * coverage[..., None]
    src = jnp.where(inside[..., None], src, jnp.zeros((4,), F32))
    blended = blend_over(src, fb.color)
    new_color = jnp.where(inside[..., None], blended, fb.color)
    return Framebuffer(color=new_color, depth=fb.depth)


def text_width(font: Font, n_chars: int, scale: int = 1) -> int:
    return n_chars * font.cell_w * int(scale)
