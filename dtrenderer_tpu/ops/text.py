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


def draw_text_proportional(fb: Framebuffer, font: Font, codes, pos,
                           color=(1, 1, 1, 1), scale=1):
    """Proportional text using per-glyph advances (native TTF metrics).

    Each pixel finds its glyph by a vectorized searchsorted over the cumulative
    advance boundaries — still a single gather pass, still retrace-free for
    changing text of the same length.
    """
    if font.advances is None:
        return draw_text(fb, font, codes, pos, color, scale)
    codes = jnp.asarray(codes, jnp.int32)
    n = codes.shape[0]
    if n == 0:
        return fb
    h, w = fb.depth.shape
    cw, ch = font.cell_w, font.cell_h
    scale = int(scale)
    x0, y0 = pos

    adv = font.advances[jnp.clip(codes - FIRST_CHAR, 0, 94)]  # [L]
    bounds = jnp.concatenate([jnp.zeros((1,), F32), jnp.cumsum(adv)])  # [L+1]

    ix = jnp.arange(w, dtype=jnp.int32)[None, :]
    iy = jnp.arange(h, dtype=jnp.int32)[:, None]
    lx = (ix - jnp.asarray(int(x0), jnp.int32)).astype(F32) / F32(scale)
    ly = (iy - jnp.asarray(int(y0), jnp.int32)) // scale
    col = jnp.clip(
        jnp.searchsorted(bounds, lx[0], side="right") - 1, 0, n - 1
    )[None, :]
    gx = (lx - bounds[col]).astype(jnp.int32)
    inside = (
        (lx >= 0) & (lx < bounds[n]) & (gx >= 0) & (gx < cw)
        & (ly >= 0) & (ly < ch)
    )

    code = codes[col[0]][None, :] - FIRST_CHAR
    cell_r = code // GRID_COLS
    cell_c = code % GRID_COLS
    ax = jnp.clip(cell_c * cw + gx, 0, font.atlas.shape[1] - 1)
    ay = jnp.clip(cell_r * ch + ly, 0, font.atlas.shape[0] - 1)
    coverage = font.atlas[jnp.broadcast_to(ay, (h, w)),
                          jnp.broadcast_to(ax, (h, w))]

    src = jnp.asarray(color, F32) * coverage[..., None]
    src = jnp.where(inside[..., None], src, jnp.zeros((4,), F32))
    blended = blend_over(src, fb.color)
    new_color = jnp.where(inside[..., None], blended, fb.color)
    return Framebuffer(color=new_color, depth=fb.depth)


def text_width(font: Font, n_chars_or_codes, scale: int = 1):
    """Width in px: monospace count, or exact proportional width for codes."""
    import numpy as np

    if isinstance(n_chars_or_codes, int):
        return n_chars_or_codes * font.cell_w * int(scale)
    codes = np.asarray(n_chars_or_codes)
    if font.advances is None:
        return len(codes) * font.cell_w * int(scale)
    adv = np.asarray(font.advances)[np.clip(codes - FIRST_CHAR, 0, 94)]
    return float(adv.sum()) * int(scale)
