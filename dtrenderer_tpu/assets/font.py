"""Font atlas baking (host-side asset prep).

Counterpart of the reference's `DTRAsset_LoadFontToBitmap` (SURVEY.md §2 #5: bake TTF
glyph atlas via stb_truetype into a DTRFont {bitmap, glyph metrics}). Here the atlas is
a monospace ASCII grid (16 cols x 6 rows covering codes 32..126) baked host-side once
and uploaded as a coverage (alpha) texture; the device-side text op (ops/text.py)
renders strings as pure gathers from the atlas with no per-glyph host loop.

Baking prefers the from-scratch native TTF rasterizer (native/dtr_font.cpp — cmap,
glyf + composites, AA scanline fill; the stb_truetype counterpart, see
bake_builtin_font below), falling back to PIL with a real TTF (DejaVu Sans Mono via
matplotlib's bundled fonts) and finally to PIL's built-in bitmap font when
neither is available.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

FIRST_CHAR = 32
LAST_CHAR = 126
GRID_COLS = 16
GRID_ROWS = 6  # 95 glyphs -> 6 rows of 16


class Font(NamedTuple):
    atlas: jnp.ndarray  # f32 [GRID_ROWS*cell_h, GRID_COLS*cell_w] glyph coverage
    cell_w: int
    cell_h: int
    advances: jnp.ndarray | None = None  # f32 [95] per-glyph advance (px), or None


def _find_ttf(family: str = "DejaVu Sans Mono",
              generic: str = "monospace") -> str | None:
    try:
        import matplotlib.font_manager as fm

        candidates = [
            f.fname
            for f in fm.fontManager.ttflist
            if f.name == family and f.fname.endswith(".ttf")
        ]
        # prefer the regular face over Bold/Oblique variants
        regular = [c for c in candidates
                   if "Oblique" not in c and "Bold" not in c]
        if regular:
            return regular[0]
        if candidates:
            return candidates[0]
        return fm.findfont(generic)
    except Exception:
        return None


def _find_mono_ttf() -> str | None:
    return _find_ttf()


@functools.lru_cache(maxsize=8)
def bake_builtin_font(size: int = 14, prefer_native: bool = True,
                      family: str = "mono") -> Font:
    """Bake the default glyph atlas at the given pixel size.

    family "mono" (default) bakes DejaVu Sans Mono; "sans" bakes the
    PROPORTIONAL DejaVu Sans — per-glyph advances from the native TTF
    metrics drive ops/text.draw_text_proportional (the reference's
    stbtt-baked quads are proportional, SURVEY.md §2 #5 DTRFont metrics).
    The atlas grid stays uniform cells (cell_w = max glyph width); only the
    ADVANCES differ, which is exactly the stbtt bake model.

    Prefers the from-scratch native TTF rasterizer (native/dtr_font.cpp, the
    stb_truetype-role component); falls back to PIL baking when the native
    library or a TTF file is unavailable.
    """
    names = {"mono": ("DejaVu Sans Mono", "monospace"),
             "sans": ("DejaVu Sans", "sans-serif")}[family]
    ttf_path = _find_ttf(*names)
    if prefer_native and ttf_path and ttf_path.endswith(".ttf"):
        try:
            from dtrenderer_tpu.assets import native

            if native.available():
                atlas_u8, cw, ch, metrics, _ascent = native.bake_font_file(
                    ttf_path, float(size), FIRST_CHAR,
                    LAST_CHAR - FIRST_CHAR + 1, GRID_COLS,
                )
                atlas = atlas_u8.astype(np.float32) / np.float32(255.0)
                return Font(atlas=jnp.asarray(atlas), cell_w=cw, cell_h=ch,
                            advances=jnp.asarray(metrics[:, 0], jnp.float32))
        except Exception:
            pass  # fall through to PIL baking
    return _bake_with_pil(size, ttf_path)


def _bake_with_pil(size: int, ttf: str | None = None) -> Font:
    from PIL import Image, ImageDraw, ImageFont

    if ttf is None:
        ttf = _find_mono_ttf()
    if ttf is not None:
        try:
            pil_font = ImageFont.truetype(ttf, size)
        except Exception:
            pil_font = ImageFont.load_default()
    else:
        pil_font = ImageFont.load_default()

    # Measure the widest glyph cell.
    probe = Image.new("L", (4 * size, 4 * size), 0)
    d = ImageDraw.Draw(probe)
    max_w, max_h = 1, 1
    ascent = 0
    try:
        ascent, descent = pil_font.getmetrics()
        max_h = ascent + descent
    except Exception:
        pass
    for code in range(FIRST_CHAR, LAST_CHAR + 1):
        bbox = d.textbbox((0, 0), chr(code), font=pil_font)
        max_w = max(max_w, bbox[2])
        max_h = max(max_h, bbox[3])
    cell_w, cell_h = int(max_w), int(max_h)

    img = Image.new("L", (GRID_COLS * cell_w, GRID_ROWS * cell_h), 0)
    d = ImageDraw.Draw(img)
    for code in range(FIRST_CHAR, LAST_CHAR + 1):
        idx = code - FIRST_CHAR
        cx = (idx % GRID_COLS) * cell_w
        cy = (idx // GRID_COLS) * cell_h
        d.text((cx, cy), chr(code), fill=255, font=pil_font)

    atlas = np.asarray(img, np.float32) / np.float32(255.0)
    try:
        advances = np.array(
            [pil_font.getlength(chr(c)) for c in range(FIRST_CHAR, LAST_CHAR + 1)],
            np.float32,
        )
    except Exception:
        advances = np.full(LAST_CHAR - FIRST_CHAR + 1, float(cell_w), np.float32)
    return Font(atlas=jnp.asarray(atlas), cell_w=cell_w, cell_h=cell_h,
                advances=jnp.asarray(advances))


def encode_text(s: str) -> np.ndarray:
    """String -> i32 glyph codes (unknown chars -> space)."""
    codes = np.frombuffer(s.encode("ascii", errors="replace"), dtype=np.uint8)
    codes = np.where((codes < FIRST_CHAR) | (codes > LAST_CHAR), FIRST_CHAR, codes)
    return codes.astype(np.int32)
