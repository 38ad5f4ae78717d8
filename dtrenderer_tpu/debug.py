"""Debug HUD + frame counters.

Counterpart of the reference's `DTRendererDebug` layer (SURVEY.md §2 #6: DTRDebug state,
PushText overlay lines, per-frame counters like pixels set / triangles rasterized,
frame ms display). Like the reference, the HUD is drawn WITH the framework's own text
renderer into the framebuffer (dogfooding). Counters are collected as a device-side
pytree so they can flow out of jitted frame functions.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax.numpy as jnp

from dtrenderer_tpu.assets.font import Font, bake_builtin_font, encode_text
from dtrenderer_tpu.ops.fb import Framebuffer
from dtrenderer_tpu.ops.text import draw_text, draw_text_proportional


class FrameCounters(NamedTuple):
    """Per-frame counters (device scalars; reference's DTRDebug counters analog).

    bin_overflow counts (tile, triangle) pairs dropped by bin capacity in the
    fused raster path — the reference can never drop geometry, so any nonzero
    value is a must-fix signal (raise raster_opts['capacity'])."""
    tris_submitted: jnp.ndarray
    tris_valid: jnp.ndarray
    pixels_shaded: jnp.ndarray
    bin_overflow: jnp.ndarray

    @staticmethod
    def zero() -> "FrameCounters":
        z = jnp.zeros((), jnp.int32)
        return FrameCounters(z, z, z, z)

    def merge(self, other: "FrameCounters") -> "FrameCounters":
        return FrameCounters(
            self.tris_submitted + other.tris_submitted,
            self.tris_valid + other.tris_valid,
            self.pixels_shaded + other.pixels_shaded,
            self.bin_overflow + other.bin_overflow,
        )


class DebugHud:
    """Host-side HUD state: push lines each frame, render them onto the frame.

    Mirrors DTRDebug_PushText + DTRDebug_Update (SURVEY.md §2 #6).
    """

    def __init__(self, font: Font | None = None, scale: int = 1,
                 proportional: bool = False):
        """proportional: render pushed lines with the per-glyph native TTF
        advances (ops/text.draw_text_proportional — the reference's
        stbtt-metrics text model). The default font is monospace, where
        proportional placement is identical; pass a "sans" bake
        (assets.font.bake_builtin_font(family="sans")) for truly proportional
        text. Counter lines keep monospace-friendly fixed-width layout
        either way."""
        self.font = font or bake_builtin_font(12)
        self.scale = scale
        self.proportional = proportional
        self.lines: list[str] = []
        self._last_t = time.perf_counter()
        self.frame_ms = 0.0

    def push_text(self, fmt: str, *args) -> None:
        self.lines.append(fmt % args if args else fmt)

    def end_frame_timing(self) -> None:
        now = time.perf_counter()
        self.frame_ms = (now - self._last_t) * 1000.0
        self._last_t = now

    def render(self, fb: Framebuffer, counters: FrameCounters | None = None,
               color=(1.0, 1.0, 1.0, 1.0)) -> Framebuffer:
        lines = [f"frame: {self.frame_ms:7.2f} ms"]
        if counters is not None:
            lines.append(
                f"tris: {int(counters.tris_valid)}/{int(counters.tris_submitted)}"
                f"  px: {int(counters.pixels_shaded)}"
            )
            if int(counters.bin_overflow) > 0:
                lines.append(f"!! bin overflow: {int(counters.bin_overflow)} "
                             f"dropped (raise capacity)")
        lines.extend(self.lines)
        self.lines = []
        draw = (draw_text_proportional if self.proportional
                and self.font.advances is not None else draw_text)
        y = 4
        for ln in lines:
            fb = draw(fb, self.font, encode_text(ln), (4, y), color, self.scale)
            y += self.font.cell_h * self.scale + 2
        return fb
