"""Native TTF rasterizer tests (native/dtr_font.cpp — the stb_truetype-role
component, written from scratch): structural glyph checks + loose shape agreement
with PIL/FreeType as an independent renderer."""

import numpy as np
import pytest

from dtrenderer_tpu.assets import native
from dtrenderer_tpu.assets.font import _find_mono_ttf

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdtr_native.so not built"
)


@pytest.fixture(scope="module")
def baked():
    ttf = _find_mono_ttf()
    if not (ttf and ttf.endswith(".ttf")):
        pytest.skip("no TTF available")
    atlas, cw, ch, metrics, ascent = native.bake_font_file(ttf, 16.0)
    return ttf, atlas, cw, ch, metrics, ascent


def _cell(atlas, cw, ch, char):
    idx = ord(char) - 32
    r, c = idx // 16, idx % 16
    return atlas[r * ch:(r + 1) * ch, c * cw:(c + 1) * cw]


def test_atlas_shape_and_metrics(baked):
    _, atlas, cw, ch, metrics, ascent = baked
    assert atlas.shape == (6 * ch, 16 * cw)
    assert 0 < ascent <= ch
    assert metrics.shape == (95, 4)
    assert (metrics[:, 0] > 0).all()  # positive advances


def test_glyph_structure(baked):
    _, atlas, cw, ch, _, _ = baked
    assert _cell(atlas, cw, ch, " ").max() == 0, "space must be empty"
    for c in "AgMm0!#":
        cell = _cell(atlas, cw, ch, c)
        assert (cell > 64).sum() > 8, f"glyph {c!r} nearly empty"
    # '.' small but present, and smaller than 'M'
    dot = (_cell(atlas, cw, ch, ".") > 64).sum()
    em = (_cell(atlas, cw, ch, "M") > 64).sum()
    assert 0 < dot < em


def test_antialiasing_present(baked):
    # An AA rasterizer produces intermediate coverage on curved glyphs like 'o'.
    _, atlas, cw, ch, _, _ = baked
    cell = _cell(atlas, cw, ch, "o")
    mid = ((cell > 32) & (cell < 224)).sum()
    assert mid > 4, "no intermediate coverage — AA missing?"


def test_shapes_agree_with_pil(baked):
    # Independent renderer cross-check: binarized glyph masks should mostly
    # agree (hinting differences allowed; require IoU > 0.5 on big glyphs).
    ttf, atlas, cw, ch, _, ascent = baked
    from PIL import Image, ImageDraw, ImageFont

    pf = ImageFont.truetype(ttf, 16)
    pil_ascent, _ = pf.getmetrics()
    for c in "HBELM#":
        ours = _cell(atlas, cw, ch, c) > 96
        img = Image.new("L", (cw + 8, ch + 8), 0)
        d = ImageDraw.Draw(img)
        # align baselines: our glyphs sit with baseline at `ascent`
        d.text((0, round(ascent) - pil_ascent), c, fill=255, font=pf)
        theirs = np.asarray(img, np.uint8)[: ch, : cw] > 96
        inter = (ours & theirs).sum()
        union = (ours | theirs).sum()
        iou = inter / max(union, 1)
        assert iou > 0.5, f"glyph {c!r} IoU {iou:.2f} vs PIL"


def test_corrupt_ttf_returns_error_not_crash(tmp_path, baked):
    """A corrupt/truncated TTF must surface an error field, never crash."""
    ttf = baked[0]
    raw = open(ttf, "rb").read()

    bad = tmp_path / "bad.ttf"
    # truncated file
    bad.write_bytes(raw[:256])
    with pytest.raises(IOError):
        native.bake_font_file(str(bad), 16.0)
    # garbage bytes
    bad.write_bytes(b"\x00\xff" * 4096)
    with pytest.raises(IOError):
        native.bake_font_file(str(bad), 16.0)
    # absurd bake parameters must be rejected, not allocated
    with pytest.raises(IOError):
        native.bake_font_file(ttf, 1e9)
    with pytest.raises(IOError):
        native.bake_font_file(ttf, 16.0, num_chars=10**6)
