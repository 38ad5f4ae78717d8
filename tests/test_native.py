"""Native C++ asset library tests: OBJ parser parity with the Python parser, and
image decoders cross-checked against PIL (an independent implementation)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from dtrenderer_tpu.assets import native, obj

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdtr_native.so not built"
)


OBJ_SRC = """
# fixture
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0.5 0.5 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f -5 -4 -1
f 1//1 2//1 5//1
"""


def test_obj_native_matches_python(tmp_path):
    p = tmp_path / "fixture.obj"
    p.write_text(OBJ_SRC)
    py = obj.parse_obj_text(OBJ_SRC)
    nat = native.parse_obj_file(str(p))
    for a, b, name in zip(py, nat, ["pos", "uv", "nrm", "pi", "ti", "ni"]):
        if a is None or b is None:
            # python returns None only when NO face uses vt/vn at all; fixture uses both
            assert (a is None) == (b is None), name
            continue
        assert np.allclose(np.asarray(a, np.float64), np.asarray(b, np.float64)), name


def test_obj_native_mesh_roundtrip(tmp_path):
    p = tmp_path / "fixture.obj"
    p.write_text(OBJ_SRC)
    mesh_native = obj.load_obj(str(p), prefer_native=True)
    mesh_py = obj.load_obj(str(p), prefer_native=False)
    assert np.allclose(np.asarray(mesh_native.verts), np.asarray(mesh_py.verts))
    assert np.array_equal(np.asarray(mesh_native.faces), np.asarray(mesh_py.faces))


def _rand_rgba(rng, h, w):
    return rng.integers(0, 256, (h, w, 4), dtype=np.uint8)


def test_png_decode_matches_pil(rng, tmp_path):
    img = _rand_rgba(rng, 37, 61)
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    got = native.decode_image_bytes(buf.getvalue())
    assert np.array_equal(got, img)


def test_png_rgb_and_gray(rng):
    rgb = _rand_rgba(rng, 20, 33)[:, :, :3]
    buf = io.BytesIO()
    Image.fromarray(rgb, "RGB").save(buf, "PNG")
    got = native.decode_image_bytes(buf.getvalue())
    assert np.array_equal(got[..., :3], rgb) and (got[..., 3] == 255).all()

    gray = _rand_rgba(rng, 20, 33)[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "PNG")
    got = native.decode_image_bytes(buf.getvalue())
    assert np.array_equal(got[..., 0], gray)
    assert np.array_equal(got[..., 1], gray)


def test_png_palette(rng):
    img = Image.fromarray(_rand_rgba(rng, 16, 16)[:, :, :3], "RGB").quantize(64)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    got = native.decode_image_bytes(buf.getvalue())
    want = np.asarray(img.convert("RGBA"), np.uint8)
    assert np.array_equal(got, want)


def test_bmp_decode_matches_pil(rng):
    img = _rand_rgba(rng, 23, 41)[:, :, :3]
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, "BMP")
    got = native.decode_image_bytes(buf.getvalue())
    assert np.array_equal(got[..., :3], img) and (got[..., 3] == 255).all()


def test_tga_decode_matches_pil(rng):
    img = _rand_rgba(rng, 19, 27)
    for rle in (False, True):
        buf = io.BytesIO()
        Image.fromarray(img, "RGBA").save(buf, "TGA", rle=rle)
        got = native.decode_image_bytes(buf.getvalue())
        assert np.array_equal(got, img), f"rle={rle}"


def test_bad_image_raises():
    with pytest.raises(IOError):
        native.decode_image_bytes(b"\x89PNG\r\n\x1a\nnot a real png")


def test_load_bitmap_premultiplied(tmp_path, rng):
    img = _rand_rgba(rng, 8, 8)
    p = tmp_path / "t.png"
    Image.fromarray(img, "RGBA").save(p)
    from dtrenderer_tpu.assets.image import load_bitmap

    tex = np.asarray(load_bitmap(str(p)))
    assert tex.shape == (8, 8, 4) and tex.dtype == np.float32
    # premultiplied: rgb <= alpha (in linear space alpha unchanged)
    assert (tex[..., :3] <= tex[..., 3:4] + 1e-6).all()
