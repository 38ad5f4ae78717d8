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


def _png_with_zlib_level(img, level):
    """Hand-assemble a PNG whose IDAT uses a specific zlib compression level
    (level 0 -> STORED deflate blocks), exercising every block type of the
    from-scratch inflate (native/dtr_native.cpp dtr_inflate)."""
    import struct
    import zlib

    h, w = img.shape[:2]

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, level)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_png_inflate_all_block_types(rng, level):
    """STORED (level 0), fast fixed/dynamic (1), and max dynamic-Huffman
    streams (9) all round-trip through the from-scratch inflate."""
    img = _rand_rgba(rng, 45, 73)
    # a patterned region compresses with matches; random region stresses
    # literal-heavy codes
    img[10:30, 10:50] = 77
    got = native.decode_image_bytes(_png_with_zlib_level(img, level))
    assert np.array_equal(got, img)


def test_png_inflate_corrupt_stream_raises(rng):
    img = _rand_rgba(rng, 12, 12)
    data = bytearray(_png_with_zlib_level(img, 6))
    data[-30] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(Exception):
        native.decode_image_bytes(bytes(data))


def test_png_inflate_large_multiblock(rng):
    """> 64 KB of raw data forces multiple deflate blocks at level 0."""
    img = _rand_rgba(rng, 150, 160)  # 96 KB raw -> >1 stored block
    got = native.decode_image_bytes(_png_with_zlib_level(img, 0))
    assert np.array_equal(got, img)
