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


# ---------------------------------------------------------------------------
# JPEG (baseline JFIF) — stb_image parity (SURVEY.md §2 #8)
# ---------------------------------------------------------------------------

def _test_rgb(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 / max(w, 1)), (yy * 255 / max(h, 1)),
                    ((xx + yy) * 255 / (w + h))], -1)
    return np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsampling,max_diff", [
    (0, 1),   # 4:4:4 — color-convert .5-rounding only
    (1, 0),   # 4:2:2 — bit-exact (fancy h2v1 upsample matches libjpeg)
    (2, 0),   # 4:2:0 — bit-exact (full-precision h2v2 colsum path)
])
def test_jpg_decode_matches_pil(rng, tmp_path, subsampling, max_diff):
    img = _test_rgb(rng, 96, 128)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(img, "RGB").save(p, quality=92, subsampling=subsampling)
    ours = native.decode_image_file(p)
    pil = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
    d = np.abs(ours.astype(int) - pil.astype(int))
    assert d.max() <= max_diff, f"max diff {d.max()} > {max_diff}"


def test_jpg_odd_dims_matches_pil(rng, tmp_path):
    """Non-multiple-of-MCU dims exercise the right/bottom edge block padding."""
    for h, w in [(97, 131), (17, 23), (8, 8), (1, 1)]:
        img = _test_rgb(rng, h, w)
        p = str(tmp_path / "t.jpg")
        Image.fromarray(img, "RGB").save(p, quality=90, subsampling=2)
        ours = native.decode_image_file(p)
        pil = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
        assert np.array_equal(ours, pil), f"{h}x{w} mismatch"


def test_jpg_grayscale_bit_exact(rng, tmp_path):
    img = _test_rgb(rng, 40, 56)[:, :, 0]
    p = str(tmp_path / "g.jpg")
    Image.fromarray(img, "L").save(p, quality=90)
    ours = native.decode_image_file(p)
    pil = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
    assert np.array_equal(ours, pil)


@pytest.mark.parametrize("subsampling,max_diff", [(0, 1), (1, 0), (2, 0)])
def test_jpg_progressive_matches_pil(rng, tmp_path, subsampling, max_diff):
    """Progressive (SOF2) decode: spectral-selection + successive-approximation
    scans, EOB runs, refinement bits."""
    img = _test_rgb(rng, 97, 131)
    p = str(tmp_path / "p.jpg")
    Image.fromarray(img, "RGB").save(p, quality=90, progressive=True,
                                     subsampling=subsampling)
    ours = native.decode_image_file(p)
    pil = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
    d = np.abs(ours.astype(int) - pil.astype(int))
    assert d.max() <= max_diff, f"max diff {d.max()} > {max_diff}"


def _cmyk_gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.zeros((h, w, 4), np.uint8)
    arr[..., 0] = (xx * 255 / max(w - 1, 1)).astype(np.uint8)
    arr[..., 1] = (yy * 255 / max(h - 1, 1)).astype(np.uint8)
    arr[..., 2] = ((xx + yy) * 127 / max(h + w - 2, 1)).astype(np.uint8)
    arr[..., 3] = 96
    return arr


def test_jpg_cmyk_adobe_matches_pil(tmp_path):
    """4-component Adobe CMYK JPEG (APP14 transform 0, inverted samples):
    decodes to the same RGB PIL produces via CMYK;I load + convert("RGB")
    (±1: the CMYK multiply rounds .5 ties in opposite directions)."""
    for h, w in [(64, 64), (33, 41)]:
        img = _cmyk_gradient(h, w)
        p = str(tmp_path / "c.jpg")
        Image.fromarray(img, "CMYK").save(p, quality=95)
        with open(p, "rb") as f:
            assert b"Adobe" in f.read(), "PIL wrote no Adobe APP14"
        ours = native.decode_image_file(p)
        pil = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        d = np.abs(ours[..., :3].astype(int) - pil.astype(int))
        assert d.max() <= 1, f"{h}x{w}: max diff {d.max()}"
        assert (ours[..., 3] == 255).all()


def _craft_ycck_jpeg(vals):
    """Hand-assemble a minimal 8x8 single-MCU 4-component baseline JPEG with
    Adobe APP14 transform=2 (YCCK) and flat per-component sample values
    `vals` (no encoder ships anywhere in this image: PIL cannot WRITE YCCK,
    but it can read it, giving an independent decoder to cross-check ours).
    Quant table is all-8s, so a DC-only block IDCTs to exactly DC + 128."""
    out = bytearray(b"\xff\xd8")
    # APP14 "Adobe", version, flags0, flags1, transform=2
    app = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2])
    out += b"\xff\xee" + (len(app) + 2).to_bytes(2, "big") + app
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0x00]) + bytes([8] * 64)
    # SOF0: 8-bit, 8x8, 4 components, h=v=1, quant table 0
    sof = bytes([8, 0, 8, 0, 8, 4])
    for cid in range(1, 5):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT: DC table 0 = the standard luminance DC table (symbols 0..11);
    # AC table 0 = one 1-bit code '0' -> symbol 0x00 (EOB only)
    dc_counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dht = bytes([0x00]) + bytes(dc_counts) + bytes(range(12))
    dht += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    # SOS: all 4 components, DC/AC table 0
    sos = bytes([4]) + b"".join(bytes([cid, 0x00]) for cid in range(1, 5))
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    # entropy data: per component one DC-only block.
    # canonical codes for the DC table above:
    codes = {}
    code = 0
    k = 0
    syms = list(range(12))
    for ln in range(1, 17):
        for _ in range(dc_counts[ln - 1]):
            codes[syms[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    for v in vals:
        diff = int(v) - 128  # dc_pred starts at 0; quant 8 -> sample DC+128
        s = 0 if diff == 0 else max(diff, -diff).bit_length()
        c, ln = codes[s]
        put(c, ln)
        if s:
            put(diff if diff >= 0 else diff - 1 + (1 << s), s)
        put(0, 1)  # AC: EOB ('0')
    while len(bits) % 8:
        bits.append(1)  # pad with 1s
    data = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i:i + 8]:
            b = (b << 1) | bit
        data.append(b)
        if b == 0xFF:
            data.append(0x00)  # byte stuffing
    out += data + b"\xff\xd9"
    return bytes(out)


def test_jpg_ycck_adobe_matches_pil(tmp_path):
    """YCCK (Adobe APP14 transform 2): CMY channels are YCbCr-coded and must
    be converted + re-inverted before the K multiply. Cross-checked against
    PIL/libjpeg on a hand-crafted YCCK file (±2: float vs fixed-point YCC
    kernel plus the CMYK-multiply tie rounding)."""
    cases = [
        (200, 128, 128, 230),  # neutral chroma
        (180, 100, 150, 255),  # chroma + no black
        (90, 160, 80, 200),
        (128, 128, 128, 0),    # full black ink
    ]
    for vals in cases:
        data = _craft_ycck_jpeg(vals)
        p = str(tmp_path / "y.jpg")
        with open(p, "wb") as f:
            f.write(data)
        pil_img = Image.open(p)
        assert pil_img.mode == "CMYK", "craft helper did not produce Adobe 4-comp"
        pil = np.asarray(pil_img.convert("RGB"), np.uint8)
        ours = native.decode_image_file(p)
        assert ours.shape == (8, 8, 4)
        d = np.abs(ours[..., :3].astype(int) - pil.astype(int))
        assert d.max() <= 2, f"vals {vals}: max diff {d.max()}"


def test_jpg_restart_markers(rng, tmp_path):
    """DRI/RSTn handling: predictors reset and the bit reader realigns at
    every restart interval."""
    img = _test_rgb(rng, 64, 80)
    p = str(tmp_path / "r.jpg")
    try:
        Image.fromarray(img, "RGB").save(p, quality=90, subsampling=2,
                                         restart_marker_blocks=4)
    except TypeError:
        pytest.skip("PIL too old for restart_marker_blocks")
    with open(p, "rb") as f:
        data = f.read()
    assert b"\xff\xdd" in data, "encoder wrote no DRI segment"
    ours = native.decode_image_file(p)
    pil = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
    assert np.array_equal(ours, pil)


def test_jpg_via_load_bitmap_no_pil(tmp_path, rng):
    """load_bitmap('x.jpg') works through the native decoder (the round-2
    VERDICT gap: JPG silently depended on PIL)."""
    from dtrenderer_tpu.assets.image import load_bitmap

    img = _test_rgb(rng, 24, 24)
    p = str(tmp_path / "b.jpg")
    Image.fromarray(img, "RGB").save(p, quality=95, subsampling=0)
    tex = np.asarray(load_bitmap(p))
    assert tex.shape == (24, 24, 4) and tex.dtype == np.float32
    assert np.all(tex[..., 3] == 1.0)


# ---------------------------------------------------------------------------
# PNG: Adam7 interlace, 16-bit, sub-byte depths (stb_image parity)
# ---------------------------------------------------------------------------

import struct
import zlib

_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _build_png(w, h, depth, ctype, raw, plte=None, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(raw))
    return out + _png_chunk(b"IEND", b"")


def _interlaced_raw(img, depth):
    """Adam7 scanline serialization (filter 0), 8- or 16-bit samples."""
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for j in range(sub.shape[0]):
            row = sub[j].reshape(-1)
            raw += b"\x00" + (row.astype(">u2").tobytes() if depth == 16
                              else row.astype(np.uint8).tobytes())
    return raw


def test_png_adam7_rgba_matches_pil(rng):
    for h, w in [(33, 47), (8, 8), (1, 1), (3, 5)]:
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        png = _build_png(w, h, 8, 6, _interlaced_raw(img, 8), interlace=1)
        ours = native.decode_image_bytes(png)
        pil = np.asarray(Image.open(io.BytesIO(png)).convert("RGBA"))
        assert np.array_equal(ours, img) and np.array_equal(pil, img)


def test_png_16bit_rgb_high_byte(rng):
    """16-bit samples scale to 8-bit by the high byte (stb's conversion)."""
    h, w = 13, 17
    img16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + img16[j].astype(">u2").tobytes()
                   for j in range(h))
    ours = native.decode_image_bytes(_build_png(w, h, 16, 2, raw))
    truth = np.concatenate([(img16 >> 8).astype(np.uint8),
                            np.full((h, w, 1), 255, np.uint8)], -1)
    assert np.array_equal(ours, truth)


def test_png_adam7_16bit_gray(rng):
    h, w = 21, 14
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    png = _build_png(w, h, 16, 0, _interlaced_raw(g16[..., None], 16),
                     interlace=1)
    ours = native.decode_image_bytes(png)
    g8 = (g16 >> 8).astype(np.uint8)
    truth = np.stack([g8] * 3 + [np.full((h, w), 255, np.uint8)], -1)
    assert np.array_equal(ours, truth)


def test_png_4bit_palette_matches_pil(rng):
    h, w = 9, 11
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)

    def pack4(row):
        out = bytearray()
        for i in range(0, len(row), 2):
            out.append(int(row[i]) << 4
                       | (int(row[i + 1]) if i + 1 < len(row) else 0))
        return bytes(out)

    raw = b"".join(b"\x00" + pack4(idx[j]) for j in range(h))
    png = _build_png(w, h, 4, 3, raw, plte=plte.tobytes())
    ours = native.decode_image_bytes(png)
    pil = np.asarray(Image.open(io.BytesIO(png)).convert("RGBA"))
    assert np.array_equal(ours, pil)


def test_png_1bit_gray_matches_pil(rng):
    h, w = 7, 19
    g = rng.integers(0, 2, (h, w), dtype=np.uint8)

    def pack1(row):
        out = bytearray()
        for i in range(0, len(row), 8):
            b = 0
            for k, v in enumerate(row[i:i + 8]):
                b |= int(v) << (7 - k)
            out.append(b)
        return bytes(out)

    raw = b"".join(b"\x00" + pack1(g[j]) for j in range(h))
    png = _build_png(w, h, 1, 0, raw)
    ours = native.decode_image_bytes(png)
    pil = np.asarray(Image.open(io.BytesIO(png)).convert("RGBA"))
    assert np.array_equal(ours, pil)


# ---------------------------------------------------------------------------
# BMP palette/16-bit, TGA colormap/16-bit (stb_image parity)
# ---------------------------------------------------------------------------

def test_bmp_palette_8bit_matches_pil(rng, tmp_path):
    idx = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    pimg = Image.fromarray(idx, "P")
    pimg.putpalette(rng.integers(0, 256, 768, dtype=np.uint8).tolist())
    p = str(tmp_path / "p8.bmp")
    pimg.save(p)
    ours = native.decode_image_file(p)
    pil = np.asarray(Image.open(p).convert("RGBA"))
    assert np.array_equal(ours, pil)


def test_bmp_1bit_matches_pil(rng, tmp_path):
    img = Image.fromarray(
        (rng.integers(0, 256, (9, 37)) > 128).astype(np.uint8) * 255, "L"
    ).convert("1")
    p = str(tmp_path / "p1.bmp")
    img.save(p)
    ours = native.decode_image_file(p)
    pil = np.asarray(Image.open(p).convert("RGBA"))
    assert np.array_equal(ours, pil)


def test_bmp_16bit_555(rng, tmp_path):
    """Hand-built 16-bpp (5-5-5) BMP: channels expand by bit replication."""
    import struct

    h, w = 5, 7
    rgb = rng.integers(0, 32, (h, w, 3), dtype=np.uint16)
    v = (rgb[:, :, 0] << 10) | (rgb[:, :, 1] << 5) | rgb[:, :, 2]
    stride = (w * 2 + 3) & ~3
    data = b""
    for y in range(h - 1, -1, -1):
        row = v[y].astype("<u2").tobytes()
        data += row + b"\x00" * (stride - len(row))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 16, 0, len(data),
                         0, 0, 0, 0))
    p = str(tmp_path / "p16.bmp")
    with open(p, "wb") as f:
        f.write(hdr + data)
    ours = native.decode_image_file(p)
    exp = np.zeros((h, w, 4), np.uint8)
    for c in range(3):
        exp[:, :, c] = ((rgb[:, :, c] << 3) | (rgb[:, :, c] >> 2)).astype(
            np.uint8)
    exp[:, :, 3] = 255
    assert np.array_equal(ours, exp)


def test_tga_colormapped_matches_pil(rng, tmp_path):
    import struct

    h, w = 6, 9
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 16, 24, 0, 0, w, h, 8,
                      0x20)
    p = str(tmp_path / "cm.tga")
    with open(p, "wb") as f:
        f.write(hdr + pal[:, ::-1].tobytes() + idx.tobytes())
    ours = native.decode_image_file(p)
    exp = np.concatenate([pal[idx], np.full((h, w, 1), 255, np.uint8)], -1)
    pil = np.asarray(Image.open(p).convert("RGBA"))
    assert np.array_equal(ours, exp) and np.array_equal(pil, exp)


def test_tga_16bit_555(rng, tmp_path):
    import struct

    h, w = 6, 9
    v16 = rng.integers(0, 2 ** 15, (h, w), dtype=np.uint16)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 16,
                      0x20)
    p = str(tmp_path / "t16.tga")
    with open(p, "wb") as f:
        f.write(hdr + v16.astype("<u2").tobytes())
    ours = native.decode_image_file(p)

    def e5(f):
        return ((f << 3) | (f >> 2)).astype(np.uint8)

    exp = np.stack([e5((v16 >> 10) & 31), e5((v16 >> 5) & 31), e5(v16 & 31),
                    np.full((h, w), 255, np.uint8)], -1)
    assert np.array_equal(ours, exp)


# ---------------------------------------------------------------------------
# Malformed-input robustness (round-3 review findings: attacker-controlled
# asset files must produce clean errors, never OOB reads / garbage decode)
# ---------------------------------------------------------------------------

def test_tga_empty_colormap_rejected():
    import struct

    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 0, 24, 0, 0, 4, 4, 8, 0x20)
    with pytest.raises(IOError, match="colormap"):
        native.decode_image_bytes(hdr + b"\x00" * 16)


def test_jpg_truncated_dqt_rejected():
    jpg = b"\xff\xd8" + b"\xff\xdb\x00\x03\x00" + b"\xff\xd9"
    with pytest.raises(IOError, match="DQT"):
        native.decode_image_bytes(jpg)


def test_jpg_missing_quant_table_rejected(rng, tmp_path):
    """A JPEG whose DQT segment is stripped must error, not dequantize with
    uninitialized tables."""
    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8), "RGB").save(buf, "JPEG")
    data = bytearray(buf.getvalue())
    i = bytes(data).find(b"\xff\xdb")
    ln = (data[i + 2] << 8) | data[i + 3]
    del data[i:i + 2 + ln]
    with pytest.raises(IOError, match="quant"):
        native.decode_image_bytes(bytes(data))


def test_jpg_fill_bytes_before_marker_ok():
    """0xFF fill bytes before a marker are legal (T.81 B.1.1.2)."""
    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), 90, np.uint8), "RGB").save(buf, "JPEG")
    d = buf.getvalue()
    assert d.endswith(b"\xff\xd9")
    out = native.decode_image_bytes(d[:-2] + b"\xff\xff\xd9")
    assert out.shape == (8, 8, 4)


def test_bmp_32bpp_bitfields_honored():
    """BI_BITFIELDS masks apply at 32 bpp too (RGBA-order masks must not
    decode as BGRA)."""
    import struct

    h, w = 2, 3
    px = np.arange(h * w * 4, dtype=np.uint8).reshape(h, w, 4)
    rows = b"".join(px[y].tobytes() for y in range(h - 1, -1, -1))
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 12 + len(rows), 0, 0,
                              14 + 40 + 12)
    info = struct.pack("<IiiHHIIiiII", 52, w, h, 1, 32, 3, len(rows),
                       0, 0, 0, 0)
    masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    out = native.decode_image_bytes(hdr + info + masks + rows)
    assert np.array_equal(out[:, :, 0], px[:, :, 0])  # R from the LOW byte
    assert np.array_equal(out[:, :, 2], px[:, :, 2])
