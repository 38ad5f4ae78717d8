// dtr_native: native asset pipeline for dtrenderer_tpu.
//
// Native counterpart of the reference's C/C++ asset path (SURVEY.md §2 #5, #8:
// hand-written Wavefront OBJ text parser and stb_image-based bitmap decoding).
// Implemented from scratch: OBJ tokenizer/parser, BMP (24/32 uncompressed),
// TGA (types 2/3/10, incl. RLE), PNG (non-interlaced, 8-bit depth, all color
// types), and the DEFLATE/zlib inflate underneath it (RFC 1950/1951: stored +
// fixed-Huffman + dynamic-Huffman blocks, adler32-verified — no zlib
// dependency). Exposed through a plain C ABI consumed with ctypes
// (assets/native.py) — no pybind dependency.
//
// Build: make -C native   ->  native/libdtr_native.so

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parsing
// ---------------------------------------------------------------------------

struct DtrObjData {
  float* positions;  // [n_positions * 3]
  float* uvs;        // [n_uvs * 2]
  float* normals;    // [n_normals * 3]
  int64_t* pos_idx;  // [n_tris * 3], 0-based
  int64_t* uv_idx;   // [n_tris * 3], -1 if absent
  int64_t* n_idx;    // [n_tris * 3], -1 if absent
  int64_t n_positions, n_uvs, n_normals, n_tris;
  int32_t has_uv, has_n;
  char error[256];
};

static const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
  return p;
}

static const char* skip_line(const char* p, const char* end) {
  while (p < end && *p != '\n') p++;
  return p < end ? p + 1 : end;
}

// strtof-based float scan (locale-independent enough for OBJ content).
static const char* parse_float(const char* p, const char* end, float* out) {
  char* q = nullptr;
  *out = strtof(p, &q);
  return (q && q <= end) ? q : p;
}

static const char* parse_int(const char* p, const char* end, long* out) {
  char* q = nullptr;
  *out = strtol(p, &q, 10);
  return (q && q <= end) ? q : p;
}

struct Corner {
  long v, vt, vn;
};

DtrObjData* dtr_obj_parse(const char* text, int64_t len) {
  auto* d = (DtrObjData*)calloc(1, sizeof(DtrObjData));
  std::vector<float> pos, uv, nrm;
  std::vector<int64_t> pi, ti, ni;
  bool any_uv = false, any_n = false;

  const char* p = text;
  const char* end = text + len;
  std::vector<Corner> corners;
  corners.reserve(8);

  while (p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (*p == '#' || *p == '\n') {
      p = skip_line(p, end);
      continue;
    }
    if (p[0] == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      p = parse_float(p + 1, end, &x);
      p = parse_float(p, end, &y);
      p = parse_float(p, end, &z);
      pos.push_back(x);
      pos.push_back(y);
      pos.push_back(z);
      p = skip_line(p, end);
    } else if (p[0] == 'v' && p + 2 < end && p[1] == 't' &&
               (p[2] == ' ' || p[2] == '\t')) {
      float u = 0, v = 0;
      p = parse_float(p + 2, end, &u);
      const char* q = skip_ws(p, end);
      if (q < end && *q != '\n') p = parse_float(p, end, &v);
      uv.push_back(u);
      uv.push_back(v);
      p = skip_line(p, end);
    } else if (p[0] == 'v' && p + 2 < end && p[1] == 'n' &&
               (p[2] == ' ' || p[2] == '\t')) {
      float x = 0, y = 0, z = 0;
      p = parse_float(p + 2, end, &x);
      p = parse_float(p, end, &y);
      p = parse_float(p, end, &z);
      nrm.push_back(x);
      nrm.push_back(y);
      nrm.push_back(z);
      p = skip_line(p, end);
    } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      p++;
      corners.clear();
      while (true) {
        p = skip_ws(p, end);
        if (p >= end || *p == '\n' || *p == '#') break;
        Corner c{0, 0, 0};
        long val = 0;
        p = parse_int(p, end, &val);
        c.v = val;
        if (p < end && *p == '/') {
          p++;
          if (p < end && *p != '/') {
            p = parse_int(p, end, &val);
            c.vt = val;
          }
          if (p < end && *p == '/') {
            p++;
            p = parse_int(p, end, &val);
            c.vn = val;
          }
        }
        corners.push_back(c);
      }
      long nv = (long)(pos.size() / 3), nt = (long)(uv.size() / 2),
           nn = (long)(nrm.size() / 3);
      auto res = [&](long i, long n) -> int64_t {
        return i > 0 ? i - 1 : (i < 0 ? n + i : -1);
      };
      for (size_t k = 1; k + 1 < corners.size(); k++) {  // fan triangulation
        const Corner tri[3] = {corners[0], corners[k], corners[k + 1]};
        for (int j = 0; j < 3; j++) {
          pi.push_back(res(tri[j].v, nv));
          int64_t t = tri[j].vt ? res(tri[j].vt, nt) : -1;
          int64_t n = tri[j].vn ? res(tri[j].vn, nn) : -1;
          ti.push_back(t);
          ni.push_back(n);
          if (t >= 0) any_uv = true;
          if (n >= 0) any_n = true;
        }
      }
      p = skip_line(p, end);
    } else {
      p = skip_line(p, end);  // o/g/s/usemtl/mtllib/l ... ignored
    }
  }

  auto dup = [](const void* src, size_t bytes) {
    void* m = malloc(bytes ? bytes : 1);
    memcpy(m, src, bytes);
    return m;
  };
  d->n_positions = (int64_t)(pos.size() / 3);
  d->n_uvs = (int64_t)(uv.size() / 2);
  d->n_normals = (int64_t)(nrm.size() / 3);
  d->n_tris = (int64_t)(pi.size() / 3);
  d->positions = (float*)dup(pos.data(), pos.size() * sizeof(float));
  d->uvs = (float*)dup(uv.data(), uv.size() * sizeof(float));
  d->normals = (float*)dup(nrm.data(), nrm.size() * sizeof(float));
  d->pos_idx = (int64_t*)dup(pi.data(), pi.size() * sizeof(int64_t));
  d->uv_idx = (int64_t*)dup(ti.data(), ti.size() * sizeof(int64_t));
  d->n_idx = (int64_t*)dup(ni.data(), ni.size() * sizeof(int64_t));
  d->has_uv = any_uv;
  d->has_n = any_n;
  return d;
}

DtrObjData* dtr_obj_parse_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    auto* d = (DtrObjData*)calloc(1, sizeof(DtrObjData));
    snprintf(d->error, sizeof(d->error), "cannot open %s", path);
    return d;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc(sz + 1);
  size_t rd = fread(buf, 1, sz, f);
  fclose(f);
  buf[rd] = 0;
  DtrObjData* d = dtr_obj_parse(buf, (int64_t)rd);
  free(buf);
  return d;
}

void dtr_obj_free(DtrObjData* d) {
  if (!d) return;
  free(d->positions);
  free(d->uvs);
  free(d->normals);
  free(d->pos_idx);
  free(d->uv_idx);
  free(d->n_idx);
  free(d);
}

// ---------------------------------------------------------------------------
// Image decoding -> RGBA8
// ---------------------------------------------------------------------------

struct DtrImage {
  uint8_t* pixels;  // RGBA8, row-major, top-down
  int32_t width, height;
  char error[256];
};

static DtrImage* img_err(DtrImage* im, const char* msg) {
  snprintf(im->error, sizeof(im->error), "%s", msg);
  return im;
}

// ---- BMP (uncompressed 24/32-bit) ----
static void decode_bmp(const uint8_t* d, int64_t n, DtrImage* im) {
  if (n < 54) { img_err(im, "bmp: truncated header"); return; }
  uint32_t off = *(const uint32_t*)(d + 10);
  uint32_t hsz = *(const uint32_t*)(d + 14);
  int32_t w = *(const int32_t*)(d + 18);
  int32_t h = *(const int32_t*)(d + 22);
  uint16_t bpp = *(const uint16_t*)(d + 28);
  uint32_t comp = *(const uint32_t*)(d + 30);
  if (hsz < 40) { img_err(im, "bmp: unsupported header"); return; }
  if (comp != 0 && comp != 3) { img_err(im, "bmp: compressed not supported"); return; }
  if (bpp != 24 && bpp != 32) { img_err(im, "bmp: only 24/32 bpp"); return; }
  bool flip = h > 0;
  int32_t ah = h < 0 ? -h : h;
  if (w <= 0 || ah <= 0 || w > 1 << 16 || ah > 1 << 16) {
    img_err(im, "bmp: bad dims");
    return;
  }
  int64_t stride = ((int64_t)w * (bpp / 8) + 3) & ~3;
  if ((int64_t)off + stride * ah > n) { img_err(im, "bmp: truncated data"); return; }
  im->width = w;
  im->height = ah;
  im->pixels = (uint8_t*)malloc((size_t)w * ah * 4);
  for (int32_t y = 0; y < ah; y++) {
    const uint8_t* row = d + off + stride * (flip ? (ah - 1 - y) : y);
    uint8_t* out = im->pixels + (size_t)y * w * 4;
    for (int32_t x = 0; x < w; x++) {
      const uint8_t* px = row + (int64_t)x * (bpp / 8);
      out[x * 4 + 0] = px[2];
      out[x * 4 + 1] = px[1];
      out[x * 4 + 2] = px[0];
      out[x * 4 + 3] = bpp == 32 ? px[3] : 255;
    }
  }
}

// ---- TGA (types 2/3 uncompressed, 10 RLE; 8/24/32 bpp) ----
static void decode_tga(const uint8_t* d, int64_t n, DtrImage* im) {
  if (n < 18) { img_err(im, "tga: truncated"); return; }
  uint8_t idlen = d[0], cmap = d[1], type = d[2];
  int32_t w = d[12] | (d[13] << 8);
  int32_t h = d[14] | (d[15] << 8);
  uint8_t bpp = d[16];
  uint8_t desc = d[17];
  if (cmap != 0) { img_err(im, "tga: colormap not supported"); return; }
  if (type != 2 && type != 3 && type != 10 && type != 11) {
    img_err(im, "tga: unsupported type");
    return;
  }
  if (bpp != 8 && bpp != 24 && bpp != 32) { img_err(im, "tga: bpp"); return; }
  if (w <= 0 || h <= 0) { img_err(im, "tga: bad dims"); return; }
  bool origin_top = (desc & 0x20) != 0;
  int bypp = bpp / 8;
  const uint8_t* p = d + 18 + idlen;
  const uint8_t* end = d + n;
  std::vector<uint8_t> raw((size_t)w * h * bypp);
  if (type == 2 || type == 3) {
    if (end - p < (int64_t)raw.size()) { img_err(im, "tga: truncated data"); return; }
    memcpy(raw.data(), p, raw.size());
  } else {  // RLE
    size_t o = 0;
    while (o < raw.size() && p < end) {
      uint8_t hdr = *p++;
      int count = (hdr & 0x7F) + 1;
      if (hdr & 0x80) {
        if (end - p < bypp) { img_err(im, "tga: rle truncated"); return; }
        for (int i = 0; i < count && o < raw.size(); i++) {
          memcpy(&raw[o], p, bypp);
          o += bypp;
        }
        p += bypp;
      } else {
        int64_t need = (int64_t)count * bypp;
        if (end - p < need) { img_err(im, "tga: rle truncated"); return; }
        size_t cp = (size_t)need;
        if (o + cp > raw.size()) cp = raw.size() - o;
        memcpy(&raw[o], p, cp);
        o += cp;
        p += need;
      }
    }
    if (o < raw.size()) { img_err(im, "tga: rle short"); return; }
  }
  im->width = w;
  im->height = h;
  im->pixels = (uint8_t*)malloc((size_t)w * h * 4);
  for (int32_t y = 0; y < h; y++) {
    int32_t sy = origin_top ? y : (h - 1 - y);
    const uint8_t* row = raw.data() + (size_t)sy * w * bypp;
    uint8_t* out = im->pixels + (size_t)y * w * 4;
    for (int32_t x = 0; x < w; x++) {
      const uint8_t* px = row + (size_t)x * bypp;
      if (bypp == 1) {
        out[x * 4 + 0] = out[x * 4 + 1] = out[x * 4 + 2] = px[0];
        out[x * 4 + 3] = 255;
      } else {
        out[x * 4 + 0] = px[2];
        out[x * 4 + 1] = px[1];
        out[x * 4 + 2] = px[0];
        out[x * 4 + 3] = bypp == 4 ? px[3] : 255;
      }
    }
  }
}

// ---- DEFLATE (RFC 1951) + zlib container (RFC 1950), from scratch ----
namespace dtr_inflate {

struct BitReader {
  const uint8_t* d;
  size_t n;
  size_t byte = 0;
  uint32_t buf = 0;
  int cnt = 0;
  bool fail = false;

  void fill() {
    while (cnt <= 24 && byte < n) {
      buf |= (uint32_t)d[byte++] << cnt;
      cnt += 8;
    }
  }
  int bits(int k) {  // k <= 16, LSB-first per RFC 1951
    fill();
    if (cnt < k) { fail = true; return 0; }
    int v = (int)(buf & ((1u << k) - 1));
    buf >>= k;
    cnt -= k;
    return v;
  }
  void align_byte() {
    int drop = cnt & 7;
    buf >>= drop;
    cnt -= drop;
  }
};

// Canonical Huffman decoder over code-length arrays (count/symbol form).
struct Huff {
  uint16_t count[16];   // codes per bit length 0..15
  uint16_t sym[288];    // symbols ordered by (length, symbol)
  bool ok = false;
};

static void huff_build(Huff* h, const uint8_t* lens, int n) {
  memset(h->count, 0, sizeof(h->count));
  for (int i = 0; i < n; i++) h->count[lens[i]]++;
  h->count[0] = 0;
  // over-subscribed check (incomplete codes are tolerated, as in deflate)
  int left = 1;
  for (int len = 1; len <= 15; len++) {
    left <<= 1;
    left -= h->count[len];
    if (left < 0) { h->ok = false; return; }
  }
  uint16_t offs[16];
  offs[1] = 0;
  for (int len = 1; len < 15; len++) offs[len + 1] = (uint16_t)(offs[len] + h->count[len]);
  for (int i = 0; i < n; i++)
    if (lens[i]) h->sym[offs[lens[i]]++] = (uint16_t)i;
  h->ok = true;
}

static int huff_decode(BitReader& br, const Huff& h) {
  int code = 0, first = 0, index = 0;
  for (int len = 1; len <= 15; len++) {
    code |= br.bits(1);
    int cnt = h.count[len];
    if (code - first < cnt) return h.sym[index + (code - first)];
    index += cnt;
    first = (first + cnt) << 1;
    code <<= 1;
  }
  return -1;
}

static const uint16_t LEN_BASE[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
                                      19, 23, 27, 31, 35, 43, 51, 59, 67, 83,
                                      99, 115, 131, 163, 195, 227, 258};
static const uint8_t LEN_EXTRA[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                      2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
static const uint16_t DIST_BASE[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49,
                                       65, 97, 129, 193, 257, 385, 513, 769,
                                       1025, 1537, 2049, 3073, 4097, 6145,
                                       8193, 12289, 16385, 24577};
static const uint8_t DIST_EXTRA[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                                       6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
                                       12, 12, 13, 13};

static bool inflate_block(BitReader& br, const Huff& lit, const Huff& dist,
                          std::vector<uint8_t>& out, size_t outcap) {
  for (;;) {
    int sym = huff_decode(br, lit);
    if (br.fail || sym < 0) return false;
    if (sym < 256) {
      if (out.size() >= outcap) return false;
      out.push_back((uint8_t)sym);
    } else if (sym == 256) {
      return true;  // end of block
    } else {
      sym -= 257;
      if (sym >= 29) return false;
      int len = LEN_BASE[sym] + br.bits(LEN_EXTRA[sym]);
      int dsym = huff_decode(br, dist);
      if (br.fail || dsym < 0 || dsym >= 30) return false;
      size_t d = (size_t)DIST_BASE[dsym] + (size_t)br.bits(DIST_EXTRA[dsym]);
      if (br.fail || d > out.size()) return false;
      if (out.size() + (size_t)len > outcap) return false;
      size_t from = out.size() - d;
      for (int i = 0; i < len; i++) out.push_back(out[from + i]);
    }
  }
}

static bool inflate_raw(BitReader& br, std::vector<uint8_t>& out, size_t outcap) {
  Huff fixed_lit, fixed_dist;
  {
    uint8_t lens[288];
    for (int i = 0; i < 144; i++) lens[i] = 8;
    for (int i = 144; i < 256; i++) lens[i] = 9;
    for (int i = 256; i < 280; i++) lens[i] = 7;
    for (int i = 280; i < 288; i++) lens[i] = 8;
    huff_build(&fixed_lit, lens, 288);
    for (int i = 0; i < 30; i++) lens[i] = 5;
    huff_build(&fixed_dist, lens, 30);
  }

  int final_block = 0;
  do {
    final_block = br.bits(1);
    int btype = br.bits(2);
    if (br.fail) return false;
    if (btype == 0) {  // stored
      br.align_byte();
      int lo = br.bits(8), hi = br.bits(8);
      int nlo = br.bits(8), nhi = br.bits(8);
      if (br.fail) return false;
      int len = lo | (hi << 8);
      int nlen = nlo | (nhi << 8);
      if ((len ^ 0xffff) != nlen) return false;
      if (out.size() + (size_t)len > outcap) return false;
      for (int i = 0; i < len; i++) {
        int v = br.bits(8);
        if (br.fail) return false;
        out.push_back((uint8_t)v);
      }
    } else if (btype == 1) {  // fixed Huffman
      if (!inflate_block(br, fixed_lit, fixed_dist, out, outcap)) return false;
    } else if (btype == 2) {  // dynamic Huffman
      static const uint8_t ORDER[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                        11, 4, 12, 3, 13, 2, 14, 1, 15};
      int hlit = br.bits(5) + 257;
      int hdist = br.bits(5) + 1;
      int hclen = br.bits(4) + 4;
      if (br.fail || hlit > 286 || hdist > 30) return false;
      uint8_t cl_lens[19] = {0};
      for (int i = 0; i < hclen; i++) cl_lens[ORDER[i]] = (uint8_t)br.bits(3);
      Huff cl;
      huff_build(&cl, cl_lens, 19);
      if (!cl.ok) return false;
      uint8_t lens[288 + 30] = {0};
      int i = 0;
      while (i < hlit + hdist) {
        int s = huff_decode(br, cl);
        if (br.fail || s < 0) return false;
        if (s < 16) {
          lens[i++] = (uint8_t)s;
        } else if (s == 16) {
          if (i == 0) return false;
          int rep = 3 + br.bits(2);
          uint8_t prev = lens[i - 1];
          while (rep-- && i < hlit + hdist) lens[i++] = prev;
        } else if (s == 17) {
          int rep = 3 + br.bits(3);
          while (rep-- && i < hlit + hdist) lens[i++] = 0;
        } else {  // 18
          int rep = 11 + br.bits(7);
          while (rep-- && i < hlit + hdist) lens[i++] = 0;
        }
      }
      Huff lit, dist;
      huff_build(&lit, lens, hlit);
      huff_build(&dist, lens + hlit, hdist);
      if (!lit.ok || !dist.ok) return false;
      if (!inflate_block(br, lit, dist, out, outcap)) return false;
    } else {
      return false;
    }
  } while (!final_block);
  return true;
}

static uint32_t adler32(const uint8_t* d, size_t n) {
  uint32_t a = 1, b = 0;
  size_t i = 0;
  while (i < n) {
    size_t blk = n - i < 5552 ? n - i : 5552;  // max before mod is required
    for (size_t j = 0; j < blk; j++) {
      a += d[i + j];
      b += a;
    }
    a %= 65521;
    b %= 65521;
    i += blk;
  }
  return (b << 16) | a;
}

// zlib container: 2-byte header, deflate stream, 4-byte adler32 (verified).
// Returns true and fills `out` (exactly `expect` bytes) on success.
static bool zlib_decompress(const uint8_t* d, size_t n,
                            std::vector<uint8_t>& out, size_t expect) {
  if (n < 6) return false;
  uint8_t cmf = d[0], flg = d[1];
  if ((cmf & 0x0f) != 8) return false;        // method must be deflate
  if (((cmf << 8) | flg) % 31 != 0) return false;
  if (flg & 0x20) return false;               // FDICT unsupported (PNG bans it)
  BitReader br{d + 2, n - 2};
  out.clear();
  out.reserve(expect);
  if (!inflate_raw(br, out, expect)) return false;
  if (out.size() != expect) return false;
  // adler32 trailer: big-endian, right after the deflate stream.
  br.align_byte();
  size_t used = br.byte - (size_t)(br.cnt / 8);  // bytes consumed of d+2
  if (used + 4 > n - 2) return false;
  const uint8_t* tr = d + 2 + used;
  uint32_t want = ((uint32_t)tr[0] << 24) | ((uint32_t)tr[1] << 16) |
                  ((uint32_t)tr[2] << 8) | tr[3];
  return adler32(out.data(), out.size()) == want;
}

}  // namespace dtr_inflate

// ---- PNG (non-interlaced, bit depth 8; gray/gray+a/rgb/rgba/palette) ----
static uint32_t be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) |
         p[3];
}

static int paeth(int a, int b, int c) {
  int pp = a + b - c;
  int pa = abs(pp - a), pb = abs(pp - b), pc = abs(pp - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

static void decode_png(const uint8_t* d, int64_t n, DtrImage* im) {
  static const uint8_t MAGIC[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 8 || memcmp(d, MAGIC, 8) != 0) { img_err(im, "png: bad magic"); return; }
  const uint8_t* p = d + 8;
  const uint8_t* end = d + n;

  uint32_t w = 0, h = 0;
  uint8_t depth = 0, ctype = 0, interlace = 0;
  std::vector<uint8_t> idat;
  uint8_t palette[256][3];
  uint8_t trans[256];
  int n_pal = 0;
  memset(trans, 255, sizeof(trans));

  while (p + 8 <= end) {
    uint32_t len = be32(p);
    const uint8_t* tag = p + 4;
    const uint8_t* data = p + 8;
    if (data + len + 4 > end) { img_err(im, "png: truncated chunk"); return; }
    if (!memcmp(tag, "IHDR", 4)) {
      if (len < 13) { img_err(im, "png: bad IHDR"); return; }
      w = be32(data);
      h = be32(data + 4);
      depth = data[8];
      ctype = data[9];
      interlace = data[12];
    } else if (!memcmp(tag, "PLTE", 4)) {
      n_pal = (int)(len / 3);
      if (n_pal > 256) n_pal = 256;
      memcpy(palette, data, (size_t)n_pal * 3);
    } else if (!memcmp(tag, "tRNS", 4)) {
      if (ctype == 3) {
        for (uint32_t i = 0; i < len && i < 256; i++) trans[i] = data[i];
      }
    } else if (!memcmp(tag, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!memcmp(tag, "IEND", 4)) {
      break;
    }
    p = data + len + 4;  // skip crc
  }
  if (w == 0 || h == 0) { img_err(im, "png: no IHDR"); return; }
  if (interlace) { img_err(im, "png: interlaced not supported"); return; }
  if (depth != 8) { img_err(im, "png: only 8-bit depth supported"); return; }
  int ch;
  switch (ctype) {
    case 0: ch = 1; break;  // gray
    case 2: ch = 3; break;  // rgb
    case 3: ch = 1; break;  // palette
    case 4: ch = 2; break;  // gray+alpha
    case 6: ch = 4; break;  // rgba
    default: img_err(im, "png: bad color type"); return;
  }
  if ((uint64_t)w * h > (uint64_t)1 << 30) { img_err(im, "png: too large"); return; }

  size_t stride = (size_t)w * ch;
  std::vector<uint8_t> raw;
  if (!dtr_inflate::zlib_decompress(idat.data(), idat.size(), raw,
                                    (stride + 1) * h)) {
    img_err(im, "png: inflate failed");
    return;
  }

  // Unfilter in place into a contiguous pixel buffer.
  std::vector<uint8_t> pix(stride * h);
  for (uint32_t y = 0; y < h; y++) {
    uint8_t filt = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* cur = &pix[stride * y];
    const uint8_t* up = y > 0 ? &pix[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= (size_t)ch ? cur[x - ch] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)ch) ? up[x - ch] : 0;
      int v = src[x];
      switch (filt) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: img_err(im, "png: bad filter"); return;
      }
      cur[x] = (uint8_t)v;
    }
  }

  im->width = (int32_t)w;
  im->height = (int32_t)h;
  im->pixels = (uint8_t*)malloc((size_t)w * h * 4);
  for (uint32_t y = 0; y < h; y++) {
    const uint8_t* row = &pix[stride * y];
    uint8_t* out = im->pixels + (size_t)y * w * 4;
    for (uint32_t x = 0; x < w; x++) {
      const uint8_t* px = row + (size_t)x * ch;
      switch (ctype) {
        case 0:
          out[x * 4 + 0] = out[x * 4 + 1] = out[x * 4 + 2] = px[0];
          out[x * 4 + 3] = 255;
          break;
        case 2:
          out[x * 4 + 0] = px[0];
          out[x * 4 + 1] = px[1];
          out[x * 4 + 2] = px[2];
          out[x * 4 + 3] = 255;
          break;
        case 3: {
          int idx = px[0] < n_pal ? px[0] : 0;
          out[x * 4 + 0] = palette[idx][0];
          out[x * 4 + 1] = palette[idx][1];
          out[x * 4 + 2] = palette[idx][2];
          out[x * 4 + 3] = trans[px[0]];
          break;
        }
        case 4:
          out[x * 4 + 0] = out[x * 4 + 1] = out[x * 4 + 2] = px[0];
          out[x * 4 + 3] = px[1];
          break;
        case 6:
          out[x * 4 + 0] = px[0];
          out[x * 4 + 1] = px[1];
          out[x * 4 + 2] = px[2];
          out[x * 4 + 3] = px[3];
          break;
      }
    }
  }
}

DtrImage* dtr_image_decode(const uint8_t* data, int64_t size) {
  auto* im = (DtrImage*)calloc(1, sizeof(DtrImage));
  if (size >= 8 && data[0] == 137 && data[1] == 'P') {
    decode_png(data, size, im);
  } else if (size >= 2 && data[0] == 'B' && data[1] == 'M') {
    decode_bmp(data, size, im);
  } else {
    decode_tga(data, size, im);  // TGA has no magic; try last
  }
  return im;
}

DtrImage* dtr_image_decode_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    auto* im = (DtrImage*)calloc(1, sizeof(DtrImage));
    snprintf(im->error, sizeof(im->error), "cannot open %s", path);
    return im;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t* buf = (uint8_t*)malloc(sz > 0 ? sz : 1);
  size_t rd = fread(buf, 1, sz, f);
  fclose(f);
  DtrImage* im = dtr_image_decode(buf, (int64_t)rd);
  free(buf);
  return im;
}

void dtr_image_free(DtrImage* im) {
  if (!im) return;
  free(im->pixels);
  free(im);
}

}  // extern "C"
