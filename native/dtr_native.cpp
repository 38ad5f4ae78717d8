// dtr_native: native asset pipeline for dtrenderer_tpu.
//
// Native counterpart of the reference's C/C++ asset path (SURVEY.md §2 #5, #8:
// hand-written Wavefront OBJ text parser and stb_image-based bitmap decoding).
// Implemented from scratch: OBJ tokenizer/parser, BMP (24/32 uncompressed),
// TGA (types 2/3/10, incl. RLE), PNG (all color types, bit depths 1/2/4/8/16,
// non-interlaced + Adam7 interlaced), baseline AND progressive JPEG (Huffman,
// fixed-point Loeffler IDCT, restart markers, libjpeg-compatible fancy chroma
// upsampling, YCbCr->RGB), and the DEFLATE/zlib inflate underneath PNG
// (RFC 1950/1951: stored + fixed-Huffman + dynamic-Huffman blocks,
// adler32-verified — no zlib dependency). Exposed through a plain C ABI
// consumed with ctypes (assets/native.py) — no pybind dependency.
//
// Build: make -C native   ->  native/libdtr_native.so

#include <cctype>
#include <cmath>
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

// ---- BMP: 1/4/8-bit palette, 16-bit (555 + bitfields), 24/32-bit ----
// (stb_image's BMP coverage; RLE compression is rejected, as in stb.)
static int bmp_mask_shift(uint32_t m) {
  if (!m) return 0;
  int s = 0;
  while (!(m & 1)) { m >>= 1; s++; }
  return s;
}

static int bmp_mask_scale(uint32_t m) {  // bits in the contiguous mask
  if (!m) return 8;
  m >>= bmp_mask_shift(m);
  int b = 0;
  while (m & 1) { m >>= 1; b++; }
  return b;
}

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
  if (bpp != 1 && bpp != 4 && bpp != 8 && bpp != 16 && bpp != 24 && bpp != 32) {
    img_err(im, "bmp: unsupported bpp");
    return;
  }
  bool flip = h > 0;
  int32_t ah = h < 0 ? -h : h;
  if (w <= 0 || ah <= 0 || w > 1 << 16 || ah > 1 << 16) {
    img_err(im, "bmp: bad dims");
    return;
  }
  // palette (BGRA entries right after the info header + optional masks)
  uint8_t pal[256][4];
  int n_pal = 0;
  if (bpp <= 8) {
    uint32_t ncol = *(const uint32_t*)(d + 46);
    if (ncol == 0 || ncol > 256) ncol = 1u << bpp;
    const uint8_t* p = d + 14 + hsz;
    if (p + (int64_t)ncol * 4 > d + n) { img_err(im, "bmp: bad palette"); return; }
    for (uint32_t i = 0; i < ncol; i++) {
      pal[i][0] = p[i * 4 + 2];
      pal[i][1] = p[i * 4 + 1];
      pal[i][2] = p[i * 4 + 0];
      pal[i][3] = 255;
    }
    n_pal = (int)ncol;
  }
  // channel masks: 5-5-5 (16 bpp) / BGRX (32 bpp) defaults, BI_BITFIELDS
  // overrides for both (stb honors the masks at either depth)
  uint32_t mr = bpp == 32 ? 0x00FF0000 : 0x7C00;
  uint32_t mg = bpp == 32 ? 0x0000FF00 : 0x03E0;
  uint32_t mb = bpp == 32 ? 0x000000FF : 0x001F;
  uint32_t ma = 0;
  bool use_masks = bpp == 16;
  if ((bpp == 16 || bpp == 32) && comp == 3) {
    // V2+ headers (hsz >= 52) embed the masks at the fixed V1 offset; V1
    // headers append them right after the 40-byte header
    size_t moff = hsz >= 52 ? 14 + 40 : 14 + hsz;
    if (moff + 12 > (uint64_t)n) { img_err(im, "bmp: bad masks"); return; }
    const uint8_t* mp = d + moff;
    mr = *(const uint32_t*)(mp + 0);
    mg = *(const uint32_t*)(mp + 4);
    mb = *(const uint32_t*)(mp + 8);
    if (hsz >= 56 && moff + 16 <= (uint64_t)n)
      ma = *(const uint32_t*)(mp + 12);
    use_masks = true;
  }
  int64_t stride = (((int64_t)w * bpp + 7) / 8 + 3) & ~3;
  if ((int64_t)off + stride * ah > n) { img_err(im, "bmp: truncated data"); return; }
  im->width = w;
  im->height = ah;
  im->pixels = (uint8_t*)malloc((size_t)w * ah * 4);
  int rs = bmp_mask_shift(mr), gs = bmp_mask_shift(mg), bs = bmp_mask_shift(mb);
  int rb = bmp_mask_scale(mr), gb = bmp_mask_scale(mg), bb = bmp_mask_scale(mb);
  auto expand = [](uint32_t v, int bits) -> uint8_t {
    if (bits >= 8) return (uint8_t)(v >> (bits - 8));
    uint32_t x = v << (8 - bits);       // replicate high bits into the low end
    return (uint8_t)(x | (x >> bits));
  };
  for (int32_t y = 0; y < ah; y++) {
    const uint8_t* row = d + off + stride * (flip ? (ah - 1 - y) : y);
    uint8_t* out = im->pixels + (size_t)y * w * 4;
    for (int32_t x = 0; x < w; x++) {
      if (bpp <= 8) {
        int bit = x * bpp;
        int idx = (row[bit >> 3] >> (8 - bpp - (bit & 7))) & ((1 << bpp) - 1);
        if (idx >= n_pal) idx = 0;
        memcpy(out + x * 4, pal[idx], 4);
      } else if (use_masks && (bpp == 16 || bpp == 32)) {
        uint32_t v;
        if (bpp == 16) {
          v = (uint32_t)(row[x * 2] | (row[x * 2 + 1] << 8));
        } else {
          memcpy(&v, row + (size_t)x * 4, 4);
        }
        out[x * 4 + 0] = expand((v & mr) >> rs, rb);
        out[x * 4 + 1] = expand((v & mg) >> gs, gb);
        out[x * 4 + 2] = expand((v & mb) >> bs, bb);
        out[x * 4 + 3] = ma ? expand((v & ma) >> bmp_mask_shift(ma),
                                     bmp_mask_scale(ma))
                            : 255;
      } else {
        const uint8_t* px = row + (int64_t)x * (bpp / 8);
        out[x * 4 + 0] = px[2];
        out[x * 4 + 1] = px[1];
        out[x * 4 + 2] = px[0];
        out[x * 4 + 3] = bpp == 32 ? px[3] : 255;
      }
    }
  }
}

// ---- TGA: types 1/2/3 uncompressed + 9/10/11 RLE; colormapped, gray,
// 15/16/24/32-bit truecolor (stb_image's TGA coverage) ----
static void tga_emit(const uint8_t* px, int bypp, bool is_gray, uint8_t* out) {
  if (is_gray) {
    out[0] = out[1] = out[2] = px[0];
    out[3] = 255;
  } else if (bypp == 2) {  // ARRRRRGG GGGBBBBB little-endian (5-5-5)
    uint16_t v = (uint16_t)(px[0] | (px[1] << 8));
    auto e5 = [](int f) { return (uint8_t)((f << 3) | (f >> 2)); };
    out[0] = e5((v >> 10) & 31);
    out[1] = e5((v >> 5) & 31);
    out[2] = e5(v & 31);
    out[3] = 255;
  } else {
    out[0] = px[2];
    out[1] = px[1];
    out[2] = px[0];
    out[3] = bypp == 4 ? px[3] : 255;
  }
}

static void decode_tga(const uint8_t* d, int64_t n, DtrImage* im) {
  if (n < 18) { img_err(im, "tga: truncated"); return; }
  uint8_t idlen = d[0], cmap = d[1], type = d[2];
  int cm_first = d[3] | (d[4] << 8);
  int cm_len = d[5] | (d[6] << 8);
  int cm_bpp = d[7];
  int32_t w = d[12] | (d[13] << 8);
  int32_t h = d[14] | (d[15] << 8);
  uint8_t bpp = d[16];
  uint8_t desc = d[17];
  bool mapped = type == 1 || type == 9;
  bool is_gray = type == 3 || type == 11;
  if (type != 1 && type != 2 && type != 3 && type != 9 && type != 10 &&
      type != 11) {
    img_err(im, "tga: unsupported type");
    return;
  }
  if (mapped != (cmap == 1)) { img_err(im, "tga: bad colormap flag"); return; }
  if (mapped) {
    if (bpp != 8 && bpp != 16) { img_err(im, "tga: bad index size"); return; }
    if (cm_bpp != 15 && cm_bpp != 16 && cm_bpp != 24 && cm_bpp != 32) {
      img_err(im, "tga: bad colormap entry size");
      return;
    }
  } else if (bpp != 8 && bpp != 15 && bpp != 16 && bpp != 24 && bpp != 32) {
    img_err(im, "tga: bpp");
    return;
  }
  if (w <= 0 || h <= 0) { img_err(im, "tga: bad dims"); return; }
  bool origin_top = (desc & 0x20) != 0;
  int bypp = (bpp + 7) / 8;
  const uint8_t* p = d + 18 + idlen;
  const uint8_t* end = d + n;

  // decode the colormap into RGBA
  std::vector<uint8_t> palette;
  if (mapped) {
    if (cm_len <= 0) { img_err(im, "tga: empty colormap"); return; }
    int cm_bypp = (cm_bpp + 7) / 8;
    if (end - p < (int64_t)cm_len * cm_bypp) {
      img_err(im, "tga: truncated colormap");
      return;
    }
    palette.resize((size_t)cm_len * 4);
    for (int i = 0; i < cm_len; i++)
      tga_emit(p + (size_t)i * cm_bypp, cm_bypp, false, &palette[i * 4]);
    p += (size_t)cm_len * cm_bypp;
  }

  std::vector<uint8_t> raw((size_t)w * h * bypp);
  if (type <= 3) {  // uncompressed
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
      if (mapped) {
        int idx = bypp == 1 ? px[0] : (px[0] | (px[1] << 8));
        idx -= cm_first;
        if (idx < 0 || idx >= cm_len) idx = 0;
        memcpy(out + x * 4, &palette[(size_t)idx * 4], 4);
      } else {
        tga_emit(px, is_gray ? 1 : bypp, is_gray, out + x * 4);
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

// ---- PNG: all color types, bit depths 1/2/4/8/16, interlace 0 + Adam7 ----
// (stb_image parity, SURVEY.md §2 #8; 16-bit samples scale to 8-bit output
// by taking the high byte, matching stbi_load's 8-bit conversion.)
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

struct PngState {
  uint32_t w = 0, h = 0;
  uint8_t depth = 0, ctype = 0;
  int ch = 0;           // samples per pixel
  uint8_t palette[256][3];
  uint8_t trans[256];
  int n_pal = 0;
};

// Read sample s (0..ch-1) of pixel x from a de-filtered scanline.
static inline int png_sample(const PngState& st, const uint8_t* row,
                             uint32_t x, int s) {
  int idx = (int)x * st.ch + s;
  switch (st.depth) {
    case 16: return row[idx * 2];  // high byte == stb's 16->8 scaling
    case 8: return row[idx];
    default: {  // 1/2/4-bit packed MSB-first
      int bits = st.depth;
      int bit = idx * bits;
      int v = (row[bit >> 3] >> (8 - bits - (bit & 7))) & ((1 << bits) - 1);
      return v;
    }
  }
}

// Scale a sub-byte gray sample to 8 bits (identity at depth >= 8).
static inline int png_scale8(const PngState& st, int v) {
  switch (st.depth) {
    case 1: return v * 255;
    case 2: return v * 85;
    case 4: return v * 17;
    default: return v;
  }
}

static void png_emit_pixel(const PngState& st, const uint8_t* row, uint32_t x,
                           uint8_t* out) {
  switch (st.ctype) {
    case 0: {  // gray
      int g = png_scale8(st, png_sample(st, row, x, 0));
      out[0] = out[1] = out[2] = (uint8_t)g;
      out[3] = 255;
      break;
    }
    case 2:  // rgb
      out[0] = (uint8_t)png_sample(st, row, x, 0);
      out[1] = (uint8_t)png_sample(st, row, x, 1);
      out[2] = (uint8_t)png_sample(st, row, x, 2);
      out[3] = 255;
      break;
    case 3: {  // palette (index is NOT scaled)
      int idx = png_sample(st, row, x, 0);
      int pi = idx < st.n_pal ? idx : 0;
      out[0] = st.palette[pi][0];
      out[1] = st.palette[pi][1];
      out[2] = st.palette[pi][2];
      out[3] = idx < 256 ? st.trans[idx] : 255;
      break;
    }
    case 4: {  // gray + alpha
      int g = png_scale8(st, png_sample(st, row, x, 0));
      out[0] = out[1] = out[2] = (uint8_t)g;
      out[3] = (uint8_t)png_sample(st, row, x, 1);
      break;
    }
    case 6:  // rgba
      out[0] = (uint8_t)png_sample(st, row, x, 0);
      out[1] = (uint8_t)png_sample(st, row, x, 1);
      out[2] = (uint8_t)png_sample(st, row, x, 2);
      out[3] = (uint8_t)png_sample(st, row, x, 3);
      break;
  }
}

// De-filter `ph` scanlines of `stride` bytes starting at raw (each prefixed by
// a filter byte); filter distance = whole-pixel bytes (>= 1). Returns false on
// a bad filter id. Output: pix (ph * stride bytes).
static bool png_unfilter(const uint8_t* raw, uint32_t ph, size_t stride,
                         int fdist, std::vector<uint8_t>& pix) {
  pix.resize(stride * ph);
  for (uint32_t y = 0; y < ph; y++) {
    uint8_t filt = raw[(stride + 1) * y];
    const uint8_t* src = raw + (stride + 1) * y + 1;
    uint8_t* cur = &pix[stride * y];
    const uint8_t* up = y > 0 ? &pix[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= (size_t)fdist ? cur[x - fdist] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)fdist) ? up[x - fdist] : 0;
      int v = src[x];
      switch (filt) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      cur[x] = (uint8_t)v;
    }
  }
  return true;
}

// Adam7 pass geometry (x origin, y origin, x step, y step).
static const int ADAM7[7][4] = {
    {0, 0, 8, 8}, {4, 0, 8, 8}, {0, 4, 4, 8}, {2, 0, 4, 4},
    {0, 2, 2, 4}, {1, 0, 2, 2}, {0, 1, 1, 2},
};

static void decode_png(const uint8_t* d, int64_t n, DtrImage* im) {
  static const uint8_t MAGIC[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 8 || memcmp(d, MAGIC, 8) != 0) { img_err(im, "png: bad magic"); return; }
  const uint8_t* p = d + 8;
  const uint8_t* end = d + n;

  PngState st;
  uint8_t interlace = 0;
  std::vector<uint8_t> idat;
  memset(st.trans, 255, sizeof(st.trans));

  while (p + 8 <= end) {
    uint32_t len = be32(p);
    const uint8_t* tag = p + 4;
    const uint8_t* data = p + 8;
    if (data + len + 4 > end) { img_err(im, "png: truncated chunk"); return; }
    if (!memcmp(tag, "IHDR", 4)) {
      if (len < 13) { img_err(im, "png: bad IHDR"); return; }
      st.w = be32(data);
      st.h = be32(data + 4);
      st.depth = data[8];
      st.ctype = data[9];
      interlace = data[12];
    } else if (!memcmp(tag, "PLTE", 4)) {
      st.n_pal = (int)(len / 3);
      if (st.n_pal > 256) st.n_pal = 256;
      memcpy(st.palette, data, (size_t)st.n_pal * 3);
    } else if (!memcmp(tag, "tRNS", 4)) {
      if (st.ctype == 3) {
        for (uint32_t i = 0; i < len && i < 256; i++) st.trans[i] = data[i];
      }
    } else if (!memcmp(tag, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!memcmp(tag, "IEND", 4)) {
      break;
    }
    p = data + len + 4;  // skip crc
  }
  if (st.w == 0 || st.h == 0) { img_err(im, "png: no IHDR"); return; }
  if (interlace > 1) { img_err(im, "png: bad interlace"); return; }
  switch (st.ctype) {
    case 0: st.ch = 1; break;  // gray
    case 2: st.ch = 3; break;  // rgb
    case 3: st.ch = 1; break;  // palette
    case 4: st.ch = 2; break;  // gray+alpha
    case 6: st.ch = 4; break;  // rgba
    default: img_err(im, "png: bad color type"); return;
  }
  bool depth_ok = st.depth == 8 || st.depth == 16 ||
                  ((st.depth == 1 || st.depth == 2 || st.depth == 4) &&
                   (st.ctype == 0 || st.ctype == 3));
  if (!depth_ok) { img_err(im, "png: bad bit depth"); return; }
  uint32_t w = st.w, h = st.h;
  if ((uint64_t)w * h > (uint64_t)1 << 30) { img_err(im, "png: too large"); return; }

  auto stride_of = [&](uint32_t pw) -> size_t {
    return ((size_t)pw * st.ch * st.depth + 7) / 8;
  };
  int fdist = (st.ch * st.depth + 7) / 8;  // filter distance: whole-pixel bytes

  // Expected decompressed size: each pass scanline carries a filter byte.
  size_t expect = 0;
  if (!interlace) {
    expect = (stride_of(w) + 1) * h;
  } else {
    for (int pass = 0; pass < 7; pass++) {
      uint32_t pw = (w - ADAM7[pass][0] + ADAM7[pass][2] - 1) / ADAM7[pass][2];
      uint32_t ph = (h - ADAM7[pass][1] + ADAM7[pass][3] - 1) / ADAM7[pass][3];
      if ((int64_t)w <= ADAM7[pass][0]) pw = 0;
      if ((int64_t)h <= ADAM7[pass][1]) ph = 0;
      if (pw && ph) expect += (stride_of(pw) + 1) * ph;
    }
  }

  std::vector<uint8_t> raw;
  if (!dtr_inflate::zlib_decompress(idat.data(), idat.size(), raw, expect)) {
    img_err(im, "png: inflate failed");
    return;
  }

  im->width = (int32_t)w;
  im->height = (int32_t)h;
  im->pixels = (uint8_t*)malloc((size_t)w * h * 4);

  std::vector<uint8_t> pix;
  if (!interlace) {
    if (!png_unfilter(raw.data(), h, stride_of(w), fdist, pix)) {
      img_err(im, "png: bad filter");
      return;
    }
    for (uint32_t y = 0; y < h; y++) {
      const uint8_t* row = &pix[stride_of(w) * y];
      uint8_t* out = im->pixels + (size_t)y * w * 4;
      for (uint32_t x = 0; x < w; x++) png_emit_pixel(st, row, x, out + x * 4);
    }
  } else {  // Adam7: de-filter each pass independently, splat to final grid
    size_t off = 0;
    for (int pass = 0; pass < 7; pass++) {
      int x0 = ADAM7[pass][0], y0 = ADAM7[pass][1];
      int dx = ADAM7[pass][2], dy = ADAM7[pass][3];
      if ((int64_t)w <= x0 || (int64_t)h <= y0) continue;
      uint32_t pw = (w - x0 + dx - 1) / dx;
      uint32_t ph = (h - y0 + dy - 1) / dy;
      if (!pw || !ph) continue;
      size_t pstride = stride_of(pw);
      if (!png_unfilter(raw.data() + off, ph, pstride, fdist, pix)) {
        img_err(im, "png: bad filter");
        return;
      }
      off += (pstride + 1) * ph;
      for (uint32_t j = 0; j < ph; j++) {
        const uint8_t* row = &pix[pstride * j];
        for (uint32_t i = 0; i < pw; i++) {
          uint32_t x = (uint32_t)x0 + i * dx;
          uint32_t y = (uint32_t)y0 + j * dy;
          png_emit_pixel(st, row, i,
                         im->pixels + ((size_t)y * w + x) * 4);
        }
      }
    }
  }
}

// ---- JPEG (baseline + extended-sequential JFIF, from scratch) ----
// stb_image parity for the reference's stbi_load JPG path (SURVEY.md §2 #8):
// marker parse, Huffman entropy decode (DC diff + AC run-length), dequant,
// float IDCT, restart markers, fancy (triangle-filter) 2x chroma upsampling,
// YCbCr->RGB; progressive (SOF2) spectral-selection + successive-approximation
// scans decode into per-component coefficient planes, IDCT deferred to a
// final pass shared with the sequential path.
namespace dtr_jpeg {

struct JHuff {
  uint16_t count[17] = {0};  // codes per bit length 1..16
  uint8_t sym[256];          // symbols in (length, order) sequence
  bool ok = false;
};

struct JBits {
  const uint8_t* d;
  size_t n, pos;
  uint32_t buf = 0;
  int cnt = 0;
  bool fail = false;
  uint8_t marker = 0;  // set when a non-RST marker interrupts entropy data

  void fill() {
    while (cnt <= 24) {
      uint8_t b = 0;  // pad with zeros at EOF / at a marker
      if (pos < n) {
        uint8_t raw = d[pos];
        if (raw == 0xFF) {
          if (pos + 1 < n && d[pos + 1] == 0x00) {  // stuffed FF -> literal FF
            pos += 2;
            b = 0xFF;
          } else {  // real marker: stop consuming
            marker = pos + 1 < n ? d[pos + 1] : 0xD9;
          }
        } else {
          pos++;
          b = raw;
        }
      }
      buf = (buf << 8) | b;
      cnt += 8;
    }
  }
  int bits(int k) {  // MSB-first
    if (k == 0) return 0;
    fill();
    int v = (int)((buf >> (cnt - k)) & ((1u << k) - 1));
    cnt -= k;
    return v;
  }
  void align() { cnt -= cnt & 7; }
};

static int jhuff_decode(JBits& br, const JHuff& h) {
  int code = 0, first = 0, index = 0;
  for (int len = 1; len <= 16; len++) {
    code |= br.bits(1);
    int cnt = h.count[len];
    if (code - first < cnt) return h.sym[index + (code - first)];
    index += cnt;
    first = (first + cnt) << 1;
    code <<= 1;
  }
  return -1;
}

// JPEG "extend": v in [0, 2^t) decoded from t bits -> signed coefficient.
static inline int jextend(int v, int t) {
  return (t && v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
}

static const uint8_t ZIGZAG[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// Fixed-point scaled-integer IDCT: the published Loeffler-Ligtenberg-
// Moshovitz factorization (11 multiplies per 8-point transform) in 13-bit
// fixed point, so output matches common decoders to <= 1 LSB (the JPEG
// standard's accuracy requirement).
//
// Derivation of the constant set (ck = cos(k*pi/16), R2 = sqrt(2)): the
// even half is the 4-point IDCT — a trivial {s0 +- s4} butterfly plus the
// (s2, s6) rotation by R2*c6, factored as one shared product
// (s2 + s6)*R2*c6 corrected by R2*(c2 - c6) and R2*(c2 + c6). The odd half
// evaluates the four odd basis sums via pair sums (s1+s7, s5+s3, s7+s3,
// s5+s1) and the shared corrector (s7+s3 + s5+s1)*R2*c3, with per-input
// weights R2*(-c1+c3+c5-c7), R2*(c1+c3-c5+c7), R2*(c1+c3+c5-c7),
// R2*(c1+c3-c5-c7) and pair weights R2*(c3-c7), R2*(c1+c3), R2*(c3+c5),
// R2*(c3-c5). Each K constant below is round(value * 2^FIX_SHIFT); these
// are NORMATIVE for <=1-LSB-compatible fixed-point IDCTs.
namespace jidct_detail {
constexpr int FIX_SHIFT = 13;  // fixed-point fraction bits of the constants
constexpr int COL_SHIFT = 2;   // extra precision carried between the passes
constexpr int32_t K_R2_M_C1_P_C3_P_C5_M_C7 = 2446;   // 0.298631336
constexpr int32_t K_R2_C3_M_C5 = 3196;               // 0.390180644
constexpr int32_t K_R2_C6 = 4433;                    // 0.541196100
constexpr int32_t K_R2_C2_M_C6 = 6270;               // 0.765366865
constexpr int32_t K_R2_C3_M_C7 = 7373;               // 0.899976223
constexpr int32_t K_R2_C3 = 9633;                    // 1.175875602
constexpr int32_t K_R2_C1_P_C3_M_C5_M_C7 = 12299;    // 1.501321110
constexpr int32_t K_R2_C2_P_C6 = 15137;              // 1.847759065
constexpr int32_t K_R2_C3_P_C5 = 16069;              // 1.961570560
constexpr int32_t K_R2_C1_P_C3_M_C5_P_C7 = 16819;    // 2.053119869
constexpr int32_t K_R2_C1_P_C3 = 20995;              // 2.562915447
constexpr int32_t K_R2_C1_P_C3_P_C5_M_C7 = 25172;    // 3.072711026

static inline int64_t round_shift(int64_t x, int n) {
  return (x + ((int64_t)1 << (n - 1))) >> n;
}

// One 8-point 1D inverse DCT over 64-bit fixed point: s[] holds the
// frequency samples (already whatever fixed-point scale the pass uses),
// d[] receives the spatial samples still carrying FIX_SHIFT fraction bits
// relative to the inputs — callers round_shift to their own precision.
static inline void idct8(const int64_t s[8], int64_t d[8]) {
  // even half: {s0, s4} butterfly + the (s2, s6) rotation
  int64_t rot = (s[2] + s[6]) * K_R2_C6;
  int64_t ev2 = rot - s[6] * K_R2_C2_P_C6;  // R2*c6*s2 - R2*c2*s6
  int64_t ev3 = rot + s[2] * K_R2_C2_M_C6;  // R2*c2*s2 + R2*c6*s6
  int64_t dc = (s[0] + s[4]) << FIX_SHIFT;
  int64_t nyq = (s[0] - s[4]) << FIX_SHIFT;
  int64_t e0 = dc + ev3, e3 = dc - ev3;
  int64_t e1 = nyq + ev2, e2 = nyq - ev2;
  // odd half: per-input weights + shared pair/quad correctors
  int64_t o0 = s[7], o1 = s[5], o2 = s[3], o3 = s[1];
  int64_t p17 = o0 + o3;               // s7 + s1
  int64_t p53 = o1 + o2;               // s5 + s3
  int64_t p73 = o0 + o2;               // s7 + s3
  int64_t p51 = o1 + o3;               // s5 + s1
  int64_t quad = (p73 + p51) * K_R2_C3;
  o0 *= K_R2_M_C1_P_C3_P_C5_M_C7;
  o1 *= K_R2_C1_P_C3_M_C5_P_C7;
  o2 *= K_R2_C1_P_C3_P_C5_M_C7;
  o3 *= K_R2_C1_P_C3_M_C5_M_C7;
  p17 *= -K_R2_C3_M_C7;
  p53 *= -K_R2_C1_P_C3;
  p73 = p73 * (-K_R2_C3_P_C5) + quad;
  p51 = p51 * (-K_R2_C3_M_C5) + quad;
  o0 += p17 + p73;
  o1 += p53 + p51;
  o2 += p53 + p73;
  o3 += p17 + p51;
  d[0] = e0 + o3;
  d[7] = e0 - o3;
  d[1] = e1 + o2;
  d[6] = e1 - o2;
  d[2] = e2 + o1;
  d[5] = e2 - o1;
  d[3] = e3 + o0;
  d[4] = e3 - o0;
}
}  // namespace jidct_detail

static void jidct(const int in[64], uint8_t* out, int out_stride) {
  using namespace jidct_detail;
  int64_t ws[64];
  // pass 1: columns, keeping COL_SHIFT extra fraction bits for pass 2
  for (int c = 0; c < 8; c++) {
    const int* col = in + c;
    int64_t* wsp = ws + c;
    int64_t s[8], d[8];
    for (int k = 0; k < 8; k++) s[k] = col[k * 8];
    idct8(s, d);
    for (int k = 0; k < 8; k++)
      wsp[8 * k] = round_shift(d[k], FIX_SHIFT - COL_SHIFT);
  }
  // pass 2: rows — final descale (the transform's 1/8 normalization rides
  // the +3), level shift + clamp to u8
  for (int r = 0; r < 8; r++) {
    const int64_t* row = ws + r * 8;
    uint8_t* o = out + r * out_stride;
    int64_t d[8];
    idct8(row, d);
    for (int x = 0; x < 8; x++) {
      int q = (int)round_shift(d[x], FIX_SHIFT + COL_SHIFT + 3) + 128;
      o[x] = (uint8_t)(q < 0 ? 0 : (q > 255 ? 255 : q));
    }
  }
}

struct JComp {
  int id = 0, h = 1, v = 1, tq = 0;
  int dc_tbl = 0, ac_tbl = 0;
  int dc_pred = 0;
  int bw = 0, bh = 0;            // blocks across/down (MCU-padded)
  int bwd = 0, bhd = 0;          // DATA blocks (non-interleaved scan grid)
  std::vector<int32_t> coef;     // bw*bh blocks x 64 coefs, ZIGZAG order, raw
  std::vector<uint8_t> plane;    // bw*8 x bh*8 samples (filled by final IDCT)
};

struct JDec {
  uint16_t qt[4][64] = {};  // zigzag order, as stored
  bool qt_ok[4] = {};       // table actually loaded by a DQT segment
  JHuff dc[4], ac[4];
  int w = 0, h = 0, ncomp = 0;
  JComp comp[4];
  int hmax = 1, vmax = 1;
  int restart = 0;
  bool progressive = false;
  // Adobe APP14 color-transform flag: -1 absent, 0 none (RGB/CMYK),
  // 1 YCbCr, 2 YCCK. Decides the 4-component interpretation (CMYK vs YCCK).
  int app14_transform = -1;
  const char* err = nullptr;
};

// Sequential (baseline) block: DC diff + AC run-length into the RAW
// coefficient store (dequant happens in the final IDCT pass, shared with the
// progressive path).
static bool jdecode_block_seq(JBits& br, JDec& jd, JComp& c, int bx, int by) {
  int32_t* coef = &c.coef[((size_t)by * c.bw + bx) * 64];
  int t = jhuff_decode(br, jd.dc[c.dc_tbl]);
  if (t < 0 || t > 15) return false;
  c.dc_pred += jextend(br.bits(t), t);
  coef[0] = c.dc_pred;
  int k = 1;
  while (k < 64) {
    int rs = jhuff_decode(br, jd.ac[c.ac_tbl]);
    if (rs < 0) return false;
    int r = rs >> 4, s = rs & 15;
    if (s == 0) {
      if (r == 15) { k += 16; continue; }  // ZRL
      break;                               // EOB
    }
    k += r;
    if (k > 63) return false;
    coef[k] = jextend(br.bits(s), s);
    k++;
  }
  return true;
}

// Byte-align and skip the RSTn marker at a restart boundary; unread buffered
// bits are padding (the bit reader never consumes marker bytes into buf).
static void jskip_restart(JBits& br) {
  br.buf = 0;
  br.cnt = 0;
  while (br.pos + 1 < br.n &&
         !(br.d[br.pos] == 0xFF && br.d[br.pos + 1] >= 0xD0 &&
           br.d[br.pos + 1] <= 0xD7))
    br.pos++;
  if (br.pos + 1 < br.n) br.pos += 2;
  br.marker = 0;
}

// Sequential scan: interleaved MCU walk (or single-component data grid).
static const char* jdecode_scan_seq(JBits& br, JDec& jd, JComp** scomp,
                                    int ns) {
  for (int i = 0; i < ns; i++) scomp[i]->dc_pred = 0;
  int mcux, mcuy;
  if (ns == 1) {
    mcux = scomp[0]->bwd;
    mcuy = scomp[0]->bhd;
  } else {
    mcux = (jd.w + 8 * jd.hmax - 1) / (8 * jd.hmax);
    mcuy = (jd.h + 8 * jd.vmax - 1) / (8 * jd.vmax);
  }
  int mcus = 0;
  for (int my = 0; my < mcuy; my++) {
    for (int mx = 0; mx < mcux; mx++) {
      if (jd.restart && mcus && mcus % jd.restart == 0) {
        jskip_restart(br);
        for (int i = 0; i < ns; i++) scomp[i]->dc_pred = 0;
      }
      if (ns == 1) {
        if (!jdecode_block_seq(br, jd, *scomp[0], mx, my))
          return "jpg: entropy decode failed";
      } else {
        for (int i = 0; i < ns; i++) {
          JComp& c = *scomp[i];
          for (int v = 0; v < c.v; v++)
            for (int hh = 0; hh < c.h; hh++)
              if (!jdecode_block_seq(br, jd, c, mx * c.h + hh, my * c.v + v))
                return "jpg: entropy decode failed";
        }
      }
      mcus++;
    }
  }
  return nullptr;
}

// Progressive scan (ITU T.81 G.1.2 / libjpeg jdphuff semantics): DC scans are
// (optionally) interleaved; AC scans cover one component's data blocks with
// EOB-run coding; refinement scans (Ah > 0) append one bit of precision.
static const char* jdecode_scan_progressive(JBits& br, JDec& jd, JComp** sc,
                                            int ns, int Ss, int Se, int Ah,
                                            int Al) {
  if (Ss == 0) {  // ---- DC scan ----
    if (Se != 0) return "jpg: bad progressive DC scan";
    for (int i = 0; i < ns; i++) sc[i]->dc_pred = 0;
    int mcux, mcuy;
    if (ns == 1) {
      mcux = sc[0]->bwd;
      mcuy = sc[0]->bhd;
    } else {
      mcux = (jd.w + 8 * jd.hmax - 1) / (8 * jd.hmax);
      mcuy = (jd.h + 8 * jd.vmax - 1) / (8 * jd.vmax);
    }
    int mcus = 0;
    for (int my = 0; my < mcuy; my++) {
      for (int mx = 0; mx < mcux; mx++) {
        if (jd.restart && mcus && mcus % jd.restart == 0) {
          jskip_restart(br);
          for (int i = 0; i < ns; i++) sc[i]->dc_pred = 0;
        }
        for (int i = 0; i < ns; i++) {
          JComp& c = *sc[i];
          int nv = ns == 1 ? 1 : c.v, nh = ns == 1 ? 1 : c.h;
          for (int v = 0; v < nv; v++) {
            for (int hh = 0; hh < nh; hh++) {
              int bx = ns == 1 ? mx : mx * c.h + hh;
              int by = ns == 1 ? my : my * c.v + v;
              int32_t* coef = &c.coef[((size_t)by * c.bw + bx) * 64];
              if (Ah == 0) {
                int t = jhuff_decode(br, jd.dc[c.dc_tbl]);
                if (t < 0 || t > 15) return "jpg: entropy decode failed";
                c.dc_pred += jextend(br.bits(t), t);
                coef[0] = c.dc_pred * (1 << Al);
              } else {
                if (br.bits(1)) coef[0] |= (1 << Al);
              }
            }
          }
        }
        mcus++;
      }
    }
    return nullptr;
  }
  // ---- AC scan: exactly one component, data-block raster order ----
  if (ns != 1 || Se > 63 || Ss > Se) return "jpg: bad progressive AC scan";
  JComp& c = *sc[0];
  const JHuff& hac = jd.ac[c.ac_tbl];
  int eobrun = 0;
  int p1 = 1 << Al, m1 = -(1 << Al);
  int blocks = 0;
  for (int by = 0; by < c.bhd; by++) {
    for (int bx = 0; bx < c.bwd; bx++) {
      if (jd.restart && blocks && blocks % jd.restart == 0) {
        jskip_restart(br);
        eobrun = 0;
      }
      blocks++;
      int32_t* coef = &c.coef[((size_t)by * c.bw + bx) * 64];
      int k = Ss;
      if (Ah == 0) {  // first AC scan for this band
        if (eobrun) {
          eobrun--;
          continue;
        }
        while (k <= Se) {
          int rs = jhuff_decode(br, hac);
          if (rs < 0) return "jpg: entropy decode failed";
          int r = rs >> 4, s = rs & 15;
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1;
              if (r) eobrun += br.bits(r);
              break;
            }
            k += 16;  // ZRL
          } else {
            k += r;
            if (k > Se) return "jpg: AC index out of band";
            coef[k] = jextend(br.bits(s), s) * (1 << Al);
            k++;
          }
        }
      } else {  // refinement scan: append a bit to this band
        if (eobrun == 0) {
          while (k <= Se) {
            int rs = jhuff_decode(br, hac);
            if (rs < 0) return "jpg: entropy decode failed";
            int r = rs >> 4, s = rs & 15;
            int val = 0;
            if (s == 0) {
              if (r < 15) {
                eobrun = 1 << r;
                if (r) eobrun += br.bits(r);
                break;
              }
              // r == 15: run of 16 zero-history positions
            } else {
              if (s != 1) return "jpg: bad refinement code";
              val = br.bits(1) ? p1 : m1;
            }
            while (k <= Se) {
              int32_t& ck = coef[k];
              if (ck != 0) {
                if (br.bits(1) && (ck & p1) == 0) ck += ck >= 0 ? p1 : m1;
              } else {
                if (r == 0) break;
                r--;
              }
              k++;
            }
            if (val && k <= Se) coef[k] = val;
            k++;
          }
        }
        if (eobrun > 0) {  // correction bits for the rest of the band
          while (k <= Se) {
            int32_t& ck = coef[k];
            if (ck != 0 && br.bits(1) && (ck & p1) == 0)
              ck += ck >= 0 ? p1 : m1;
            k++;
          }
          eobrun--;
        }
      }
      if (br.fail) return "jpg: entropy decode failed";
    }
  }
  return nullptr;
}

// Fancy (triangle-filter) 1D horizontal 2x upsample: 3/4 near + 1/4 far,
// matching libjpeg's h2v1 weights. in: iw samples; out: 2*iw samples.
static void jup_h2(const uint8_t* in, int iw, uint8_t* out) {
  if (iw == 1) { out[0] = out[1] = in[0]; return; }
  out[0] = in[0];
  out[1] = (uint8_t)((in[0] * 3 + in[1] + 2) >> 2);
  for (int i = 1; i < iw - 1; i++) {
    out[2 * i] = (uint8_t)((in[i] * 3 + in[i - 1] + 1) >> 2);
    out[2 * i + 1] = (uint8_t)((in[i] * 3 + in[i + 1] + 2) >> 2);
  }
  out[2 * iw - 2] = (uint8_t)((in[iw - 1] * 3 + in[iw - 2] + 1) >> 2);
  out[2 * iw - 1] = in[iw - 1];
}

static const char* jparse_and_decode(const uint8_t* d, size_t n, JDec& jd) {
  size_t p = 2;  // past SOI
  bool have_sof = false;
  int scans = 0;
  while (p + 4 <= n) {
    if (d[p] != 0xFF) return "jpg: marker sync lost";
    // legal 0xFF fill bytes may precede any marker (T.81 B.1.1.2)
    while (p + 1 < n && d[p + 1] == 0xFF) p++;
    if (p + 2 > n) break;
    uint8_t m = d[p + 1];
    p += 2;
    if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;
    if (m == 0xD9) break;  // EOI
    if (p + 2 > n) return "jpg: truncated segment";
    size_t len = ((size_t)d[p] << 8) | d[p + 1];
    if (len < 2 || p + len > n) return "jpg: bad segment length";
    const uint8_t* seg = d + p + 2;
    size_t slen = len - 2;
    if (m == 0xDB) {  // DQT
      size_t q = 0;
      while (q < slen) {
        int pq = seg[q] >> 4, tq = seg[q] & 15;
        if (tq > 3) return "jpg: bad DQT id";
        q++;
        if (q + (pq ? 128 : 64) > slen) return "jpg: truncated DQT";
        for (int i = 0; i < 64; i++) {
          if (pq) {
            jd.qt[tq][i] = ((uint16_t)seg[q] << 8) | seg[q + 1];
            q += 2;
          } else {
            jd.qt[tq][i] = seg[q++];
          }
        }
        jd.qt_ok[tq] = true;
      }
    } else if (m == 0xC4) {  // DHT
      size_t q = 0;
      while (q + 17 <= slen) {
        int tc = seg[q] >> 4, th = seg[q] & 15;
        if (th > 3 || tc > 1) return "jpg: bad DHT id";
        JHuff& hh = tc ? jd.ac[th] : jd.dc[th];
        int total = 0;
        for (int i = 1; i <= 16; i++) {
          hh.count[i] = seg[q + i];
          total += hh.count[i];
        }
        q += 17;
        if (total > 256 || q + total > slen) return "jpg: bad DHT";
        for (int i = 0; i < total; i++) hh.sym[i] = seg[q + i];
        q += total;
        hh.ok = true;
      }
    } else if (m == 0xC0 || m == 0xC1 || m == 0xC2) {  // SOF0/1/2
      if (have_sof) return "jpg: multiple SOF";
      have_sof = true;
      jd.progressive = m == 0xC2;
      if (slen < 6) return "jpg: bad SOF";
      if (seg[0] != 8) return "jpg: only 8-bit precision";
      jd.h = ((int)seg[1] << 8) | seg[2];
      jd.w = ((int)seg[3] << 8) | seg[4];
      jd.ncomp = seg[5];
      if (jd.w <= 0 || jd.h <= 0) return "jpg: bad dims";
      if (jd.ncomp != 1 && jd.ncomp != 3 && jd.ncomp != 4)
        return "jpg: 1, 3 or 4 components only";
      if (slen < 6 + (size_t)jd.ncomp * 3) return "jpg: bad SOF";
      for (int i = 0; i < jd.ncomp; i++) {
        JComp& c = jd.comp[i];
        c.id = seg[6 + i * 3];
        c.h = seg[7 + i * 3] >> 4;
        c.v = seg[7 + i * 3] & 15;
        c.tq = seg[8 + i * 3];
        if (jd.ncomp == 1) c.h = c.v = 1;  // sampling ignored for grayscale
        if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
          return "jpg: bad sampling";
        if (c.h > jd.hmax) jd.hmax = c.h;
        if (c.v > jd.vmax) jd.vmax = c.v;
      }
      // allocate MCU-padded coefficient grids (+ data-block dims for
      // non-interleaved scans)
      int mcux = (jd.w + 8 * jd.hmax - 1) / (8 * jd.hmax);
      int mcuy = (jd.h + 8 * jd.vmax - 1) / (8 * jd.vmax);
      for (int i = 0; i < jd.ncomp; i++) {
        JComp& c = jd.comp[i];
        c.bw = mcux * c.h;
        c.bh = mcuy * c.v;
        int cw = (jd.w * c.h + jd.hmax - 1) / jd.hmax;
        int ch2 = (jd.h * c.v + jd.vmax - 1) / jd.vmax;
        c.bwd = (cw + 7) / 8;
        c.bhd = (ch2 + 7) / 8;
        if ((int64_t)c.bw * c.bh > (int64_t)1 << 24) return "jpg: too large";
        c.coef.assign((size_t)c.bw * c.bh * 64, 0);
      }
    } else if (m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
      return "jpg: unsupported SOF type";
    } else if (m == 0xDD) {  // DRI (segment payload: 2-byte interval)
      if (slen < 2) return "jpg: bad DRI";
      jd.restart = ((int)seg[0] << 8) | seg[1];
    } else if (m == 0xEE) {  // APP14: Adobe color-transform flag
      if (slen >= 12 && memcmp(seg, "Adobe", 5) == 0)
        jd.app14_transform = seg[11];
    } else if (m == 0xDA) {  // SOS — decode one scan's entropy data
      if (!have_sof) return "jpg: SOS before SOF";
      int ns = seg[0];
      if (ns < 1 || ns > jd.ncomp || slen < 4 + (size_t)ns * 2)
        return "jpg: bad SOS";
      JComp* scomp[4];
      for (int i = 0; i < ns; i++) {
        int cid = seg[1 + i * 2];
        int tt = seg[2 + i * 2];
        JComp* c = nullptr;
        for (int j = 0; j < jd.ncomp; j++)
          if (jd.comp[j].id == cid) c = &jd.comp[j];
        if (!c) return "jpg: SOS refers to unknown component";
        c->dc_tbl = tt >> 4;
        c->ac_tbl = tt & 15;
        if (c->dc_tbl > 3 || c->ac_tbl > 3) return "jpg: bad table id";
        scomp[i] = c;
      }
      int Ss = seg[1 + 2 * ns], Se = seg[2 + 2 * ns];
      int Ah = seg[3 + 2 * ns] >> 4, Al = seg[3 + 2 * ns] & 15;
      if (!jd.progressive) { Ss = 0; Se = 63; Ah = Al = 0; }
      // table presence depends on scan type (DC refinement needs none)
      for (int i = 0; i < ns; i++) {
        if (Ss == 0 && Ah == 0 && !jd.dc[scomp[i]->dc_tbl].ok)
          return "jpg: missing DC table";
        if ((Se > 0 || !jd.progressive) && !jd.ac[scomp[i]->ac_tbl].ok)
          return "jpg: missing AC table";
        if (!jd.qt_ok[scomp[i]->tq]) return "jpg: missing quant table";
      }
      JBits br{d + p + len, n - p - len, 0};
      const char* serr =
          jd.progressive
              ? jdecode_scan_progressive(br, jd, scomp, ns, Ss, Se, Ah, Al)
              : jdecode_scan_seq(br, jd, scomp, ns);
      if (serr) return serr;
      scans++;
      p = p + len + br.pos;  // br stopped AT the next marker
      continue;
    }
    p += len;
  }
  return scans ? nullptr : "jpg: no SOS";
}

// Upsample component c to full (w, h) resolution. Fancy triangle filter for
// the common 2x factors (libjpeg/stb behavior), pixel replication otherwise.
static void jupsample(const JDec& jd, const JComp& c, std::vector<uint8_t>& out,
                      int w, int h) {
  out.resize((size_t)w * h);
  int sw = c.bw * 8;  // source plane stride
  int cw = (jd.w * c.h + jd.hmax - 1) / jd.hmax;   // meaningful source dims
  int ch2 = (jd.h * c.v + jd.vmax - 1) / jd.vmax;
  int fx = jd.hmax / c.h, fy = jd.vmax / c.v;
  bool exact2x = (fx == 1 || fx == 2) && (fy == 1 || fy == 2) &&
                 fx * c.h == jd.hmax && fy * c.v == jd.vmax;
  if (!exact2x || (fx == 1 && fy == 1)) {
    // replication (or direct copy)
    for (int y = 0; y < h; y++) {
      int sy = y * c.v / jd.vmax;
      if (sy >= ch2) sy = ch2 - 1;
      const uint8_t* src = &c.plane[(size_t)sy * sw];
      uint8_t* dst = &out[(size_t)y * w];
      if (fx == 1 && exact2x) {
        memcpy(dst, src, (size_t)(w < cw ? w : cw));
        for (int x = cw; x < w; x++) dst[x] = src[cw - 1];
      } else {
        for (int x = 0; x < w; x++) {
          int sx = x * c.h / jd.hmax;
          dst[x] = src[sx < cw ? sx : cw - 1];
        }
      }
    }
    return;
  }
  // triangle-filter paths (3/4 near + 1/4 far), libjpeg-compatible rounding
  std::vector<int> colsum(cw);
  std::vector<uint8_t> hrow((size_t)cw * 2);
  for (int y = 0; y < h; y++) {
    uint8_t* dst = &out[(size_t)y * w];
    if (fy == 2 && fx == 2) {
      // h2v2: keep the 12-bit vertical sums through the horizontal pass
      // (descaling between passes loses the LSBs libjpeg keeps).
      int sy = y >> 1;
      if (sy >= ch2) sy = ch2 - 1;
      int other = (y & 1) ? sy + 1 : sy - 1;
      if (other < 0) other = 0;
      if (other >= ch2) other = ch2 - 1;
      const uint8_t* near_ = &c.plane[(size_t)sy * sw];
      const uint8_t* far_ = &c.plane[(size_t)other * sw];
      for (int x = 0; x < cw; x++) colsum[x] = near_[x] * 3 + far_[x];
      auto emit = [&](int xo, int v) {
        if (xo < w) dst[xo] = (uint8_t)v;
      };
      emit(0, (colsum[0] * 4 + 8) >> 4);
      for (int x = 0; x < cw; x++) {
        if (x > 0) emit(2 * x, (colsum[x] * 3 + colsum[x - 1] + 8) >> 4);
        if (x + 1 < cw)
          emit(2 * x + 1, (colsum[x] * 3 + colsum[x + 1] + 7) >> 4);
        else
          emit(2 * x + 1, (colsum[x] * 4 + 7) >> 4);
      }
      for (int x = cw * 2; x < w; x++) dst[x] = dst[cw * 2 - 1];
      continue;
    }
    const uint8_t* row;
    std::vector<uint8_t> vrow(cw);
    if (fy == 1) {
      int sy = y < ch2 ? y : ch2 - 1;
      row = &c.plane[(size_t)sy * sw];
    } else {  // h1v2
      int sy = y >> 1;
      if (sy >= ch2) sy = ch2 - 1;
      int other = (y & 1) ? sy + 1 : sy - 1;
      if (other < 0) other = 0;
      if (other >= ch2) other = ch2 - 1;
      const uint8_t* near_ = &c.plane[(size_t)sy * sw];
      const uint8_t* far_ = &c.plane[(size_t)other * sw];
      for (int x = 0; x < cw; x++)
        vrow[x] = (uint8_t)((near_[x] * 3 + far_[x] + ((y & 1) ? 2 : 1)) >> 2);
      row = vrow.data();
    }
    if (fx == 1) {
      memcpy(dst, row, (size_t)(w < cw ? w : cw));
      for (int x = cw; x < w; x++) dst[x] = row[cw - 1];
    } else {  // h2v1
      jup_h2(row, cw, hrow.data());
      for (int x = 0; x < w; x++)
        dst[x] = hrow[x < cw * 2 ? x : cw * 2 - 1];
    }
  }
}

static void decode_jpeg(const uint8_t* d, int64_t n, DtrImage* im) {
  if (n < 4 || d[0] != 0xFF || d[1] != 0xD8) {
    img_err(im, "jpg: bad magic");
    return;
  }
  JDec jd;
  const char* err = jparse_and_decode(d, (size_t)n, jd);
  if (err) { img_err(im, err); return; }
  // final pass: dequant + dezigzag + IDCT every block into the sample planes
  // (shared by sequential and progressive paths; coefficients are raw)
  for (int i = 0; i < jd.ncomp; i++) {
    JComp& c = jd.comp[i];
    c.plane.assign((size_t)c.bw * 8 * c.bh * 8, 0);
    const uint16_t* qt = jd.qt[c.tq];
    for (int by = 0; by < c.bh; by++) {
      for (int bx = 0; bx < c.bw; bx++) {
        const int32_t* coef = &c.coef[((size_t)by * c.bw + bx) * 64];
        int nat[64];
        for (int k = 0; k < 64; k++) nat[ZIGZAG[k]] = coef[k] * (int)qt[k];
        uint8_t* dst = &c.plane[((size_t)by * 8) * ((size_t)c.bw * 8) + bx * 8];
        jidct(nat, dst, c.bw * 8);
      }
    }
  }
  int w = jd.w, h = jd.h;
  im->width = w;
  im->height = h;
  im->pixels = (uint8_t*)malloc((size_t)w * h * 4);
  if (jd.ncomp == 1) {
    const JComp& c = jd.comp[0];
    for (int y = 0; y < h; y++) {
      const uint8_t* src = &c.plane[(size_t)y * c.bw * 8];
      uint8_t* out = im->pixels + (size_t)y * w * 4;
      for (int x = 0; x < w; x++) {
        out[x * 4 + 0] = out[x * 4 + 1] = out[x * 4 + 2] = src[x];
        out[x * 4 + 3] = 255;
      }
    }
    return;
  }
  if (jd.ncomp == 4) {
    // Adobe 4-component JPEG (the last stb_image sub-format): sample values
    // are stored INVERTED per the Adobe convention (255 = no ink). APP14
    // transform 2 = YCCK (CMY channels YCbCr-coded; K direct); transform 0
    // or no Adobe marker = plain CMYK. RGB = C' * K' / 255 on the stored
    // (inverted) values — the same math PIL's CMYK;I load + convert("RGB")
    // performs (MULDIV255), so images agree within rounding.
    std::vector<uint8_t> p0, p1, p2, pk;
    jupsample(jd, jd.comp[0], p0, w, h);
    jupsample(jd, jd.comp[1], p1, w, h);
    jupsample(jd, jd.comp[2], p2, w, h);
    jupsample(jd, jd.comp[3], pk, w, h);
    const bool ycck = jd.app14_transform == 2;
    auto mul255 = [](int a, int b) {
      int t = a * b + 128;
      return (uint8_t)((t + (t >> 8)) >> 8);
    };
    auto clamp8 = [](long v) {
      return (int)(v < 0 ? 0 : (v > 255 ? 255 : v));
    };
    for (int y = 0; y < h; y++) {
      uint8_t* out = im->pixels + (size_t)y * w * 4;
      for (int x = 0; x < w; x++) {
        size_t i = (size_t)y * w + x;
        int sc = p0[i], sm = p1[i], sy = p2[i];
        if (ycck) {
          // YCbCr->RGB (same kernel as 3-component), then re-invert to the
          // stored-CMY convention (libjpeg ycck_cmyk_convert / stb order).
          double Y = p0[i], Cb = p1[i] - 128.0, Cr = p2[i] - 128.0;
          sc = 255 - clamp8(lround(Y + 1.40200 * Cr));
          sm = 255 - clamp8(lround(Y - 0.344136286 * Cb - 0.714136286 * Cr));
          sy = 255 - clamp8(lround(Y + 1.77200 * Cb));
        }
        int k = pk[i];
        out[x * 4 + 0] = mul255(sc, k);
        out[x * 4 + 1] = mul255(sm, k);
        out[x * 4 + 2] = mul255(sy, k);
        out[x * 4 + 3] = 255;
      }
    }
    return;
  }
  std::vector<uint8_t> yp, cb, cr;
  jupsample(jd, jd.comp[0], yp, w, h);
  jupsample(jd, jd.comp[1], cb, w, h);
  jupsample(jd, jd.comp[2], cr, w, h);
  for (int y = 0; y < h; y++) {
    uint8_t* out = im->pixels + (size_t)y * w * 4;
    for (int x = 0; x < w; x++) {
      size_t i = (size_t)y * w + x;
      double Y = yp[i], Cb = cb[i] - 128.0, Cr = cr[i] - 128.0;
      int r = (int)lround(Y + 1.40200 * Cr);
      int g = (int)lround(Y - 0.344136286 * Cb - 0.714136286 * Cr);
      int b = (int)lround(Y + 1.77200 * Cb);
      out[x * 4 + 0] = (uint8_t)(r < 0 ? 0 : (r > 255 ? 255 : r));
      out[x * 4 + 1] = (uint8_t)(g < 0 ? 0 : (g > 255 ? 255 : g));
      out[x * 4 + 2] = (uint8_t)(b < 0 ? 0 : (b > 255 ? 255 : b));
      out[x * 4 + 3] = 255;
    }
  }
}

}  // namespace dtr_jpeg

DtrImage* dtr_image_decode(const uint8_t* data, int64_t size) {
  auto* im = (DtrImage*)calloc(1, sizeof(DtrImage));
  if (size >= 8 && data[0] == 137 && data[1] == 'P') {
    decode_png(data, size, im);
  } else if (size >= 2 && data[0] == 'B' && data[1] == 'M') {
    decode_bmp(data, size, im);
  } else if (size >= 3 && data[0] == 0xFF && data[1] == 0xD8 &&
             data[2] == 0xFF) {
    dtr_jpeg::decode_jpeg(data, size, im);
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
