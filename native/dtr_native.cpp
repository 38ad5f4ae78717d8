// dtr_native: native asset pipeline for dtrenderer_tpu.
//
// Native counterpart of the reference's C/C++ asset path (SURVEY.md §2 #5, #8:
// hand-written Wavefront OBJ text parser and stb_image-based bitmap decoding).
// Implemented from scratch: OBJ tokenizer/parser, BMP (24/32 uncompressed),
// TGA (types 2/3/10, incl. RLE), and PNG (non-interlaced, 8-bit depth, all color
// types, via system zlib inflate). Exposed through a plain C ABI consumed with
// ctypes (assets/native.py) — no pybind dependency.
//
// Build: make -C native   ->  native/libdtr_native.so

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

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
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf rawlen = (uLongf)raw.size();
  int zr = uncompress(raw.data(), &rawlen, idat.data(), (uLong)idat.size());
  if (zr != Z_OK || rawlen != raw.size()) { img_err(im, "png: inflate failed"); return; }

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
