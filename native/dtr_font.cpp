// dtr_font: from-scratch TrueType parser + anti-aliased glyph rasterizer + ASCII
// atlas baker. Native counterpart of the reference's stb_truetype usage
// (SURVEY.md §2 #5/#9: bake TTF glyph atlas -> DTRFont {bitmap, glyph metrics}),
// implemented independently: offset table -> cmap (formats 4/12) -> loca/glyf
// (simple + translate/scale composites) -> quadratic-bezier flattening ->
// non-zero-winding scanline fill with 4x vertical supersampling and exact
// horizontal coverage.
//
// Built into libdtr_native.so alongside dtr_native.cpp (see Makefile).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <exception>
#include <vector>

namespace {

struct Reader {
  const uint8_t* d;
  int64_t n;
  bool ok(int64_t off, int64_t len) const { return off >= 0 && off + len <= n; }
  uint8_t u8(int64_t o) const { return ok(o, 1) ? d[o] : 0; }
  uint16_t u16(int64_t o) const {
    return ok(o, 2) ? (uint16_t)((d[o] << 8) | d[o + 1]) : 0;
  }
  int16_t s16(int64_t o) const { return (int16_t)u16(o); }
  uint32_t u32(int64_t o) const {
    return ok(o, 4) ? ((uint32_t)d[o] << 24) | ((uint32_t)d[o + 1] << 16) |
                          ((uint32_t)d[o + 2] << 8) | d[o + 3]
                    : 0;
  }
};

struct Edge {
  float x0, y0, x1, y1;  // y0 < y1 after normalization
  int dir;               // +1 if original segment goes downward (y increasing)
};

struct GlyphOutline {
  std::vector<Edge> edges;
  float xmin = 1e30f, xmax = -1e30f, ymin = 1e30f, ymax = -1e30f;
};

struct Font {
  Reader r;
  int64_t glyf = -1, loca = -1, cmap = -1, head = -1, maxp = -1, hhea = -1,
          hmtx = -1;
  int units_per_em = 1000;
  int loc_format = 0;
  int num_glyphs = 0;
  int num_hmetrics = 0;
  int ascent = 0, descent = 0;
};

bool font_init(Font* f, const uint8_t* data, int64_t n) {
  f->r = Reader{data, n};
  const Reader& r = f->r;
  uint32_t tag = r.u32(0);
  int64_t base = 0;
  if (tag == 0x74746366) {  // 'ttcf' collection: use first font
    base = r.u32(12);
    tag = r.u32(base);
  }
  if (tag != 0x00010000 && tag != 0x74727565) return false;  // 1.0 or 'true'
  int num_tables = r.u16(base + 4);
  for (int i = 0; i < num_tables; i++) {
    int64_t rec = base + 12 + 16 * i;
    uint32_t t = r.u32(rec);
    int64_t off = r.u32(rec + 8);
    int64_t len = r.u32(rec + 12);
    // A table whose bytes lie outside the buffer (truncated/corrupt file) is
    // treated as absent, so required-table checks below reject the font.
    if (!r.ok(off, len)) continue;
    switch (t) {
      case 0x676C7966: f->glyf = off; break;  // glyf
      case 0x6C6F6361: f->loca = off; break;  // loca
      case 0x636D6170: f->cmap = off; break;  // cmap
      case 0x68656164: f->head = off; break;  // head
      case 0x6D617870: f->maxp = off; break;  // maxp
      case 0x68686561: f->hhea = off; break;  // hhea
      case 0x686D7478: f->hmtx = off; break;  // hmtx
    }
  }
  if (f->glyf < 0 || f->loca < 0 || f->cmap < 0 || f->head < 0 || f->maxp < 0)
    return false;
  f->units_per_em = r.u16(f->head + 18);
  if (f->units_per_em == 0) f->units_per_em = 1000;
  f->loc_format = r.s16(f->head + 50);
  f->num_glyphs = r.u16(f->maxp + 4);
  if (f->hhea >= 0) {
    f->ascent = r.s16(f->hhea + 4);
    f->descent = r.s16(f->hhea + 6);
    f->num_hmetrics = r.u16(f->hhea + 34);
  }
  return true;
}

int cmap_lookup(const Font* f, uint32_t cp) {
  const Reader& r = f->r;
  int n = r.u16(f->cmap + 2);
  int64_t best = -1;
  for (int i = 0; i < n; i++) {
    int64_t rec = f->cmap + 4 + 8 * i;
    uint16_t plat = r.u16(rec);
    uint16_t enc = r.u16(rec + 2);
    int64_t sub = f->cmap + r.u32(rec + 4);
    uint16_t fmt = r.u16(sub);
    bool unicode = (plat == 0) || (plat == 3 && (enc == 1 || enc == 10));
    if (!unicode) continue;
    if (fmt == 4 || fmt == 12) best = sub;
    if (fmt == 4 && cp <= 0xFFFF) { best = sub; break; }
  }
  if (best < 0) return 0;
  uint16_t fmt = r.u16(best);
  if (fmt == 4) {
    int segs = r.u16(best + 6) / 2;
    int64_t end_codes = best + 14;
    int64_t start_codes = end_codes + segs * 2 + 2;
    int64_t deltas = start_codes + segs * 2;
    int64_t ranges = deltas + segs * 2;
    for (int s = 0; s < segs; s++) {
      if (cp <= r.u16(end_codes + 2 * s)) {
        uint16_t start = r.u16(start_codes + 2 * s);
        if (cp < start) return 0;
        uint16_t ro = r.u16(ranges + 2 * s);
        if (ro == 0)
          return (uint16_t)(cp + r.u16(deltas + 2 * s));
        int64_t gi = ranges + 2 * s + ro + 2 * (cp - start);
        uint16_t g = r.u16(gi);
        return g ? (uint16_t)(g + r.u16(deltas + 2 * s)) : 0;
      }
    }
    return 0;
  }
  if (fmt == 12) {
    uint32_t ngroups = r.u32(best + 12);
    for (uint32_t g = 0; g < ngroups; g++) {
      int64_t rec = best + 16 + 12 * g;
      uint32_t s = r.u32(rec), e = r.u32(rec + 4), gi = r.u32(rec + 8);
      if (cp >= s && cp <= e) return (int)(gi + (cp - s));
    }
  }
  return 0;
}

void glyph_range(const Font* f, int gid, int64_t* off, int64_t* len) {
  const Reader& r = f->r;
  int64_t a, b;
  if (f->loc_format == 0) {
    a = 2 * (int64_t)r.u16(f->loca + 2 * gid);
    b = 2 * (int64_t)r.u16(f->loca + 2 * gid + 2);
  } else {
    a = r.u32(f->loca + 4 * gid);
    b = r.u32(f->loca + 4 * gid + 4);
  }
  *off = f->glyf + a;
  *len = b - a;
}

void add_line(GlyphOutline* o, float x0, float y0, float x1, float y1) {
  if (y0 == y1) return;
  Edge e;
  if (y0 < y1) {
    e = {x0, y0, x1, y1, +1};
  } else {
    e = {x1, y1, x0, y0, -1};
  }
  o->edges.push_back(e);
  o->xmin = std::min({o->xmin, x0, x1});
  o->xmax = std::max({o->xmax, x0, x1});
  o->ymin = std::min({o->ymin, y0, y1});
  o->ymax = std::max({o->ymax, y0, y1});
}

void add_quad(GlyphOutline* o, float x0, float y0, float cx, float cy, float x1,
              float y1) {
  const int STEPS = 8;
  float px = x0, py = y0;
  for (int i = 1; i <= STEPS; i++) {
    float t = (float)i / STEPS;
    float mt = 1 - t;
    float x = mt * mt * x0 + 2 * mt * t * cx + t * t * x1;
    float y = mt * mt * y0 + 2 * mt * t * cy + t * t * y1;
    add_line(o, px, py, x, y);
    px = x;
    py = y;
  }
}

// Decode one glyph's outline (scaled by sx, sy; translated by dx, dy),
// recursing into composites.
void decode_glyph(const Font* f, int gid, float scale, float dx, float dy,
                  float cscale_x, float cscale_y, GlyphOutline* out,
                  int depth) {
  if (depth > 5 || gid < 0 || gid >= f->num_glyphs) return;
  const Reader& r = f->r;
  int64_t off, len;
  glyph_range(f, gid, &off, &len);
  if (len <= 0) return;  // empty glyph (e.g. space)
  int ncont = r.s16(off);
  if (ncont >= 0) {
    // simple glyph
    int64_t p = off + 10;
    std::vector<int> ends(ncont);
    for (int i = 0; i < ncont; i++) ends[i] = r.u16(p + 2 * i);
    int npts = ncont ? ends[ncont - 1] + 1 : 0;
    p += 2 * ncont;
    int ilen = r.u16(p);
    p += 2 + ilen;
    // flags
    std::vector<uint8_t> flags;
    flags.reserve(npts);
    while ((int)flags.size() < npts) {
      uint8_t fl = r.u8(p++);
      flags.push_back(fl);
      if (fl & 8) {
        int rep = r.u8(p++);
        for (int k = 0; k < rep; k++) flags.push_back(fl);
      }
    }
    // x coords
    std::vector<float> xs(npts), ys(npts);
    int x = 0;
    for (int i = 0; i < npts; i++) {
      uint8_t fl = flags[i];
      if (fl & 2) {
        int d8 = r.u8(p++);
        x += (fl & 16) ? d8 : -d8;
      } else if (!(fl & 16)) {
        x += r.s16(p);
        p += 2;
      }
      xs[i] = (float)x;
    }
    int y = 0;
    for (int i = 0; i < npts; i++) {
      uint8_t fl = flags[i];
      if (fl & 4) {
        int d8 = r.u8(p++);
        y += (fl & 32) ? d8 : -d8;
      } else if (!(fl & 32)) {
        y += r.s16(p);
        p += 2;
      }
      ys[i] = (float)y;
    }
    auto X = [&](int i) { return dx + scale * cscale_x * xs[i]; };
    auto Y = [&](int i) { return dy + scale * cscale_y * ys[i]; };
    int start = 0;
    for (int c = 0; c < ncont; c++) {
      int end = ends[c];
      int cn = end - start + 1;
      if (cn <= 1) { start = end + 1; continue; }
      // find a starting on-curve point (or synthesize midpoint)
      int s0 = -1;
      for (int i = start; i <= end; i++)
        if (flags[i] & 1) { s0 = i; break; }
      float sx0, sy0;
      if (s0 < 0) {  // all off-curve: start at midpoint of first two
        sx0 = (X(start) + X(end)) * 0.5f;
        sy0 = (Y(start) + Y(end)) * 0.5f;
      } else {
        sx0 = X(s0);
        sy0 = Y(s0);
      }
      float px = sx0, py = sy0;
      float ctrlx = 0, ctrly = 0;
      bool have_ctrl = false;
      for (int k = 1; k <= cn; k++) {
        int i = (s0 < 0 ? start : s0) + k;
        int idx = start + ((i - start) % cn);
        bool on = flags[idx] & 1;
        float cxp = X(idx), cyp = Y(idx);
        if (on) {
          if (have_ctrl) {
            add_quad(out, px, py, ctrlx, ctrly, cxp, cyp);
            have_ctrl = false;
          } else {
            add_line(out, px, py, cxp, cyp);
          }
          px = cxp;
          py = cyp;
        } else {
          if (have_ctrl) {
            float mx = (ctrlx + cxp) * 0.5f, my = (ctrly + cyp) * 0.5f;
            add_quad(out, px, py, ctrlx, ctrly, mx, my);
            px = mx;
            py = my;
          }
          ctrlx = cxp;
          ctrly = cyp;
          have_ctrl = true;
        }
      }
      if (have_ctrl)
        add_quad(out, px, py, ctrlx, ctrly, sx0, sy0);
      else
        add_line(out, px, py, sx0, sy0);
      start = end + 1;
    }
  } else {
    // composite glyph
    int64_t p = off + 10;
    while (true) {
      uint16_t flags_c = r.u16(p);
      uint16_t cgid = r.u16(p + 2);
      p += 4;
      float cdx = 0, cdy = 0;
      if (flags_c & 1) {  // words
        if (flags_c & 2) {
          cdx = r.s16(p);
          cdy = r.s16(p + 2);
        }
        p += 4;
      } else {
        if (flags_c & 2) {
          cdx = (int8_t)r.u8(p);
          cdy = (int8_t)r.u8(p + 1);
        }
        p += 2;
      }
      float sx = 1, sy = 1;
      if (flags_c & 8) {  // single scale (F2Dot14)
        sx = sy = r.s16(p) / 16384.0f;
        p += 2;
      } else if (flags_c & 0x40) {  // x & y scale
        sx = r.s16(p) / 16384.0f;
        sy = r.s16(p + 2) / 16384.0f;
        p += 4;
      } else if (flags_c & 0x80) {  // 2x2 matrix: use diagonal only (approx)
        sx = r.s16(p) / 16384.0f;
        sy = r.s16(p + 6) / 16384.0f;
        p += 8;
      }
      decode_glyph(f, cgid, scale, dx + scale * cscale_x * cdx,
                   dy + scale * cscale_y * cdy, cscale_x * sx, cscale_y * sy,
                   out, depth + 1);
      if (!(flags_c & 0x20)) break;  // MORE_COMPONENTS
    }
  }
}

// Rasterize outline into an alpha bitmap [h, w] with 4x vertical supersampling
// and exact horizontal span coverage; non-zero winding rule. Outline is in a
// y-DOWN pixel coordinate system.
void rasterize(const GlyphOutline& o, uint8_t* out, int w, int h) {
  memset(out, 0, (size_t)w * h);
  if (o.edges.empty()) return;
  const int SS = 4;
  std::vector<float> cov(w);
  struct Hit {
    float x;
    int dir;
  };
  std::vector<Hit> hits;
  for (int py = 0; py < h; py++) {
    std::fill(cov.begin(), cov.end(), 0.0f);
    for (int s = 0; s < SS; s++) {
      float sy = py + (s + 0.5f) / SS;
      hits.clear();
      for (const Edge& e : o.edges) {
        if (sy < e.y0 || sy >= e.y1) continue;
        float t = (sy - e.y0) / (e.y1 - e.y0);
        hits.push_back({e.x0 + t * (e.x1 - e.x0), e.dir});
      }
      if (hits.empty()) continue;
      std::sort(hits.begin(), hits.end(),
                [](const Hit& a, const Hit& b) { return a.x < b.x; });
      int winding = 0;
      float span_start = 0;
      for (const Hit& hset : hits) {
        int prev = winding;
        winding += hset.dir;
        if (prev == 0 && winding != 0) {
          span_start = hset.x;
        } else if (prev != 0 && winding == 0) {
          // accumulate [span_start, h.x) horizontal coverage
          float xa = std::max(span_start, 0.0f);
          float xb = std::min(hset.x, (float)w);
          if (xb <= xa) continue;
          int ix0 = (int)xa, ix1 = (int)std::ceil(xb) - 1;
          for (int ix = ix0; ix <= ix1 && ix < w; ix++) {
            float l = std::max(xa, (float)ix);
            float rr = std::min(xb, (float)ix + 1);
            if (rr > l) cov[ix] += (rr - l) / SS;
          }
        }
      }
    }
    uint8_t* row = out + (size_t)py * w;
    for (int ix = 0; ix < w; ix++) {
      float c = cov[ix];
      row[ix] = (uint8_t)(std::min(c, 1.0f) * 255.0f + 0.5f);
    }
  }
}

}  // namespace

extern "C" {

struct DtrFontAtlas {
  uint8_t* atlas;      // [atlas_h * atlas_w] coverage
  int32_t atlas_w, atlas_h;
  int32_t cell_w, cell_h;
  int32_t first_char, num_chars, grid_cols;
  float* metrics;      // [num_chars * 4]: advance, bearing_x, bearing_y(top), used
  float ascent_px;
  char error[256];
};

static DtrFontAtlas* dtr_font_bake_impl(DtrFontAtlas* a, const uint8_t* data,
                                        int64_t n, float pixel_size,
                                        int32_t first_char, int32_t num_chars,
                                        int32_t grid_cols);

DtrFontAtlas* dtr_font_bake(const uint8_t* data, int64_t n, float pixel_size,
                            int32_t first_char, int32_t num_chars,
                            int32_t grid_cols) {
  auto* a = (DtrFontAtlas*)calloc(1, sizeof(DtrFontAtlas));
  if (!a) return nullptr;
  // A corrupt TTF must produce an error field, never crash the host process:
  // all glyph-derived sizes are bounded below and the body cannot throw across
  // the extern "C" boundary.
  try {
    return dtr_font_bake_impl(a, data, n, pixel_size, first_char, num_chars,
                              grid_cols);
  } catch (const std::exception& e) {
    snprintf(a->error, sizeof(a->error), "ttf: %s", e.what());
    free(a->atlas); free(a->metrics);
    a->atlas = nullptr; a->metrics = nullptr;
    return a;
  } catch (...) {
    snprintf(a->error, sizeof(a->error), "ttf: internal error");
    free(a->atlas); free(a->metrics);
    a->atlas = nullptr; a->metrics = nullptr;
    return a;
  }
}

static DtrFontAtlas* dtr_font_bake_impl(DtrFontAtlas* a, const uint8_t* data,
                                        int64_t n, float pixel_size,
                                        int32_t first_char, int32_t num_chars,
                                        int32_t grid_cols) {
  Font f;
  if (!font_init(&f, data, n)) {
    snprintf(a->error, sizeof(a->error), "ttf: unsupported or corrupt font");
    return a;
  }
  if (num_chars <= 0 || num_chars > 65536 || grid_cols <= 0 ||
      pixel_size <= 0.0f || pixel_size > 4096.0f) {
    snprintf(a->error, sizeof(a->error), "ttf: bad bake parameters");
    return a;
  }
  float scale = pixel_size / (float)f.units_per_em;
  float ascent_px = f.ascent * scale;
  float descent_px = -f.descent * scale;  // descent stored negative
  int cell_h = (int)std::ceil(ascent_px + descent_px) + 2;
  // Pass 1: measure widest advance/bbox.
  int cell_w = 1;
  std::vector<GlyphOutline> outlines(num_chars);
  std::vector<float> adv(num_chars), bx(num_chars);
  for (int i = 0; i < num_chars; i++) {
    int cp = first_char + i;
    int gid = cmap_lookup(&f, (uint32_t)cp);
    // advance from hmtx
    float advance = pixel_size * 0.5f;
    if (f.hmtx >= 0 && f.num_hmetrics > 0) {
      int mi = gid < f.num_hmetrics ? gid : f.num_hmetrics - 1;
      advance = f.r.u16(f.hmtx + 4 * mi) * scale;
    }
    adv[i] = advance;
    GlyphOutline* o = &outlines[i];
    // decode in font units, y-up; flip to y-down pixel space:
    // pixel_y = ascent_px - y*scale ; pixel_x = x*scale
    GlyphOutline tmp;
    decode_glyph(&f, gid, scale, 0.0f, 0.0f, 1.0f, 1.0f, &tmp, 0);
    for (const Edge& e : tmp.edges) {
      // Recover the original direction of travel, then flip y (y-up font space
      // -> y-down pixel space); add_line re-normalizes and re-derives winding.
      float ax, ay, bxx, byy;
      if (e.dir > 0) {
        ax = e.x0; ay = e.y0; bxx = e.x1; byy = e.y1;
      } else {
        ax = e.x1; ay = e.y1; bxx = e.x0; byy = e.y0;
      }
      add_line(o, ax, ascent_px - ay, bxx, ascent_px - byy);
    }
    if (!o->edges.empty()) {
      cell_w = std::max(cell_w, (int)std::ceil(o->xmax) + 1);
    }
    cell_w = std::max(cell_w, (int)std::ceil(advance));
    bx[i] = 0.0f;
  }
  int rows = (num_chars + grid_cols - 1) / grid_cols;
  // cell_w/cell_h derive from attacker-controllable glyph coordinates: bound
  // them (and the atlas) so int32 dims cannot overflow and a corrupt font
  // cannot demand an absurd allocation.
  if (cell_w <= 0 || cell_w > 4096 || cell_h <= 0 || cell_h > 4096 ||
      (int64_t)cell_w * grid_cols > 65536 || (int64_t)cell_h * rows > 65536 ||
      (int64_t)cell_w * grid_cols * cell_h * rows > (int64_t)1 << 28) {
    snprintf(a->error, sizeof(a->error),
             "ttf: atlas dimensions out of bounds (cell %dx%d, grid %dx%d)",
             cell_w, cell_h, grid_cols, rows);
    return a;
  }
  a->cell_w = cell_w;
  a->cell_h = cell_h;
  a->atlas_w = cell_w * grid_cols;
  a->atlas_h = cell_h * rows;
  a->first_char = first_char;
  a->num_chars = num_chars;
  a->grid_cols = grid_cols;
  a->ascent_px = ascent_px;
  a->atlas = (uint8_t*)calloc(1, (size_t)a->atlas_w * a->atlas_h);
  a->metrics = (float*)calloc((size_t)num_chars * 4, sizeof(float));
  if (!a->atlas || !a->metrics) {
    free(a->atlas); free(a->metrics);
    a->atlas = nullptr; a->metrics = nullptr;
    snprintf(a->error, sizeof(a->error), "ttf: atlas allocation failed");
    return a;
  }
  std::vector<uint8_t> cell((size_t)cell_w * cell_h);
  for (int i = 0; i < num_chars; i++) {
    rasterize(outlines[i], cell.data(), cell_w, cell_h);
    int cx = (i % grid_cols) * cell_w;
    int cy = (i / grid_cols) * cell_h;
    for (int y = 0; y < cell_h; y++)
      memcpy(a->atlas + (size_t)(cy + y) * a->atlas_w + cx,
             cell.data() + (size_t)y * cell_w, cell_w);
    a->metrics[i * 4 + 0] = adv[i];
    a->metrics[i * 4 + 1] = bx[i];
    a->metrics[i * 4 + 2] = ascent_px;
    a->metrics[i * 4 + 3] = 1.0f;
  }
  return a;
}

DtrFontAtlas* dtr_font_bake_file(const char* path, float pixel_size,
                                 int32_t first_char, int32_t num_chars,
                                 int32_t grid_cols) {
  FILE* fp = fopen(path, "rb");
  if (!fp) {
    auto* a = (DtrFontAtlas*)calloc(1, sizeof(DtrFontAtlas));
    snprintf(a->error, sizeof(a->error), "cannot open %s", path);
    return a;
  }
  fseek(fp, 0, SEEK_END);
  long sz = ftell(fp);
  fseek(fp, 0, SEEK_SET);
  auto* buf = (uint8_t*)malloc(sz > 0 ? sz : 1);
  size_t rd = fread(buf, 1, sz, fp);
  fclose(fp);
  DtrFontAtlas* a = dtr_font_bake(buf, (int64_t)rd, pixel_size, first_char,
                                  num_chars, grid_cols);
  free(buf);
  return a;
}

void dtr_font_free(DtrFontAtlas* a) {
  if (!a) return;
  free(a->atlas);
  free(a->metrics);
  free(a);
}

}  // extern "C"
