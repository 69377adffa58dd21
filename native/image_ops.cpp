// Native host-side image IO for aadg_tpu.
//
// The reference's data loading leans on PIL/OpenCV C libraries
// (SURVEY §2.4: "Image decode + PIL transforms"); this file owns that
// capability in-repo: a minimal PNG decoder (8-bit gray/RGB/RGBA,
// non-interlaced, zlib-inflated), PPM/PGM decode, and PIL-compatible
// separable resampling (Lanczos-3 / bilinear / nearest) used for the
// one-time dataset load into RAM. Exposed to Python via ctypes
// (aadg_tpu/data/native_io.py); build: `make -C native`.
//
// All functions return 0 on success, negative error codes otherwise.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Resampling (PIL convention: output pixel o samples input at
// (o + 0.5) / scale; support scaled by max(1, 1/scale) for antialiasing)
// ---------------------------------------------------------------------------

static inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return std::sin(px) / px;
}

static inline double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  return sinc(x) * sinc(x / 3.0);
}

static inline double triangle(double x) {
  double ax = std::fabs(x);
  return ax < 1.0 ? 1.0 - ax : 0.0;
}

typedef double (*kernel_fn)(double);

// Resample one axis: src (n_rows, src_len, ch) -> dst (n_rows, dst_len, ch)
// treating the middle dimension as the resampled axis.
static void resample_axis(const float* src, float* dst, int n_rows,
                          int src_len, int dst_len, int ch, kernel_fn k,
                          double support) {
  double scale = static_cast<double>(dst_len) / src_len;
  double filterscale = std::max(1.0, 1.0 / scale);
  double eff_support = support * filterscale;

  std::vector<int> bounds(dst_len * 2);
  std::vector<double> coeffs;
  std::vector<int> offsets(dst_len + 1, 0);

  for (int o = 0; o < dst_len; ++o) {
    double center = (o + 0.5) / scale;
    int lo = std::max(0, static_cast<int>(center - eff_support + 0.5));
    int hi = std::min(src_len,
                      static_cast<int>(center + eff_support + 0.5));
    bounds[2 * o] = lo;
    bounds[2 * o + 1] = hi;
    double sum = 0.0;
    size_t start = coeffs.size();
    for (int i = lo; i < hi; ++i) {
      double w = k((i + 0.5 - center) / filterscale);
      coeffs.push_back(w);
      sum += w;
    }
    if (sum != 0.0)
      for (size_t j = start; j < coeffs.size(); ++j) coeffs[j] /= sum;
    offsets[o + 1] = static_cast<int>(coeffs.size());
  }

  for (int r = 0; r < n_rows; ++r) {
    const float* srow = src + static_cast<size_t>(r) * src_len * ch;
    float* drow = dst + static_cast<size_t>(r) * dst_len * ch;
    for (int o = 0; o < dst_len; ++o) {
      int lo = bounds[2 * o];
      const double* cf = coeffs.data() + offsets[o];
      int n = offsets[o + 1] - offsets[o];
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0;
        for (int j = 0; j < n; ++j)
          acc += cf[j] * srow[(lo + j) * ch + c];
        drow[o * ch + c] = static_cast<float>(acc);
      }
    }
  }
}

// method: 0 = nearest, 1 = bilinear, 2 = lanczos3
int resize_u8(const uint8_t* src, int sh, int sw, int ch, uint8_t* dst,
              int dh, int dw, int method) {
  if (sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0 || ch <= 0) return -1;
  if (method == 0) {
    double sx = static_cast<double>(sw) / dw;
    double sy = static_cast<double>(sh) / dh;
    for (int y = 0; y < dh; ++y) {
      int iy = std::min(sh - 1, static_cast<int>((y + 0.5) * sy));
      for (int x = 0; x < dw; ++x) {
        int ix = std::min(sw - 1, static_cast<int>((x + 0.5) * sx));
        std::memcpy(dst + (static_cast<size_t>(y) * dw + x) * ch,
                    src + (static_cast<size_t>(iy) * sw + ix) * ch, ch);
      }
    }
    return 0;
  }
  kernel_fn k = method == 2 ? lanczos3 : triangle;
  double support = method == 2 ? 3.0 : 1.0;

  std::vector<float> fsrc(static_cast<size_t>(sh) * sw * ch);
  for (size_t i = 0; i < fsrc.size(); ++i) fsrc[i] = src[i];

  // horizontal pass: rows stay, width sw -> dw
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * ch);
  resample_axis(fsrc.data(), tmp.data(), sh, sw, dw, ch, k, support);
  // PIL quantizes the intermediate image to uint8 between the passes
  for (auto& v : tmp)
    v = static_cast<float>(
        std::min(255l, std::max(0l, std::lround(v))));

  // vertical pass: operate on the transposed view; rows = dw columns
  std::vector<float> tmp_t(static_cast<size_t>(dw) * sh * ch);
  for (int y = 0; y < sh; ++y)
    for (int x = 0; x < dw; ++x)
      for (int c = 0; c < ch; ++c)
        tmp_t[(static_cast<size_t>(x) * sh + y) * ch + c] =
            tmp[(static_cast<size_t>(y) * dw + x) * ch + c];

  std::vector<float> out_t(static_cast<size_t>(dw) * dh * ch);
  resample_axis(tmp_t.data(), out_t.data(), dw, sh, dh, ch, k, support);

  for (int x = 0; x < dw; ++x)
    for (int y = 0; y < dh; ++y)
      for (int c = 0; c < ch; ++c) {
        float v = out_t[(static_cast<size_t>(x) * dh + y) * ch + c];
        int q = static_cast<int>(std::lround(v));
        dst[(static_cast<size_t>(y) * dw + x) * ch + c] =
            static_cast<uint8_t>(std::min(255, std::max(0, q)));
      }
  return 0;
}

// ---------------------------------------------------------------------------
// PPM / PGM (P5, P6 binary)
// ---------------------------------------------------------------------------

static int skip_space(const uint8_t* buf, int len, int pos) {
  while (pos < len) {
    if (buf[pos] == '#') {
      while (pos < len && buf[pos] != '\n') ++pos;
    } else if (std::isspace(buf[pos])) {
      ++pos;
    } else {
      break;
    }
  }
  return pos;
}

static int read_int(const uint8_t* buf, int len, int* pos, int* out) {
  *pos = skip_space(buf, len, *pos);
  int v = 0, n = 0;
  while (*pos < len && std::isdigit(buf[*pos])) {
    v = v * 10 + (buf[*pos] - '0');
    ++(*pos);
    ++n;
  }
  if (n == 0) return -1;
  *out = v;
  return 0;
}

// Returns 0 and fills w/h/channels on success. Call with data=null to
// query the size, then again with a buffer of w*h*channels bytes.
int decode_pnm(const uint8_t* buf, int len, int* w, int* h, int* channels,
               uint8_t* data) {
  if (len < 2 || buf[0] != 'P') return -2;
  int ch;
  if (buf[1] == '6') ch = 3;
  else if (buf[1] == '5') ch = 1;
  else return -3;
  int pos = 2, maxval;
  if (read_int(buf, len, &pos, w)) return -4;
  if (read_int(buf, len, &pos, h)) return -4;
  if (read_int(buf, len, &pos, &maxval)) return -4;
  if (maxval > 255) return -5;
  ++pos;  // single whitespace after maxval
  *channels = ch;
  if (!data) return 0;
  size_t need = static_cast<size_t>(*w) * *h * ch;
  if (static_cast<size_t>(len - pos) < need) return -6;
  std::memcpy(data, buf + pos, need);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced)
// ---------------------------------------------------------------------------

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

int decode_png(const uint8_t* buf, int len, int* w, int* h, int* channels,
               uint8_t* data) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(buf, magic, 8) != 0) return -2;
  int pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // PLTE, 3 bytes per entry

  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const uint8_t* ctype = buf + pos + 4;
    const uint8_t* cdata = buf + pos + 8;
    if (pos + 12 + static_cast<int>(clen) > len) return -3;
    if (!std::memcmp(ctype, "IHDR", 4)) {
      width = be32(cdata);
      height = be32(cdata + 4);
      bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
    } else if (!std::memcmp(ctype, "PLTE", 4)) {
      palette.assign(cdata, cdata + clen);
    } else if (!std::memcmp(ctype, "IDAT", 4)) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (!std::memcmp(ctype, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (bit_depth != 8 || interlace != 0) return -4;
  int ch;
  switch (color_type) {
    case 0: ch = 1; break;   // gray
    case 2: ch = 3; break;   // rgb
    case 3: ch = 1; break;   // palette (expanded to rgb below -> 3)
    case 4: ch = 2; break;   // gray+alpha
    case 6: ch = 4; break;   // rgba
    default: return -5;
  }
  int out_ch = (color_type == 3) ? 3 : ch;
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  *channels = out_ch;
  if (!data) return 0;

  size_t stride = static_cast<size_t>(width) * ch;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return -6;

  // unfilter
  std::vector<uint8_t> img(stride * height);
  int bpp = ch;
  for (uint32_t y = 0; y < height; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* srow = raw.data() + y * (stride + 1) + 1;
    uint8_t* drow = img.data() + y * stride;
    const uint8_t* prow = y ? img.data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= static_cast<size_t>(bpp) ? drow[x - bpp] : 0;
      int b = prow ? prow[x] : 0;
      int c = (prow && x >= static_cast<size_t>(bpp)) ? prow[x - bpp] : 0;
      int v = srow[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -7;
      }
      drow[x] = static_cast<uint8_t>(v);
    }
  }

  if (color_type == 3) {  // expand palette
    if (palette.empty()) return -8;
    for (size_t i = 0; i < static_cast<size_t>(width) * height; ++i) {
      int idx = img[i] * 3;
      data[i * 3] = palette[idx];
      data[i * 3 + 1] = palette[idx + 1];
      data[i * 3 + 2] = palette[idx + 2];
    }
  } else {
    std::memcpy(data, img.data(), img.size());
  }
  return 0;
}

// Convert to RGB (drop alpha / replicate gray) and resize in one call —
// the dataset-load hot path (decode once into RAM, SURVEY §2.4).
int decode_resize_rgb(const uint8_t* buf, int len, int is_png, int dh,
                      int dw, int method, uint8_t* out) {
  int w, h, ch;
  int rc = is_png ? decode_png(buf, len, &w, &h, &ch, nullptr)
                  : decode_pnm(buf, len, &w, &h, &ch, nullptr);
  if (rc) return rc;
  std::vector<uint8_t> raw(static_cast<size_t>(w) * h *
                           (ch == 1 && is_png ? 1 : ch));
  rc = is_png ? decode_png(buf, len, &w, &h, &ch, raw.data())
              : decode_pnm(buf, len, &w, &h, &ch, raw.data());
  if (rc) return rc;

  std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
  if (ch == 3) {
    rgb.assign(raw.begin(), raw.end());
  } else if (ch == 1) {
    for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i)
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = raw[i];
  } else if (ch == 4 || ch == 2) {
    int stride = ch;
    for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i) {
      if (ch == 4) {
        rgb[i * 3] = raw[i * stride];
        rgb[i * 3 + 1] = raw[i * stride + 1];
        rgb[i * 3 + 2] = raw[i * stride + 2];
      } else {
        rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = raw[i * stride];
      }
    }
  }
  return resize_u8(rgb.data(), h, w, 3, out, dh, dw, method);
}

}  // extern "C"
