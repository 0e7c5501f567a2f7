// First-party native image runtime for the SynFMC-TPU data loader.
//
// The reference's data path leans on third-party native code (PIL's C
// decoder + resampler, reference fmc/data/dataset.py:2149-2174 image reads;
// mask reads at fmc/data/dataset.py:330-341).  This module is the
// first-party equivalent: libpng decode + a bit-exact reimplementation of
// Pillow's fixed-point BILINEAR resampler + a std::thread batch API that
// decodes a whole 16-frame clip in parallel OUTSIDE the GIL — so one loader
// worker process saturates several cores on PNG decode.
//
// Exactness contract (tested in tests/test_native_image.py):
//   * decode: byte-identical to np.array(PIL.Image.open(path)) for
//     gray8 / RGB8 / RGBA8 PNGs (the formats SynFMC ships);
//   * resize: byte-identical to PIL's Image.resize(BILINEAR) — same
//     coefficient windows, same INT32 fixed-point accumulation
//     (PRECISION_BITS = 22), same uint8 intermediate between the
//     horizontal and vertical passes.
//
// Anything else (palette, 16-bit, interlaced oddities) returns an error and
// the Python caller falls back to PIL for that file.

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Pillow-exact BILINEAR resampling (see Pillow src/libImaging/Resample.c).
// ---------------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;

inline uint8_t clip8(int in) {
  if (in >= (1 << PRECISION_BITS << 8)) return 255;
  if (in <= 0) return 0;
  return (uint8_t)(in >> PRECISION_BITS);
}

inline double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  if (x < 1.0) return 1.0 - x;
  return 0.0;
}

// Coefficient windows for one axis: in_size -> out_size.
// bounds[2*xx] = xmin, bounds[2*xx+1] = xmax (count); kk is (out_size, ksize)
// INT32 fixed-point.  Mirrors Pillow precompute_coeffs + normalize_coeffs_8bpc.
int precompute_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                      std::vector<int>* kk) {
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = filterscale;  // bilinear support 1.0 * filterscale
  int ksize = (int)std::ceil(support) * 2 + 1;

  bounds->assign((size_t)out_size * 2, 0);
  kk->assign((size_t)out_size * ksize, 0);
  std::vector<double> k(ksize);

  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; x++) {
      double w = bilinear_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; x++) {
      if (ww != 0.0) k[x] /= ww;
    }
    int* krow = kk->data() + (size_t)xx * ksize;
    for (int x = 0; x < xmax; x++) {
      double v = k[x] * (1 << PRECISION_BITS);
      krow[x] = (int)(v < 0 ? v - 0.5 : v + 0.5);
    }
    (*bounds)[2 * xx] = xmin;
    (*bounds)[2 * xx + 1] = xmax;
  }
  return ksize;
}

// Horizontal pass: (h, in_w, c) uint8 -> (h, out_w, c) uint8.
void resample_horizontal(const uint8_t* in, int h, int in_w, int c,
                         uint8_t* out, int out_w, const std::vector<int>& bounds,
                         const std::vector<int>& kk, int ksize) {
  for (int yy = 0; yy < h; yy++) {
    const uint8_t* irow = in + (size_t)yy * in_w * c;
    uint8_t* orow = out + (size_t)yy * out_w * c;
    for (int xx = 0; xx < out_w; xx++) {
      int xmin = bounds[2 * xx], xmax = bounds[2 * xx + 1];
      const int* krow = kk.data() + (size_t)xx * ksize;
      for (int ch = 0; ch < c; ch++) {
        int ss0 = 1 << (PRECISION_BITS - 1);
        for (int x = 0; x < xmax; x++)
          ss0 += (int)irow[(size_t)(xmin + x) * c + ch] * krow[x];
        orow[(size_t)xx * c + ch] = clip8(ss0);
      }
    }
  }
}

// Vertical pass: (in_h, w, c) uint8 -> (out_h, w, c) uint8.
void resample_vertical(const uint8_t* in, int in_h, int w, int c, uint8_t* out,
                       int out_h, const std::vector<int>& bounds,
                       const std::vector<int>& kk, int ksize) {
  for (int yy = 0; yy < out_h; yy++) {
    int ymin = bounds[2 * yy], ymax = bounds[2 * yy + 1];
    const int* krow = kk.data() + (size_t)yy * ksize;
    uint8_t* orow = out + (size_t)yy * w * c;
    for (int xx = 0; xx < w * c; xx++) {
      int ss0 = 1 << (PRECISION_BITS - 1);
      for (int y = 0; y < ymax; y++)
        ss0 += (int)in[(size_t)(ymin + y) * w * c + xx] * krow[y];
      orow[xx] = clip8(ss0);
    }
  }
}

// PIL order (Resample.c ImagingResampleInner): horizontal, then vertical,
// with a uint8 intermediate (the horizontal result is clip8-quantized
// before the vertical pass reads it).
void resize_bilinear_u8(const uint8_t* in, int in_h, int in_w, int c,
                        uint8_t* out, int out_h, int out_w) {
  std::vector<int> xb, xk, yb, yk;
  int xks = precompute_coeffs(in_w, out_w, &xb, &xk);
  int yks = precompute_coeffs(in_h, out_h, &yb, &yk);
  if (in_w == out_w && in_h == out_h) {
    std::memcpy(out, in, (size_t)in_h * in_w * c);
    return;
  }
  if (in_w == out_w) {
    resample_vertical(in, in_h, in_w, c, out, out_h, yb, yk, yks);
    return;
  }
  std::vector<uint8_t> tmp((size_t)in_h * out_w * c);
  resample_horizontal(in, in_h, in_w, c, tmp.data(), out_w, xb, xk, xks);
  if (in_h == out_h) {
    std::memcpy(out, tmp.data(), tmp.size());
    return;
  }
  resample_vertical(tmp.data(), in_h, out_w, c, out, out_h, yb, yk, yks);
}

// ---------------------------------------------------------------------------
// PNG decode (libpng simplified API).
// ---------------------------------------------------------------------------

// Decode `path` into RGB8 (alpha dropped like PIL convert('RGB'), gray
// duplicated).  On success fills w/h and the pixel vector.  Returns 0 ok.
int decode_rgb(const char* path, std::vector<uint8_t>* pixels, int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  bool has_alpha = (image.format & PNG_FORMAT_FLAG_ALPHA) != 0;
  // Palette sources: PIL would return indices from np.array but converts to
  // RGB for the pixel path; RGB expansion here matches convert('RGB') only
  // without tRNS — decline palette to stay byte-exact via the PIL fallback.
  if (image.format & PNG_FORMAT_FLAG_COLORMAP) {
    png_image_free(&image);
    return 2;
  }
  image.format = has_alpha ? PNG_FORMAT_RGBA : PNG_FORMAT_RGB;
  *w = image.width;
  *h = image.height;
  std::vector<uint8_t> buf(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) return 1;
  if (!has_alpha) {
    *pixels = std::move(buf);
  } else {  // drop alpha (PIL convert('RGB') discards it, no compositing)
    pixels->resize((size_t)*w * *h * 3);
    const uint8_t* s = buf.data();
    uint8_t* d = pixels->data();
    for (size_t i = 0, n = (size_t)*w * *h; i < n; i++) {
      d[3 * i] = s[4 * i];
      d[3 * i + 1] = s[4 * i + 1];
      d[3 * i + 2] = s[4 * i + 2];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Minimum enclosing circle (cv2.minEnclosingCircle replacement; the hot call
// in sphere_gaussian_mask, reference fmc/data/dataset.py:5350-5404).
// Row-extreme reduction -> monotone-chain hull -> Welzl with move-to-front.
// ---------------------------------------------------------------------------

struct Pt {
  double x, y;
};

double cross3(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

double dist2(const Pt& a, const Pt& b) {
  double dx = a.x - b.x, dy = a.y - b.y;
  return dx * dx + dy * dy;
}

struct Circle {
  Pt c;
  double r2;  // squared radius
};

bool in_circle(const Circle& c, const Pt& p) {
  // matches the Python tolerance |p-c| <= r + 1e-9
  double r = std::sqrt(c.r2);
  return std::sqrt(dist2(c.c, p)) <= r + 1e-9;
}

Circle circle2(const Pt& a, const Pt& b) {
  Pt c{(a.x + b.x) / 2, (a.y + b.y) / 2};
  return {c, dist2(c, a)};
}

Circle circle3(const Pt& a, const Pt& b, const Pt& c) {
  double d = 2 * (a.x * (b.y - c.y) + b.x * (c.y - a.y) + c.x * (a.y - b.y));
  if (std::fabs(d) < 1e-12) {  // collinear: farthest pair
    double ab = dist2(a, b), ac = dist2(a, c), bc = dist2(b, c);
    if (ab >= ac && ab >= bc) return circle2(a, b);
    if (ac >= bc) return circle2(a, c);
    return circle2(b, c);
  }
  double a2 = a.x * a.x + a.y * a.y, b2 = b.x * b.x + b.y * b.y,
         c2 = c.x * c.x + c.y * c.y;
  Pt u{(a2 * (b.y - c.y) + b2 * (c.y - a.y) + c2 * (a.y - b.y)) / d,
       (a2 * (c.x - b.x) + b2 * (a.x - c.x) + c2 * (b.x - a.x)) / d};
  return {u, dist2(u, a)};
}

Circle welzl_mtf(std::vector<Pt>& pts) {
  // deterministic shuffle (fixed LCG) + iterative move-to-front Welzl
  uint64_t s = 0x9E3779B97F4A7C15ull;
  for (size_t i = pts.size(); i > 1; i--) {
    s = s * 6364136223846793005ull + 1442695040888963407ull;
    std::swap(pts[i - 1], pts[(size_t)(s >> 33) % i]);
  }
  Circle c{pts[0], 0.0};
  for (size_t i = 1; i < pts.size(); i++) {
    if (in_circle(c, pts[i])) continue;
    c = {pts[i], 0.0};
    for (size_t j = 0; j < i; j++) {
      if (in_circle(c, pts[j])) continue;
      c = circle2(pts[i], pts[j]);
      for (size_t k = 0; k < j; k++) {
        if (in_circle(c, pts[k])) continue;
        c = circle3(pts[i], pts[j], pts[k]);
      }
    }
  }
  return c;
}

struct BatchResult {
  std::atomic<int> first_error{-1};
};

}  // namespace

extern "C" {

// Header-only probe: returns 0 and fills (w, h, channels) where channels is
// the channel count np.array(PIL.Image.open) would produce (1 gray, 3 RGB,
// 4 RGBA).  Nonzero return = unsupported (palette / 16-bit) or IO error.
int sfi_png_info(const char* path, int* w, int* h, int* channels) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  int rc = 0;
  if (image.format & PNG_FORMAT_FLAG_COLORMAP) {
    rc = 2;  // palette: PIL returns indices; defer to PIL
  } else if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    rc = 3;  // 16-bit: PIL returns uint16/I;16; defer to PIL
  } else {
    *w = (int)image.width;
    *h = (int)image.height;
    int c = (image.format & PNG_FORMAT_FLAG_COLOR) ? 3 : 1;
    if (image.format & PNG_FORMAT_FLAG_ALPHA) c += 1;
    *channels = c;
  }
  png_image_free(&image);
  return rc;
}

// Decode in the file's natural channel layout (as reported by sfi_png_info)
// into caller-allocated `out` of exactly w*h*channels bytes.  Byte-identical
// to np.array(PIL.Image.open(path)) for gray8/RGB8/RGBA8.
int sfi_png_decode(const char* path, uint8_t* out, int w, int h, int channels) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  if ((int)image.width != w || (int)image.height != h) {
    png_image_free(&image);
    return 4;
  }
  switch (channels) {
    case 1: image.format = PNG_FORMAT_GRAY; break;
    case 2: image.format = PNG_FORMAT_GA; break;
    case 3: image.format = PNG_FORMAT_RGB; break;
    case 4: image.format = PNG_FORMAT_RGBA; break;
    default: png_image_free(&image); return 5;
  }
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) return 1;
  return 0;
}

// Decode `n` PNGs, PIL-exact-BILINEAR-resize each to (out_h, out_w) RGB,
// scale to [0, 1] float32 into out[n, out_h, out_w, 3] — the
// UnrealTrajVideoDataset._load_and_resize contract for a whole clip, run
// with `nthreads` C++ threads (GIL released by the ctypes call).
// Returns 0, or 100 + index of the first file that failed (caller retries
// that file via PIL).
int sfi_decode_resize_batch(const char* const* paths, int n, int out_h,
                            int out_w, float* out, int nthreads) {
  if (n <= 0) return 0;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::atomic<int> next{0};
  std::atomic<int> first_error{-1};
  const size_t stride = (size_t)out_h * out_w * 3;

  auto work = [&]() {
    std::vector<uint8_t> rgb, resized((size_t)out_h * out_w * 3);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || first_error.load() >= 0) return;
      int w = 0, h = 0;
      if (decode_rgb(paths[i], &rgb, &w, &h) != 0) {
        int expected = -1;
        first_error.compare_exchange_strong(expected, i);
        return;
      }
      resize_bilinear_u8(rgb.data(), h, w, 3, resized.data(), out_h, out_w);
      float* dst = out + (size_t)i * stride;
      // divide (not multiply-by-reciprocal): bit-matches numpy float32/255.0
      for (size_t j = 0; j < stride; j++) dst[j] = resized[j] / 255.0f;
    }
  };

  if (nthreads == 1) {
    work();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nthreads);
    for (int t = 0; t < nthreads; t++) threads.emplace_back(work);
    for (auto& t : threads) t.join();
  }
  int err = first_error.load();
  return err < 0 ? 0 : 100 + err;
}

// Exact minimum enclosing circle of n (x, y) points -> out = {cx, cy, r}.
// Row-extreme reduction (per-y min/max x) -> convex hull -> Welzl.
int sfi_min_enclosing_circle(const double* xy, long long n, double* out) {
  if (n <= 0) return 1;
  std::vector<Pt> pts((size_t)n);
  for (long long i = 0; i < n; i++) pts[(size_t)i] = {xy[2 * i], xy[2 * i + 1]};
  if (pts.size() > 4) {
    // sort by (y, x); keep each y-run's first/last (the hull only touches
    // per-row extremes)
    std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
      return a.y < b.y || (a.y == b.y && a.x < b.x);
    });
    std::vector<Pt> red;
    red.reserve(pts.size());
    for (size_t i = 0; i < pts.size();) {
      size_t j = i;
      while (j + 1 < pts.size() && pts[j + 1].y == pts[i].y) j++;
      red.push_back(pts[i]);
      if (j != i) red.push_back(pts[j]);
      i = j + 1;
    }
    // monotone chain hull on points sorted by (x, y)
    std::sort(red.begin(), red.end(), [](const Pt& a, const Pt& b) {
      return a.x < b.x || (a.x == b.x && a.y < b.y);
    });
    red.erase(std::unique(red.begin(), red.end(), [](const Pt& a, const Pt& b) {
                return a.x == b.x && a.y == b.y;
              }),
              red.end());
    if (red.size() > 2) {
      std::vector<Pt> hull;
      hull.reserve(red.size() + 1);
      for (const Pt& p : red) {  // lower
        while (hull.size() >= 2 &&
               cross3(hull[hull.size() - 2], hull.back(), p) <= 0)
          hull.pop_back();
        hull.push_back(p);
      }
      size_t lower = hull.size() + 1;
      for (auto it = red.rbegin(); it != red.rend(); ++it) {  // upper
        while (hull.size() >= lower &&
               cross3(hull[hull.size() - 2], hull.back(), *it) <= 0)
          hull.pop_back();
        hull.push_back(*it);
      }
      hull.pop_back();  // last == first
      pts = std::move(hull);
    } else {
      pts = std::move(red);
    }
  }
  Circle c = welzl_mtf(pts);
  out[0] = c.c.x;
  out[1] = c.c.y;
  out[2] = std::sqrt(c.r2);
  return 0;
}

// Standalone resize for testing the resampler against PIL directly:
// (in_h, in_w, c) uint8 -> (out_h, out_w, c) uint8.
int sfi_resize_bilinear(const uint8_t* in, int in_h, int in_w, int c,
                        uint8_t* out, int out_h, int out_w) {
  if (in_h <= 0 || in_w <= 0 || out_h <= 0 || out_w <= 0 || c <= 0) return 1;
  resize_bilinear_u8(in, in_h, in_w, c, out, out_h, out_w);
  return 0;
}

}  // extern "C"
