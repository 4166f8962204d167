// Native IO for the TPU ViT-CAM framework: JPEG decode + resize + normalize.
//
// The reference feeds its GPUs through torch DataLoader CPU workers running
// PIL per item (voc12/data.py:83, train_and_validate.py:91-104).  This is
// the native equivalent: libjpeg decode, PIL-semantics separable triangle
// (bilinear-with-antialias) resize, ImageNet normalization, fanned out over
// a std::thread pool via the batch entry point.  Exposed as a C ABI consumed
// through ctypes (io/native_loader.py).
//
// Resize matches PIL.Image.BILINEAR (torchvision Resize default): per-axis
// scale = in/out, filterscale = max(scale, 1), support = filterscale,
// center-aligned windows, triangle weights, normalized — computed in float
// (PIL uses 8-bit fixed point, so outputs agree to ~1/255).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG buffer to packed RGB8.  Returns false on corrupt input.
bool decode_jpeg(const uint8_t* data, long len, std::vector<uint8_t>* rgb,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct Coeffs {
  std::vector<int> xmin, xsize;   // window start / length per output pixel
  std::vector<float> w;           // weights, stride = max window length
  int kmax;
};

// PIL precompute_coeffs for the triangle (bilinear) filter.
Coeffs triangle_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = filterscale;  // bilinear filter support = 1.0
  int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.kmax = kmax;
  c.xmin.resize(out_size);
  c.xsize.resize(out_size);
  c.w.assign(static_cast<size_t>(out_size) * kmax, 0.f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(std::min(static_cast<double>(in_size),
                                         std::ceil(center + support)));
    double ww = 0.0;
    std::vector<double> tmp(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double t = (x + 0.5 - center) / filterscale;
      double wv = (std::abs(t) < 1.0) ? 1.0 - std::abs(t) : 0.0;
      tmp[x - xmin] = wv;
      ww += wv;
    }
    c.xmin[xx] = xmin;
    c.xsize[xx] = xmax - xmin;
    for (int i = 0; i < xmax - xmin; ++i)
      c.w[static_cast<size_t>(xx) * kmax + i] =
          static_cast<float>(ww > 0 ? tmp[i] / ww : 0.0);
  }
  return c;
}

// Separable resize RGB8 [h, w] -> float32 [out, out] per channel, then
// normalize ((x/255 - mean) / std) into CHW-agnostic HWC layout.
void resize_normalize(const uint8_t* rgb, int w, int h, int out_size,
                      const float* mean, const float* stdv, float* out) {
  Coeffs cx = triangle_coeffs(w, out_size);
  Coeffs cy = triangle_coeffs(h, out_size);
  // horizontal pass: [h, w, 3] -> [h, out, 3]
  std::vector<float> tmp(static_cast<size_t>(h) * out_size * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = rgb + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_size * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      const float* wp = cx.w.data() + static_cast<size_t>(xx) * cx.kmax;
      float acc[3] = {0.f, 0.f, 0.f};
      int x0 = cx.xmin[xx];
      for (int i = 0; i < cx.xsize[xx]; ++i) {
        const uint8_t* px = row + static_cast<size_t>(x0 + i) * 3;
        acc[0] += wp[i] * px[0];
        acc[1] += wp[i] * px[1];
        acc[2] += wp[i] * px[2];
      }
      trow[xx * 3 + 0] = acc[0];
      trow[xx * 3 + 1] = acc[1];
      trow[xx * 3 + 2] = acc[2];
    }
  }
  // vertical pass + normalize: [h, out, 3] -> [out, out, 3]
  const float inv255 = 1.f / 255.f;
  for (int yy = 0; yy < out_size; ++yy) {
    const float* wp = cy.w.data() + static_cast<size_t>(yy) * cy.kmax;
    int y0 = cy.xmin[yy];
    float* orow = out + static_cast<size_t>(yy) * out_size * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      float acc[3] = {0.f, 0.f, 0.f};
      for (int i = 0; i < cy.xsize[yy]; ++i) {
        const float* px = tmp.data() +
            (static_cast<size_t>(y0 + i) * out_size + xx) * 3;
        acc[0] += wp[i] * px[0];
        acc[1] += wp[i] * px[1];
        acc[2] += wp[i] * px[2];
      }
      for (int ch = 0; ch < 3; ++ch)
        orow[xx * 3 + ch] = (acc[ch] * inv255 - mean[ch]) / stdv[ch];
    }
  }
}

}  // namespace

// --- pseudo-seg compose (validate.py:177-257 host half) -------------------
//
// The reference composes pseudo-seg labels on the GPU via F.interpolate at
// each image's ORIGINAL size (validate.py:177-208); per-image dynamic shapes
// don't jit on TPU, so this framework runs the compose on host.  The numpy
// implementation (cam/pseudo_seg.py compose_pseudo_seg) was the single
// largest stage of the end-to-end CAM export pipeline (56.7 ms/img — 75% of
// the BASELINE-config-#3 budget, BENCHMARKS "End-to-end"); this is its
// native replacement: one fused pass that upsamples the K cosine maps and
// the bg rollout row (separable bilinear, half-pixel centers, edge clamp —
// torch F.interpolate align_corners=False semantics), tracks the per-pixel
// argmax winner on the fly (the [K, h, w] upsampled stack is never
// materialized), applies the fg/bg thresholds and maps patch ids to class
// ids.  All arithmetic is double with the EXACT expression order of
// np_bilinear_resize (W pass: l + (r - l) * wx per source row; H pass:
// top + (bot - top) * wy), so outputs are bit-identical to the numpy path
// and the torch-transliteration golden (tests/test_pseudo_seg.py).

namespace {

struct LerpAxis {
  std::vector<int> i0, i1;     // clamped gather indices per output pixel
  std::vector<double> w;       // lerp weight in [0, 1]
};

// numpy: ys = (arange(o) + 0.5) * (in / o) - 0.5; i0 = clip(floor, 0, in-1);
// i1 = min(i0 + 1, in - 1); w = clip(ys - i0, 0, 1).
LerpAxis half_pixel_axis(int in_size, int out_size) {
  LerpAxis a;
  a.i0.resize(out_size);
  a.i1.resize(out_size);
  a.w.resize(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  for (int x = 0; x < out_size; ++x) {
    double s = (x + 0.5) * scale - 0.5;
    double f = std::floor(s);
    int i0 = static_cast<int>(std::min(std::max(f, 0.0),
                                       static_cast<double>(in_size - 1)));
    a.i0[x] = i0;
    a.i1[x] = std::min(i0 + 1, in_size - 1);
    a.w[x] = std::min(std::max(s - i0, 0.0), 1.0);
  }
  return a;
}

// One image: cos_maps [k, g, g], bg_row [g, g], patch_to_cls [k] ->
// out [h, w] int32 class ids (0 = background).
void compose_one(const double* cos_maps, const double* bg_row,
                 const int32_t* patch_to_cls, int k, int g, int h, int w,
                 double fg_thr, double bg_thr, int32_t* out) {
  LerpAxis ax = half_pixel_axis(g, w);
  LerpAxis ay = half_pixel_axis(g, h);
  // W pass once per map (+ bg): [g, g] -> [g, w], matching numpy's
  // "once per SOURCE row" contract
  std::vector<double> rows(static_cast<size_t>(k + 1) * g * w);
  for (int m = 0; m <= k; ++m) {
    const double* src = (m < k) ? cos_maps + static_cast<size_t>(m) * g * g
                                : bg_row;
    double* dst = rows.data() + static_cast<size_t>(m) * g * w;
    for (int y = 0; y < g; ++y) {
      const double* srow = src + static_cast<size_t>(y) * g;
      double* drow = dst + static_cast<size_t>(y) * w;
      for (int x = 0; x < w; ++x) {
        double l = srow[ax.i0[x]];
        double r = srow[ax.i1[x]];
        drow[x] = l + (r - l) * ax.w[x];
      }
    }
  }
  // H pass fused with argmax/threshold/compose, one output row at a time
  std::vector<double> lerped(static_cast<size_t>(k + 1) * w);
  for (int y = 0; y < h; ++y) {
    const double wy = ay.w[y];
    for (int m = 0; m <= k; ++m) {
      const double* top = rows.data() + (static_cast<size_t>(m) * g
                                         + ay.i0[y]) * w;
      const double* bot = rows.data() + (static_cast<size_t>(m) * g
                                         + ay.i1[y]) * w;
      double* dst = lerped.data() + static_cast<size_t>(m) * w;
      for (int x = 0; x < w; ++x) dst[x] = top[x] + (bot[x] - top[x]) * wy;
    }
    const double* bg_up = lerped.data() + static_cast<size_t>(k) * w;
    int32_t* orow = out + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      // np.argmax tie-break: first maximum wins -> strict >
      int winner = 0;
      double best = lerped[x];
      for (int m = 1; m < k; ++m) {
        double v = lerped[static_cast<size_t>(m) * w + x];
        if (v > best) { best = v; winner = m; }
      }
      bool keep = best >= fg_thr && bg_up[x] >= bg_thr;
      orow[x] = keep ? patch_to_cls[winner] + 1 : 0;
    }
  }
}

}  // namespace

extern "C" {

// Compose one image's pseudo-seg labels.  All-double math, bit-identical to
// the numpy path.  out: [h, w] int32.
void vitcam_compose_one(const double* cos_maps, const double* bg_row,
                        const int32_t* patch_to_cls, int k, int g,
                        int h, int w, double fg_thr, double bg_thr,
                        int32_t* out) {
  compose_one(cos_maps, bg_row, patch_to_cls, k, g, h, w, fg_thr, bg_thr,
              out);
}

// Batch entry: n images with per-image (h, w) sizes, composed on n_threads
// std::threads (threaded across images, like the decode path — per-image
// work is already cache-friendly).  cos_maps: [n, k, g, g]; bg_rows:
// [n, g, g]; patch_to_cls: [n, k]; sizes: [n, 2] (h, w); outs: n pointers,
// outs[i] is [sizes[i][0], sizes[i][1]] int32.
void vitcam_compose_batch(const double* cos_maps, const double* bg_rows,
                          const int32_t* patch_to_cls, int n, int k, int g,
                          const int32_t* sizes, double fg_thr, double bg_thr,
                          int32_t** outs, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      compose_one(cos_maps + static_cast<size_t>(i) * k * g * g,
                  bg_rows + static_cast<size_t>(i) * g * g,
                  patch_to_cls + static_cast<size_t>(i) * k,
                  k, g, sizes[i * 2], sizes[i * 2 + 1], fg_thr, bg_thr,
                  outs[i]);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(work, t);
  work(0);
  for (auto& t : threads) t.join();
}

// Decode one JPEG -> normalized float32 [out_size, out_size, 3].  0 on ok.
// C++ exceptions (e.g. std::bad_alloc from a header claiming 65500x65500 —
// ~12.8 GB of RGB) are converted to a failure return: an escaped exception
// on a worker std::thread would std::terminate the whole host process
// instead of being counted against the fail-count contract.
int vitcam_decode_one(const uint8_t* jpeg, long len, int out_size,
                      const float* mean, const float* stdv, float* out) {
  try {
    std::vector<uint8_t> rgb;
    int w, h;
    if (!decode_jpeg(jpeg, len, &rgb, &w, &h)) return 1;
    resize_normalize(rgb.data(), w, h, out_size, mean, stdv, out);
    return 0;
  } catch (...) {
    return 1;
  }
}

// Batch entry: n JPEG buffers -> [n, out_size, out_size, 3] float32,
// decoded on n_threads std::threads.  Returns count of failed items.
int vitcam_decode_batch(const uint8_t** jpegs, const long* lens, int n,
                        int out_size, const float* mean, const float* stdv,
                        float* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> fails(n_threads, 0);
  size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      if (vitcam_decode_one(jpegs[i], lens[i], out_size, mean, stdv,
                            out + stride * i) != 0)
        fails[tid]++;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(work, t);
  work(0);
  for (auto& t : threads) t.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

}  // extern "C"
