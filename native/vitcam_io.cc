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
#include <zlib.h>

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

// --- palette-PNG writer + CAM-overlay renderer (round 5) ------------------
//
// After the native compose landed, the two largest host stages of the
// end-to-end CAM export pipeline (BENCHMARKS "End-to-end") became the
// artifact WRITES: the CAM-overlay jpg (reference utils.py:111-129 —
// re-open source JPEG, JET colormap, 0.3/0.5 blend, JPEG write; 7.9 ms/img
// via PIL+cv2) and the palette PNG (reference validate.py:258-262 —
// ToPILImage + putpalette + save; 6.0 ms/img via PIL).  These are their
// native replacements, threaded across images like the decode path.
//
// Contracts: the PNG's DECODED content (indices + palette) is exactly what
// PIL writes — the bytes differ (deflate level), the artifact doesn't.
// The overlay's composed RGB matches the Python fallback path's math
// (PIL-semantics u8 resize, LUT, double 0.3/0.5 blend, truncating cast) to
// ±2 8-bit steps (PIL resamples u8 in 8-bit fixed point, we use float —
// the same ~1/255 class as the decode path's documented divergence; the
// blend scales a ±1 resample step by 0.3, plus the truncating cast); the
// JET LUT itself is passed in from Python, so cv2's exact colormap is used
// when cv2 is present.  JPEG encode: libjpeg, quality as passed (the
// Python paths themselves differ between cv2 and PIL encoders already).

namespace {

// PIL-semantics separable triangle resize of a single-channel u8 image
// (same coeff computation as resize_normalize; float accumulation,
// round-half-up like PIL's clip8).
void resize_u8(const uint8_t* src, int w, int h, int ow, int oh,
               uint8_t* dst) {
  Coeffs cx = triangle_coeffs(w, ow);
  Coeffs cy = triangle_coeffs(h, oh);
  std::vector<float> tmp(static_cast<size_t>(h) * ow);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w;
    float* trow = tmp.data() + static_cast<size_t>(y) * ow;
    for (int xx = 0; xx < ow; ++xx) {
      const float* wp = cx.w.data() + static_cast<size_t>(xx) * cx.kmax;
      float acc = 0.f;
      int x0 = cx.xmin[xx];
      for (int i = 0; i < cx.xsize[xx]; ++i) acc += wp[i] * row[x0 + i];
      trow[xx] = acc;
    }
  }
  for (int yy = 0; yy < oh; ++yy) {
    const float* wp = cy.w.data() + static_cast<size_t>(yy) * cy.kmax;
    int y0 = cy.xmin[yy];
    uint8_t* orow = dst + static_cast<size_t>(yy) * ow;
    for (int xx = 0; xx < ow; ++xx) {
      float acc = 0.f;
      for (int i = 0; i < cy.xsize[yy]; ++i)
        acc += wp[i] * tmp[static_cast<size_t>(y0 + i) * ow + xx];
      int v = static_cast<int>(acc + 0.5f);
      orow[xx] = static_cast<uint8_t>(std::min(std::max(v, 0), 255));
    }
  }
}

// cam_norm (utils.py:80-88): (cam - min) -> uint8(255 * cam / max(max, eps))
// with numpy's truncating uint8 cast.
void cam_norm_u8(const double* cam, int n, uint8_t* out) {
  double lo = cam[0], hi = cam[0];
  for (int i = 1; i < n; ++i) {
    lo = std::min(lo, cam[i]);
    hi = std::max(hi, cam[i]);
  }
  double denom = std::max(hi - lo, 1e-12);
  for (int i = 0; i < n; ++i)
    out[i] = static_cast<uint8_t>(255.0 * (cam[i] - lo) / denom);
}

// Compose one overlay into an RGB buffer: decode src JPEG, resize the
// normalized CAM to the image size, LUT -> heat, heat*0.3 + img*0.5.
bool overlay_rgb(const uint8_t* jpeg, long len, const double* cam, int g,
                 const uint8_t* lut_rgb, std::vector<uint8_t>* out,
                 int* w, int* h) {
  std::vector<uint8_t> rgb;
  if (!decode_jpeg(jpeg, len, &rgb, w, h)) return false;
  std::vector<uint8_t> cam_u8(static_cast<size_t>(g) * g);
  cam_norm_u8(cam, g * g, cam_u8.data());
  std::vector<uint8_t> heat_idx(static_cast<size_t>(*w) * *h);
  resize_u8(cam_u8.data(), g, g, *w, *h, heat_idx.data());
  size_t npx = static_cast<size_t>(*w) * *h;
  out->resize(npx * 3);
  for (size_t p = 0; p < npx; ++p) {
    const uint8_t* hc = lut_rgb + static_cast<size_t>(heat_idx[p]) * 3;
    for (int ch = 0; ch < 3; ++ch)
      (*out)[p * 3 + ch] = static_cast<uint8_t>(
          hc[ch] * 0.3 + rgb[p * 3 + ch] * 0.5);
  }
  return true;
}

bool write_jpeg_file(const char* path, const uint8_t* rgb, int w, int h,
                     int quality) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  jpeg_compress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t* row = rgb + static_cast<size_t>(cinfo.next_scanline) * w * 3;
    JSAMPROW jrow = const_cast<JSAMPROW>(row);
    jpeg_write_scanlines(&cinfo, &jrow, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  std::fclose(f);
  return true;
}

// Minimal indexed-PNG writer: IHDR(color type 3) + PLTE + one zlib IDAT of
// filter-0 rows + IEND.  Decoded content is identical to PIL's
// putpalette/save output; only the compressed byte stream differs.
void png_put_u32(std::vector<uint8_t>* v, uint32_t x) {
  v->push_back((x >> 24) & 0xff);
  v->push_back((x >> 16) & 0xff);
  v->push_back((x >> 8) & 0xff);
  v->push_back(x & 0xff);
}

void png_chunk(std::vector<uint8_t>* out, const char* tag,
               const uint8_t* data, size_t len) {
  png_put_u32(out, static_cast<uint32_t>(len));
  size_t start = out->size();
  out->insert(out->end(), tag, tag + 4);
  if (len) out->insert(out->end(), data, data + len);
  uLong crc = crc32(0L, out->data() + start, static_cast<uInt>(len + 4));
  png_put_u32(out, static_cast<uint32_t>(crc));
}

bool write_indexed_png(const char* path, const uint8_t* labels, int w, int h,
                       const uint8_t* palette /* 768 bytes */, int level) {
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (w + 1));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (w + 1);
    row[0] = 0;  // filter: none
    std::memcpy(row + 1, labels + static_cast<size_t>(y) * w, w);
  }
  uLongf comp_len = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_len);
  if (compress2(comp.data(), &comp_len, raw.data(),
                static_cast<uLong>(raw.size()), level) != Z_OK)
    return false;

  std::vector<uint8_t> out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 3;   // color type: indexed
  ihdr[10] = ihdr[11] = ihdr[12] = 0;  // deflate / filter 0 / no interlace
  png_chunk(&out, "IHDR", ihdr, 13);
  png_chunk(&out, "PLTE", palette, 768);
  png_chunk(&out, "IDAT", comp.data(), comp_len);
  png_chunk(&out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t wrote = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return wrote == out.size();
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  if (len < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  buf->resize(static_cast<size_t>(len));
  size_t got = std::fread(buf->data(), 1, buf->size(), f);
  std::fclose(f);
  return got == buf->size();
}

}  // namespace

extern "C" {

// Compose one overlay without encoding (test hook: the composed RGB is the
// contract; JPEG bytes are encoder-specific).  Caller provides out sized
// w*h*3 for the KNOWN source size (use vitcam_overlay_batch for files).
int vitcam_overlay_rgb_one(const uint8_t* jpeg, long len, const double* cam,
                           int g, const uint8_t* lut_rgb, uint8_t* out,
                           int max_bytes) {
  try {
    std::vector<uint8_t> rgb;
    int w, h;
    if (!overlay_rgb(jpeg, len, cam, g, lut_rgb, &rgb, &w, &h)) return -1;
    if (static_cast<long>(rgb.size()) > max_bytes) return -1;
    std::memcpy(out, rgb.data(), rgb.size());
    return static_cast<int>(rgb.size());
  } catch (...) {
    return -1;
  }
}

// Batch CAM-overlay render: for each image, read src_paths[i], decode,
// overlay cams[i] ([g, g] f64, raw — normalization happens inside), write
// a JPEG (quality q) to dst_paths[i].  Returns count of failed items.
int vitcam_overlay_batch(const char** src_paths, const char** dst_paths,
                         int n, const double* cams, int g,
                         const uint8_t* lut_rgb, int quality,
                         int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> fails(n_threads, 0);
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      try {
        std::vector<uint8_t> jpeg, rgb;
        int w, h;
        if (!read_file(src_paths[i], &jpeg)
            || !overlay_rgb(jpeg.data(), static_cast<long>(jpeg.size()),
                            cams + static_cast<size_t>(i) * g * g, g,
                            lut_rgb, &rgb, &w, &h)
            || !write_jpeg_file(dst_paths[i], rgb.data(), w, h, quality))
          fails[tid]++;
      } catch (...) {
        fails[tid]++;
      }
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

// Batch palette-PNG write: labels[i] is [sizes[2i], sizes[2i+1]] uint8,
// palette is 768 bytes (256 RGB triples), level is the deflate level
// (1 = fastest; content identical at any level).  Returns failed count.
int vitcam_write_png_batch(const char** paths, const uint8_t** labels,
                           const int32_t* sizes, int n,
                           const uint8_t* palette, int level,
                           int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> fails(n_threads, 0);
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      try {
        if (!write_indexed_png(paths[i], labels[i], sizes[i * 2 + 1],
                               sizes[i * 2], palette, level))
          fails[tid]++;
      } catch (...) {
        fails[tid]++;
      }
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
