// Native data-loading runtime for tpu_unet.
//
// Role: the C++ counterpart of the reference stack's torch DataLoader worker
// processes (reference: train.py:434-439) — multithreaded JPEG/PNG decode,
// PIL-compatible BICUBIC letterbox resize onto a gray(128) canvas
// (reference: utils/utils.py:22-34), and NEAREST label resize — feeding
// ready-to-ship uint8 NHWC batches to the device.
//
// The resampler reimplements Pillow's documented separable fixed-point
// convolution scheme (8-bit channels, 32-8-2 = 22 bits of coefficient
// precision, support window scaled by the downscale factor) so outputs are
// byte-compatible with the PIL path used for mask parity.
//
// Build: see native/Makefile (g++ -O3 -shared, links libjpeg + libpng).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;

inline uint8_t clip8(int in) {
  if (in >= (255 << kPrecisionBits)) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> kPrecisionBits);
}

double bicubic_filter(double x) {
  // Keys cubic, a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

constexpr double kBicubicSupport = 2.0;

// Precompute the per-output-pixel coefficient windows, Pillow-style.
struct Coeffs {
  std::vector<int> bounds_min;   // first source index per output pixel
  std::vector<int> bounds_size;  // window size per output pixel
  std::vector<int> kk;           // fixed-point coefficients, ksize per pixel
  int ksize = 0;
};

Coeffs precompute_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = kBicubicSupport * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.ksize = ksize;
  c.bounds_min.resize(out_size);
  c.bounds_size.resize(out_size);
  c.kk.assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> k(ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      double w = bicubic_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) k[x] /= ww;
    }
    for (int x = 0; x < xmax; ++x) {
      c.kk[static_cast<size_t>(xx) * ksize + x] = static_cast<int>(
          std::round(k[x] * (1 << kPrecisionBits)));
    }
    c.bounds_min[xx] = xmin;
    c.bounds_size[xx] = xmax;
  }
  return c;
}

// Horizontal resample: src (h, in_w, 3) -> dst (h, out_w, 3)
void resample_horizontal(const uint8_t* src, int h, int in_w, uint8_t* dst,
                         int out_w, const Coeffs& c) {
  for (int yy = 0; yy < h; ++yy) {
    const uint8_t* srow = src + static_cast<size_t>(yy) * in_w * 3;
    uint8_t* drow = dst + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = c.bounds_min[xx];
      int xcount = c.bounds_size[xx];
      const int* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
      int ss0 = 1 << (kPrecisionBits - 1);
      int ss1 = ss0, ss2 = ss0;
      const uint8_t* sp = srow + static_cast<size_t>(xmin) * 3;
      for (int x = 0; x < xcount; ++x) {
        ss0 += sp[0] * k[x];
        ss1 += sp[1] * k[x];
        ss2 += sp[2] * k[x];
        sp += 3;
      }
      drow[xx * 3 + 0] = clip8(ss0);
      drow[xx * 3 + 1] = clip8(ss1);
      drow[xx * 3 + 2] = clip8(ss2);
    }
  }
}

// Vertical resample: src (in_h, w, 3) -> dst (out_h, w, 3)
void resample_vertical(const uint8_t* src, int in_h, int w, uint8_t* dst,
                       int out_h, const Coeffs& c) {
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = c.bounds_min[yy];
    int ycount = c.bounds_size[yy];
    const int* k = &c.kk[static_cast<size_t>(yy) * c.ksize];
    uint8_t* drow = dst + static_cast<size_t>(yy) * w * 3;
    for (int xx = 0; xx < w * 3; ++xx) {
      int ss = 1 << (kPrecisionBits - 1);
      for (int y = 0; y < ycount; ++y) {
        ss += src[(static_cast<size_t>(ymin) + y) * w * 3 + xx] * k[y];
      }
      drow[xx] = clip8(ss);
    }
  }
}

// PIL-compatible bicubic resize (h, w, 3) -> (nh, nw, 3)
std::vector<uint8_t> resize_bicubic(const uint8_t* src, int h, int w, int nh,
                                    int nw) {
  Coeffs ch = precompute_coeffs(w, nw);
  std::vector<uint8_t> tmp(static_cast<size_t>(h) * nw * 3);
  resample_horizontal(src, h, w, tmp.data(), nw, ch);
  Coeffs cv = precompute_coeffs(h, nh);
  std::vector<uint8_t> out(static_cast<size_t>(nh) * nw * 3);
  resample_vertical(tmp.data(), h, nw, out.data(), nh, cv);
  return out;
}

// ----------------------------------------------------------------------
// decoding
// ----------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() +
                   static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, std::vector<uint8_t>* out, int* w, int* h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = out->data() + static_cast<size_t>(y) * *w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, std::vector<uint8_t>* out, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out, w, h);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out, w, h);
  }
  fclose(f);
  return ok;
}

// one letterboxed sample into out (out_h, out_w, 3), gray(128) background
bool load_letterbox_one(const char* path, int out_h, int out_w, uint8_t* out,
                        int* nw_out, int* nh_out) {
  std::vector<uint8_t> img;
  int w = 0, h = 0;
  if (!decode_file(path, &img, &w, &h)) return false;
  double scale = std::min(static_cast<double>(out_w) / w,
                          static_cast<double>(out_h) / h);
  int nw = static_cast<int>(w * scale);
  int nh = static_cast<int>(h * scale);
  std::vector<uint8_t> resized = resize_bicubic(img.data(), h, w, nh, nw);
  std::memset(out, 128, static_cast<size_t>(out_h) * out_w * 3);
  int dx = (out_w - nw) / 2;
  int dy = (out_h - nh) / 2;
  for (int y = 0; y < nh; ++y) {
    std::memcpy(out + (static_cast<size_t>(dy + y) * out_w + dx) * 3,
                resized.data() + static_cast<size_t>(y) * nw * 3,
                static_cast<size_t>(nw) * 3);
  }
  if (nw_out) *nw_out = nw;
  if (nh_out) *nh_out = nh;
  return true;
}

}  // namespace

extern "C" {

// Decode + letterbox a batch of images with a thread pool.
// paths: n C strings; out: (n, out_h, out_w, 3) uint8; nws/nhs: per-image
// resized content sizes (for gray-bar cropping).  Returns count of failures.
int dl_load_letterbox_batch(const char** paths, int n, int out_h, int out_w,
                            uint8_t* out, int* nws, int* nhs, int n_threads) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      if (!load_letterbox_one(paths[i], out_h, out_w, dst,
                              nws ? nws + i : nullptr,
                              nhs ? nhs + i : nullptr)) {
        failures.fetch_add(1);
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

// PIL-compatible bicubic resize of a single RGB buffer.
void dl_resize_bicubic(const uint8_t* src, int h, int w, uint8_t* dst,
                       int nh, int nw) {
  std::vector<uint8_t> out = resize_bicubic(src, h, w, nh, nw);
  std::memcpy(dst, out.data(), out.size());
}

// Raw decode (RGB) — returns 0 on success; w/h must hold the buffer size
// obtained from dl_probe.
int dl_decode(const char* path, uint8_t* dst, int w, int h) {
  std::vector<uint8_t> img;
  int iw = 0, ih = 0;
  if (!decode_file(path, &img, &iw, &ih)) return 1;
  if (iw != w || ih != h) return 2;
  std::memcpy(dst, img.data(), img.size());
  return 0;
}

int dl_probe(const char* path, int* w, int* h) {
  std::vector<uint8_t> img;
  return decode_file(path, &img, w, h) ? 0 : 1;
}

}  // extern "C"
