// d4dio — native data-path runtime for diffuman4d_tpu.
//
// The inference host loop decodes, crops, and resizes thousands of
// 1024x1024 webp/png/jpeg frames per scene (the reference does this with
// PIL inside the dataset's per-frame Python loop, spatem_dataset.py:116-157).
// This library provides that hot path as a C ABI consumed via ctypes:
//
//   * decode: JPEG (libjpeg), PNG (libpng), WebP (libwebp) -> RGB8/GRAY8
//   * crop + separable bicubic resampling with PIL-compatible semantics
//     (Catmull-Rom-like kernel a=-0.5, support scaled for downsampling =
//     antialiased, matching PIL.Image.resize(..., BICUBIC))
//   * JPEG encode for result writing
//   * a pthread worker pool for batch loads (frames are independent)
//
// Everything is plain C++17 + system image libraries; no Python.h.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct DecodeResult {
  uint8_t* data;  // malloc'd, caller frees via d4dio_free
  int height;
  int width;
  int channels;
};

static uint8_t* read_file(const char* path, size_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t* buf = (uint8_t*)malloc(size);
  if (fread(buf, 1, size, f) != (size_t)size) {
    free(buf);
    fclose(f);
    return nullptr;
  }
  fclose(f);
  *size_out = (size_t)size;
  return buf;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = (JpegErr*)cinfo->err;
  longjmp(err->jb, 1);
}

static int decode_jpeg(const uint8_t* buf, size_t size, DecodeResult* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height, c = cinfo.output_components;
  uint8_t* data = (uint8_t*)malloc((size_t)w * h * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = data + (size_t)cinfo.output_scanline * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out->data = data;
  out->height = h;
  out->width = w;
  out->channels = c;
  return 0;
}

static int decode_png(const uint8_t* buf, size_t size, DecodeResult* out) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, size)) return -1;
  int channels;
  if (image.format & PNG_FORMAT_FLAG_ALPHA) {
    image.format = PNG_FORMAT_RGBA;
    channels = 4;
  } else if (image.format & PNG_FORMAT_FLAG_COLOR) {
    image.format = PNG_FORMAT_RGB;
    channels = 3;
  } else {
    image.format = PNG_FORMAT_GRAY;
    channels = 1;
  }
  uint8_t* data = (uint8_t*)malloc(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, data, 0, nullptr)) {
    free(data);
    return -1;
  }
  out->data = data;
  out->height = (int)image.height;
  out->width = (int)image.width;
  out->channels = channels;
  return 0;
}

static int decode_webp(const uint8_t* buf, size_t size, DecodeResult* out) {
  int w, h;
  if (!WebPGetInfo(buf, size, &w, &h)) return -1;
  uint8_t* data = WebPDecodeRGB(buf, size, &w, &h);
  if (!data) return -1;
  out->data = data;  // WebPDecodeRGB uses malloc-compatible allocation
  out->height = h;
  out->width = w;
  out->channels = 3;
  return 0;
}

// Decode by magic bytes. Returns 0 on success.
int d4dio_decode(const char* path, DecodeResult* out) {
  size_t size = 0;
  uint8_t* buf = read_file(path, &size);
  if (!buf || size < 12) {
    free(buf);
    return -1;
  }
  int rc = -1;
  if (buf[0] == 0xFF && buf[1] == 0xD8) {
    rc = decode_jpeg(buf, size, out);
  } else if (buf[0] == 0x89 && buf[1] == 'P') {
    rc = decode_png(buf, size, out);
  } else if (memcmp(buf, "RIFF", 4) == 0 && memcmp(buf + 8, "WEBP", 4) == 0) {
    rc = decode_webp(buf, size, out);
  }
  free(buf);
  return rc;
}

void d4dio_free(uint8_t* p) { free(p); }

// ---------------------------------------------------------------------------
// PIL-compatible bicubic resampling (separable, antialiased on downscale)
// ---------------------------------------------------------------------------

static inline double bicubic_kernel(double x) {
  // PIL's bicubic filter (a = -0.5), support 2
  const double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterTable {
  std::vector<int> bounds;     // (xmin, size) per output pixel
  std::vector<double> coeffs;  // ksize per output pixel
  int ksize;
};

// Precompute horizontal/vertical coefficients exactly like PIL's
// precompute_coeffs (antialias: support scales by in/out ratio).
static FilterTable precompute(int in_size, double in0, double in1, int out_size) {
  FilterTable ft;
  double scale = (in1 - in0) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;
  ft.ksize = (int)std::ceil(support) * 2 + 1;
  ft.bounds.resize(out_size * 2);
  ft.coeffs.resize((size_t)out_size * ft.ksize);
  for (int xx = 0; xx < out_size; xx++) {
    double center = in0 + (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)std::max(0.0, std::floor(center - support));
    int xmax = (int)std::min((double)in_size, std::ceil(center + support));
    xmax -= xmin;
    double* k = &ft.coeffs[(size_t)xx * ft.ksize];
    int x = 0;
    for (; x < xmax; x++) {
      double w = bicubic_kernel((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; x++) {
      if (ww != 0.0) k[x] /= ww;
    }
    for (; x < ft.ksize; x++) k[x] = 0.0;
    ft.bounds[xx * 2 + 0] = xmin;
    ft.bounds[xx * 2 + 1] = xmax;
  }
  return ft;
}

static inline uint8_t clip8(double v) {
  return (uint8_t)std::min(255.0, std::max(0.0, v + 0.5));
}

// Crop (top, left, ch, cw) from src then bicubic-resize to (oh, ow).
// src is HxWxC uint8; out must hold oh*ow*C. Out-of-bounds crop regions
// read as black (PIL crop pads with 0).
int d4dio_crop_resize(const uint8_t* src, int h, int w, int c, int top,
                      int left, int ch, int cw, uint8_t* out, int oh, int ow) {
  if (ch <= 0 || cw <= 0 || oh <= 0 || ow <= 0) return -1;
  // materialize the (padded) crop
  std::vector<uint8_t> crop((size_t)ch * cw * c, 0);
  int y0 = std::max(0, top), y1 = std::min(h, top + ch);
  int x0 = std::max(0, left), x1 = std::min(w, left + cw);
  for (int y = y0; y < y1; y++) {
    memcpy(&crop[((size_t)(y - top) * cw + (x0 - left)) * c],
           &src[((size_t)y * w + x0) * c], (size_t)(x1 - x0) * c);
  }

  FilterTable fx = precompute(cw, 0.0, cw, ow);
  FilterTable fy = precompute(ch, 0.0, ch, oh);

  // horizontal pass -> intermediate (ch x ow x c) in double
  std::vector<double> tmp((size_t)ch * ow * c);
  for (int y = 0; y < ch; y++) {
    const uint8_t* row = &crop[(size_t)y * cw * c];
    for (int x = 0; x < ow; x++) {
      int xmin = fx.bounds[x * 2], xmax = fx.bounds[x * 2 + 1];
      const double* k = &fx.coeffs[(size_t)x * fx.ksize];
      for (int ch_i = 0; ch_i < c; ch_i++) {
        double acc = 0.0;
        for (int i = 0; i < xmax; i++) acc += row[(size_t)(xmin + i) * c + ch_i] * k[i];
        tmp[((size_t)y * ow + x) * c + ch_i] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < oh; y++) {
    int ymin = fy.bounds[y * 2], ymax = fy.bounds[y * 2 + 1];
    const double* k = &fy.coeffs[(size_t)y * fy.ksize];
    for (int x = 0; x < ow; x++) {
      for (int ch_i = 0; ch_i < c; ch_i++) {
        double acc = 0.0;
        for (int i = 0; i < ymax; i++)
          acc += tmp[((size_t)(ymin + i) * ow + x) * c + ch_i] * k[i];
        out[((size_t)y * ow + x) * c + ch_i] = clip8(acc);
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// one-shot frame load: decode + crop + resize (the dataset hot path)
// ---------------------------------------------------------------------------

int d4dio_load_frame(const char* path, int top, int left, int ch, int cw,
                     uint8_t* out, int oh, int ow, int want_channels) {
  DecodeResult dec;
  if (d4dio_decode(path, &dec) != 0) return -1;
  int rc = 0;
  if (dec.channels == want_channels) {
    rc = d4dio_crop_resize(dec.data, dec.height, dec.width, dec.channels, top,
                           left, ch, cw, out, oh, ow);
  } else if (dec.channels == 1 && want_channels == 3) {
    std::vector<uint8_t> rgb((size_t)dec.height * dec.width * 3);
    for (size_t i = 0; i < (size_t)dec.height * dec.width; i++) {
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = dec.data[i];
    }
    rc = d4dio_crop_resize(rgb.data(), dec.height, dec.width, 3, top, left, ch,
                           cw, out, oh, ow);
  } else if (want_channels == 1) {
    std::vector<uint8_t> gray((size_t)dec.height * dec.width);
    for (size_t i = 0; i < (size_t)dec.height * dec.width; i++) {
      const uint8_t* p = &dec.data[i * dec.channels];
      gray[i] = (uint8_t)((299 * p[0] + 587 * p[1] + 114 * p[2]) / 1000);
    }
    rc = d4dio_crop_resize(gray.data(), dec.height, dec.width, 1, top, left, ch,
                           cw, out, oh, ow);
  } else if (dec.channels == 4 && want_channels == 3) {
    std::vector<uint8_t> rgb((size_t)dec.height * dec.width * 3);
    for (size_t i = 0; i < (size_t)dec.height * dec.width; i++) {
      rgb[i * 3 + 0] = dec.data[i * 4 + 0];
      rgb[i * 3 + 1] = dec.data[i * 4 + 1];
      rgb[i * 3 + 2] = dec.data[i * 4 + 2];
    }
    rc = d4dio_crop_resize(rgb.data(), dec.height, dec.width, 3, top, left, ch,
                           cw, out, oh, ow);
  } else {
    rc = -2;
  }
  free(dec.data);
  return rc;
}

// batch loader with a thread pool (frames independent)
int d4dio_load_batch(const char** paths, const int* crops /* n*4 */, int n,
                     uint8_t* out /* n*oh*ow*cch */, int oh, int ow,
                     int want_channels, int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      const int* cr = &crops[i * 4];
      int rc = d4dio_load_frame(paths[i], cr[0], cr[1], cr[2], cr[3],
                                out + (size_t)i * oh * ow * want_channels, oh,
                                ow, want_channels);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int nt = std::max(1, num_threads);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load() == 0 ? 0 : -1;
}

// ---------------------------------------------------------------------------
// JPEG encode (result writing)
// ---------------------------------------------------------------------------

int d4dio_encode_jpeg(const char* path, const uint8_t* data, int h, int w,
                      int c, int quality) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = c;
  cinfo.in_color_space = c == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t* row = data + (size_t)cinfo.next_scanline * w * c;
    jpeg_write_scanlines(&cinfo, (JSAMPARRAY)&row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// fused uint8 -> VAE-normalized float32 conversions
//
// These mirror the Python chain bit-for-bit (images.py to_float/norm_vae/
// apply_fmask vae-white path, parity with image_utils.py:9-59) but touch
// ~16 MB per frame instead of ~250 MB of numpy temporaries — on slow-
// memory hosts the Python chain was ~70% of a cold frame load.
// ---------------------------------------------------------------------------

// fp-contract off: numpy evaluates each op separately; FMA contraction
// would round differently and break bit parity with the Python chain
#pragma GCC push_options
#pragma GCC optimize("fp-contract=off")

// out[i] = (in[i] / 255) * 2 - 1   (fp32 ops in this exact order)
int d4dio_u8_to_vae(const uint8_t* in, long long n, float* out) {
  for (long long i = 0; i < n; i++) {
    float v = (float)in[i] / 255.0f;
    out[i] = v * 2.0f - 1.0f;
  }
  return 0;
}

// White-background compositing in VAE space (image_utils.py:43-54 with
// white bg + norm roundtrip; images.py apply_fmask fused form, same fp32
// op order): I = (img/255)*2-1, M = (mask/255)*2-1,
//            O = ((I-1)*(M+1))*0.5 + 1
// img: (hw, 3) interleaved RGB; mask: (hw, 1); out: (hw, 3) float32.
int d4dio_composite_white_vae(const uint8_t* img, const uint8_t* mask,
                              long long hw, float* out) {
  for (long long i = 0; i < hw; i++) {
    float m = (float)mask[i] / 255.0f;
    m = m * 2.0f - 1.0f;
    float mp1 = m + 1.0f;
    for (int ch_i = 0; ch_i < 3; ch_i++) {
      float v = (float)img[i * 3 + ch_i] / 255.0f;
      v = v * 2.0f - 1.0f;
      float t = (v - 1.0f) * mp1;
      t = t * 0.5f;
      out[i * 3 + ch_i] = t + 1.0f;
    }
  }
  return 0;
}

#pragma GCC pop_options

}  // extern "C"
