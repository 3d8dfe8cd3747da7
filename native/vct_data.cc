// vct_data: native host-side image decode + resize for the input pipeline.
//
// The training path is input-bound (docs/PERF.md): the device-only train
// step runs 324 img/s while PIL-based decode feeds far less. This library
// provides the TPU-native framework's host runtime piece: multi-threaded
// libjpeg decode fused with bilinear resize straight into a caller-provided
// uint8 NHWC batch buffer (zero Python-side intermediates; uint8 ships to
// device, /255 happens in-jit).
//
// Exposed via ctypes (vision_conglomerate_tpu/data/native_loader.py); build
// with native/Makefile (g++ -O3 -shared, links system libjpeg).
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to an RGB buffer. Returns 0 on success.
int decode_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>& out,
               int& width, int& height) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  width = cinfo.output_width;
  height = cinfo.output_height;
  out.resize(static_cast<size_t>(width) * height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear resize (half-pixel centers, matching cv2.INTER_LINEAR /
// torch align_corners=False) from src RGB to dst RGB.
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int dw, int dh) {
  if (sw == dw && sh == dh) {
    std::memcpy(dst, src, static_cast<size_t>(sw) * sh * 3);
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      uint8_t* d = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] + (p01[c] - p00[c]) * wx;
        const float bot = p10[c] + (p11[c] - p10[c]) * wx;
        d[c] = static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one JPEG and resize into out (out_h * out_w * 3 uint8, RGB).
// Returns 0 on success.
int vct_decode_resize(const uint8_t* jpeg_data, size_t jpeg_len,
                      int out_w, int out_h, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (decode_rgb(jpeg_data, jpeg_len, rgb, w, h)) return 1;
  resize_bilinear(rgb.data(), w, h, out, out_w, out_h);
  return 0;
}

// Batch decode+resize with an internal thread pool. jpegs: array of n
// pointers; lens: array of n lengths; out: n * out_h * out_w * 3 uint8.
// Returns number of failed decodes (0 == all ok; failed slots are zeroed).
int vct_decode_resize_batch(const uint8_t** jpegs, const size_t* lens, int n,
                            int out_w, int out_h, uint8_t* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  const size_t stride = static_cast<size_t>(out_w) * out_h * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      if (vct_decode_resize(jpegs[i], lens[i], out_w, out_h, out + stride * i)) {
        std::memset(out + stride * i, 0, stride);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Returns the decoded (width << 16 | height)... kept simple: probe dims.
int vct_probe(const uint8_t* jpeg_data, size_t jpeg_len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(jpeg_data), jpeg_len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
