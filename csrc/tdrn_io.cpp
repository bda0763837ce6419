// tdrn_io: native data-plane for the TDRN-TPU framework.
//
// The reference's input pipeline is torch DataLoader worker *processes* doing
// cv2 JPEG decode + resize per frame (SURVEY.md §3.1). Here the host data
// plane is a C++ thread pool: libjpeg decode -> bilinear resize -> optional
// mean-subtract, writing straight into caller-provided (pinned) numpy buffers
// with zero Python-side copies. Exposed as a plain C ABI consumed via ctypes
// (tdrn_tpu/data/native.py); the pure-Python loader is the fallback.
//
// Build: make -C csrc   (produces libtdrn_io.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- error mgmt
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// ---------------------------------------------------------------- decode
// Decode a JPEG byte buffer to RGB8. Returns true on success; fills w/h and
// the (caller-owned, resized) pixel vector.
bool decode_jpeg(const uint8_t* buf, size_t len, std::vector<uint8_t>* pixels,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  pixels->resize(static_cast<size_t>(w) * h * 3);
  const int stride = w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return true;
}

// ---------------------------------------------------------------- resize
// Bilinear RGB8 resize (src HWC) into float32 HWC with optional mean subtract.
void resize_bilinear_f32(const uint8_t* src, int sh, int sw, float* dst, int dh,
                         int dw, const float* mean /*3 or null*/) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  // Precompute per-column source indices/weights (cv2 half-pixel mapping).
  std::vector<int> xs0(dw), xs1(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    const int x0 = static_cast<int>(fx);
    xs0[x] = x0 * 3;
    xs1[x] = (x0 + 1 < sw ? x0 + 1 : sw - 1) * 3;
    wxs[x] = fx - x0;
  }
  const float m0 = mean ? mean[0] : 0.f, m1 = mean ? mean[1] : 0.f,
              m2 = mean ? mean[2] : 0.f;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    const int y0 = static_cast<int>(fy);
    const int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const float wy = fy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    float* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = r0 + xs0[x];
      const uint8_t* p01 = r0 + xs1[x];
      const uint8_t* p10 = r1 + xs0[x];
      const uint8_t* p11 = r1 + xs1[x];
      const float wx = wxs[x];
      float* o = out + x * 3;
      const float t0 = p00[0] + (p01[0] - p00[0]) * wx;
      const float b0 = p10[0] + (p11[0] - p10[0]) * wx;
      o[0] = t0 + (b0 - t0) * wy - m0;
      const float t1 = p00[1] + (p01[1] - p00[1]) * wx;
      const float b1 = p10[1] + (p11[1] - p10[1]) * wx;
      o[1] = t1 + (b1 - t1) * wy - m1;
      const float t2 = p00[2] + (p01[2] - p00[2]) * wx;
      const float b2 = p10[2] + (p11[2] - p10[2]) * wx;
      o[2] = t2 + (b2 - t2) * wy - m2;
    }
  }
}

// ---------------------------------------------------------------- thread pool
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* pool(int n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pool == nullptr || g_pool_size != n) {
    delete g_pool;
    g_pool = new ThreadPool(n);
    g_pool_size = n;
  }
  return g_pool;
}

bool load_one(const char* path, float* dst, int size, const float* mean,
              uint8_t* raw_dst, int* raw_h, int* raw_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != static_cast<size_t>(len)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg(buf.data(), buf.size(), &pixels, &w, &h)) return false;
  if (dst) resize_bilinear_f32(pixels.data(), h, w, dst, size, size, mean);
  if (raw_dst) {  // optional raw copy (capped by caller-provided dims)
    const int ch = *raw_h < h ? *raw_h : h;
    const int cw = *raw_w < w ? *raw_w : w;
    for (int y = 0; y < ch; ++y)
      std::memcpy(raw_dst + static_cast<size_t>(y) * (*raw_w) * 3,
                  pixels.data() + static_cast<size_t>(y) * w * 3,
                  static_cast<size_t>(cw) * 3);
    *raw_h = h;
    *raw_w = w;
  }
  return true;
}

}  // namespace

extern "C" {

// Decode one JPEG file, bilinear-resize to (size,size), optional mean
// subtract, write float32 HWC into out. Returns 0 on success.
int tdrn_decode_resize(const char* path, float* out, int size,
                       const float* mean3) {
  return load_one(path, out, size, mean3, nullptr, nullptr, nullptr) ? 0 : 1;
}

// Batch variant over a thread pool: paths are n zero-terminated strings
// concatenated; offsets[i] is the byte offset of path i. out is (n,size,size,3)
// float32. Returns number of failures.
int tdrn_decode_resize_batch(const char* paths, const int64_t* offsets, int n,
                             float* out, int size, const float* mean3,
                             int num_threads) {
  ThreadPool* p = pool(num_threads);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(size) * size * 3;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      if (!load_one(paths + offsets[i], out + stride * i, size, mean3, nullptr,
                    nullptr, nullptr))
        failures.fetch_add(1);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Probe the decoded dimensions of a JPEG without a full decode.
int tdrn_jpeg_dims(const char* path, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != static_cast<size_t>(len)) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), buf.size());
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
