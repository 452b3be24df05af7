// vstream_io: native frame-ingestion library for flash_vstream_tpu.
//
// TPU-native replacement for the role decord (C++/FFmpeg) plays in the
// reference (decode + fps subsampling feeding the model,
// Flash-VStream-LLaVA/flash_vstream/serve/cli_video_stream.py:143-146,
// Flash-VStream-Qwen/scripts/extract_frames.py). The Qwen pipeline's
// canonical input is pre-extracted JPEG frame directories; this library
// provides:
//   - fused JPEG decode + resize (libjpeg DCT-domain scaled decode to the
//     nearest >= target size, then one bilinear pass) -> uint8 RGB
//   - a background prefetch loader (decode thread overlapping host decode
//     with device compute; the streaming engine polls completed frames)
//
// C ABI only (loaded via ctypes; pybind11 is not in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG from memory; pick the libjpeg 1/1..8/8 DCT scale so the
// decoded size is the smallest one >= (target_h, target_w) (or full size if
// target <= 0). Returns RGB8 in out (resized to decoded size).
bool decode_jpeg_mem(const uint8_t* data, size_t len, int target_h,
                     int target_w, std::vector<uint8_t>* out, int* out_h,
                     int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (target_h > 0 && target_w > 0) {
    // smallest num/8 scale with scaled size still >= target
    int num = 8;
    for (int n = 1; n <= 8; ++n) {
      long sh = (static_cast<long>(cinfo.image_height) * n + 7) / 8;
      long sw = (static_cast<long>(cinfo.image_width) * n + 7) / 8;
      if (sh >= target_h && sw >= target_w) { num = n; break; }
    }
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height, w = cinfo.output_width;
  const int c = cinfo.output_components;  // 3 (RGB)
  out->resize(static_cast<size_t>(h) * w * 3);
  std::vector<uint8_t> row(static_cast<size_t>(w) * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out->data() + static_cast<size_t>(
        cinfo.output_scanline - 1) * w * 3;
    if (c == 3) {
      std::memcpy(dst, row.data(), static_cast<size_t>(w) * 3);
    } else {  // grayscale -> RGB
      for (int x = 0; x < w; ++x)
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = row[x * c];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return true;
}

// Bilinear resize RGB8 (half-pixel centers, like PIL/torchvision bilinear
// without antialias).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(dh) * dw * 3);
    return;
  }
  const float ys = static_cast<float>(sh) / dh;
  const float xs = static_cast<float>(sw) / dw;
  std::vector<int> x0v(dw), x1v(dw);
  std::vector<float> xwv(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * xs - 0.5f;
    if (fx < 0) fx = 0;
    int x0 = static_cast<int>(fx);
    int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
    x0v[x] = x0; x1v[x] = x1; xwv[x] = fx - x0;
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * ys - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int x0 = x0v[x] * 3, x1 = x1v[x] * 3;
      const float wx = xwv[x];
      for (int k = 0; k < 3; ++k) {
        float top = r0[x0 + k] + (r0[x1 + k] - r0[x0 + k]) * wx;
        float bot = r1[x0 + k] + (r1[x1 + k] - r1[x0 + k]) * wx;
        float v = top + (bot - top) * wy;
        drow[3 * x + k] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = std::fread(out->data(), 1, n, f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

bool decode_file_to(const char* path, int out_h, int out_w, uint8_t* dst) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) return false;
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg_mem(bytes.data(), bytes.size(), out_h, out_w, &rgb, &h,
                       &w))
    return false;
  resize_bilinear(rgb.data(), h, w, dst, out_h, out_w);
  return true;
}

// ---------------------------------------------------------------------------
// Prefetch loader: a worker thread decodes frames ahead into a bounded queue.
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  int out_h, out_w;
  size_t depth;
  std::deque<std::vector<uint8_t>> queue;  // decoded frames, FIFO
  std::deque<int> ok_flags;
  std::mutex mu;
  std::condition_variable cv_pop, cv_push;
  std::thread worker;
  std::atomic<bool> stop{false};
  bool done = false;  // guarded by mu: no more frames will ever be pushed

  void run() {
    for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
      std::vector<uint8_t> buf(static_cast<size_t>(out_h) * out_w * 3);
      bool ok = decode_file_to(paths[i].c_str(), out_h, out_w, buf.data());
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return queue.size() < depth || stop.load(); });
      if (stop.load()) break;
      queue.emplace_back(std::move(buf));
      ok_flags.push_back(ok ? 1 : 0);
      cv_pop.notify_one();
    }
    // Publish exhaustion under the mutex AFTER the last push so a consumer
    // can never observe exhausted-and-empty while a frame is in flight.
    std::lock_guard<std::mutex> lk(mu);
    done = true;
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

// Decode one image file to RGB8 at (out_h, out_w). Returns 0 on success.
int vio_decode_file(const char* path, int out_h, int out_w, uint8_t* dst) {
  return decode_file_to(path, out_h, out_w, dst) ? 0 : 1;
}

// Decode a batch of files into dst[n, out_h, out_w, 3]. Returns number of
// successfully decoded frames (failed slots are zeroed).
int vio_decode_batch(const char** paths, int n, int out_h, int out_w,
                     uint8_t* dst) {
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  int ok_count = 0;
  for (int i = 0; i < n; ++i) {
    uint8_t* d = dst + static_cast<size_t>(i) * stride;
    if (decode_file_to(paths[i], out_h, out_w, d)) {
      ++ok_count;
    } else {
      std::memset(d, 0, stride);
    }
  }
  return ok_count;
}

// Resize RGB8 buffer.
void vio_resize(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                int dw) {
  resize_bilinear(src, sh, sw, dst, dh, dw);
}

void* vio_loader_create(const char** paths, int n, int out_h, int out_w,
                        int prefetch_depth) {
  Loader* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->out_h = out_h;
  l->out_w = out_w;
  l->depth = prefetch_depth > 0 ? prefetch_depth : 8;
  l->worker = std::thread([l] { l->run(); });
  return l;
}

// Pop the next decoded frame into dst. Returns 1 on success, 0 when the
// stream is exhausted, -1 if the frame failed to decode (dst zeroed).
int vio_loader_next(void* handle, uint8_t* dst) {
  Loader* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_pop.wait(lk, [&] { return !l->queue.empty() || l->done; });
  if (l->queue.empty()) return 0;
  std::vector<uint8_t> buf = std::move(l->queue.front());
  l->queue.pop_front();
  int ok = l->ok_flags.front();
  l->ok_flags.pop_front();
  l->cv_push.notify_one();
  lk.unlock();
  std::memcpy(dst, buf.data(), buf.size());
  return ok ? 1 : -1;
}

void vio_loader_destroy(void* handle) {
  Loader* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  l->cv_push.notify_all();
  l->cv_pop.notify_all();
  if (l->worker.joinable()) l->worker.join();
  delete l;
}

}  // extern "C"
