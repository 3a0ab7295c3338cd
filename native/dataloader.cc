// Native data-loading core for NLSPN-TPU.
//
// The reference relied on torch DataLoader's C++ worker machinery for its
// input pipeline (/root/reference/src/main.py:100-107); this library is our
// equivalent: multithreaded 16-bit depth-PNG decode (KITTI DC stores depth
// as uint16 PNG / 256 — reference src/data/kittidc.py:71-82), 8-bit RGB
// PNG/JPEG decode with fused ImageNet normalization, and batched variants
// that run on an internal thread pool. Exposed as a C ABI consumed from
// Python via ctypes (nlspn_eccv20_tpu/data/native.py).
//
// Build: make -C native  (produces libnlspn_data.so)

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
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
    for (auto& t : workers_) t.join();
  }
  void Run(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool(int n_hint) {
  static ThreadPool* p = new ThreadPool(
      n_hint > 0 ? n_hint : (int)std::thread::hardware_concurrency());
  return p;
}

struct Latch {
  explicit Latch(int n) : remaining(n) {}
  void Done() {
    std::lock_guard<std::mutex> lk(mu);
    if (--remaining == 0) cv.notify_all();
  }
  void Wait() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return remaining == 0; });
  }
  int remaining;
  std::mutex mu;
  std::condition_variable cv;
};

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------
struct PngImage {
  std::vector<uint8_t> data;  // raw rows, bit_depth-dependent
  int h = 0, w = 0, channels = 0, bit_depth = 0;
};

bool ReadPng(const char* path, PngImage* out, bool keep_16bit) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && out->bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (out->bit_depth == 16 && !keep_16bit) png_set_strip_16(png);
  if (out->bit_depth == 16 && keep_16bit) png_set_swap(png);  // little-endian
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->channels = png_get_channels(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->h);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

bool ReadJpeg(const char* path, PngImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->bit_depth = 8;
  size_t rowbytes = (size_t)out->w * 3;
  out->data.resize(rowbytes * out->h);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + cinfo.output_scanline * rowbytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

}  // namespace

extern "C" {

// Probe dimensions of a PNG without a full decode. Returns 0 on success.
int nl_png_dims(const char* path, int* h, int* w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decode a KITTI 16-bit depth PNG into float32 meters (uint16 / 256).
// `out` must hold h*w floats (use nl_png_dims first). Returns 0 on success,
// 2 if the PNG is not 16-bit single-channel.
int nl_decode_depth_png(const char* path, float* out, int h, int w) {
  PngImage img;
  if (!ReadPng(path, &img, /*keep_16bit=*/true)) return 1;
  if (img.h != h || img.w != w || img.channels != 1 || img.bit_depth != 16)
    return 2;
  const uint16_t* src = reinterpret_cast<const uint16_t*>(img.data.data());
  const float scale = 1.0f / 256.0f;
  for (int i = 0; i < h * w; ++i) out[i] = src[i] * scale;
  return 0;
}

// Decode an 8-bit RGB image (PNG or JPEG by extension sniffing) into
// float32 HWC with fused ImageNet normalization ((x/255 - mean) / std).
int nl_decode_rgb_norm(const char* path, float* out, int h, int w) {
  PngImage img;
  size_t len = std::strlen(path);
  bool is_jpg = len > 4 && (!std::strcmp(path + len - 4, ".jpg") ||
                            !std::strcmp(path + len - 5, ".jpeg"));
  bool ok = is_jpg ? ReadJpeg(path, &img) : ReadPng(path, &img, false);
  if (!ok) return 1;
  if (img.h != h || img.w != w || img.channels < 3 || img.bit_depth != 8)
    return 2;
  const float inv255 = 1.0f / 255.0f;
  const float s0 = inv255 / kStd[0], s1 = inv255 / kStd[1],
              s2 = inv255 / kStd[2];
  const float b0 = -kMean[0] / kStd[0], b1 = -kMean[1] / kStd[1],
              b2 = -kMean[2] / kStd[2];
  const uint8_t* src = img.data.data();
  const int stride = img.channels;
  for (int i = 0; i < h * w; ++i) {
    out[i * 3 + 0] = src[i * stride + 0] * s0 + b0;
    out[i * 3 + 1] = src[i * stride + 1] * s1 + b1;
    out[i * 3 + 2] = src[i * stride + 2] * s2 + b2;
  }
  return 0;
}

// Batched threaded depth decode: paths is n pointers; out is (n, h, w)
// float32. Returns number of failures (0 == all good).
int nl_decode_depth_batch(const char** paths, int n, float* out, int h, int w,
                          int num_threads) {
  ThreadPool* tp = pool(num_threads);
  Latch latch(n);
  std::vector<int> errs(n, 0);
  for (int i = 0; i < n; ++i) {
    tp->Run([&, i] {
      errs[i] = nl_decode_depth_png(paths[i], out + (size_t)i * h * w, h, w);
      latch.Done();
    });
  }
  latch.Wait();
  int bad = 0;
  for (int e : errs) bad += (e != 0);
  return bad;
}

// Batched threaded RGB decode+normalize: out is (n, h, w, 3) float32.
int nl_decode_rgb_batch(const char** paths, int n, float* out, int h, int w,
                        int num_threads) {
  ThreadPool* tp = pool(num_threads);
  Latch latch(n);
  std::vector<int> errs(n, 0);
  for (int i = 0; i < n; ++i) {
    tp->Run([&, i] {
      errs[i] =
          nl_decode_rgb_norm(paths[i], out + (size_t)i * h * w * 3, h, w);
      latch.Done();
    });
  }
  latch.Wait();
  int bad = 0;
  for (int e : errs) bad += (e != 0);
  return bad;
}

// In-place sparse sampling of a depth plane: keep exactly `num_sample`
// random valid (> 1e-4) pixels, zero the rest (reference
// get_sparse_depth, nyu.py:164-182). Deterministic in `seed`
// (SplitMix64 + Fisher-Yates). Returns the number of kept pixels.
int nl_sparse_sample(float* dep, int n, int num_sample, uint64_t seed) {
  std::vector<int> idx;
  idx.reserve(n / 8);
  for (int i = 0; i < n; ++i)
    if (dep[i] > 1e-4f) idx.push_back(i);
  int nv = (int)idx.size();
  if (nv <= num_sample) return nv;

  auto next = [&seed]() {
    seed += 0x9E3779B97f4A7C15ull;
    uint64_t z = seed;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  // partial Fisher-Yates: choose num_sample survivors
  for (int i = 0; i < num_sample; ++i) {
    int j = i + (int)(next() % (uint64_t)(nv - i));
    std::swap(idx[i], idx[j]);
  }
  std::vector<uint8_t> keep(n, 0);
  for (int i = 0; i < num_sample; ++i) keep[idx[i]] = 1;
  for (int i = 0; i < n; ++i)
    if (!keep[i]) dep[i] = 0.0f;
  return num_sample;
}

}  // extern "C"
