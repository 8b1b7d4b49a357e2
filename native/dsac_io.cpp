// dsac_io: native image decoding + threaded prefetching for the data layer.
//
// TPU-native counterpart of the reference's C++ I/O stack: the png++
// readers (core/read_data.cpp:36-60) and the implicit "loader" role the
// entry programs play when they stream frames from disk.  The reference
// decodes synchronously on the training thread; here a pool of worker
// threads decodes RGB/depth PNG pairs ahead of time into a bounded
// in-order queue so the accelerator never waits on the host.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (dsac_tpu/utils/native_io.py).  Build: native/Makefile (links libpng).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// single-image decode
// ---------------------------------------------------------------------------

// Query dimensions; returns 0 on success.
int dsac_png_size(const char* path, int* width, int* height, int* channels,
                  int* bit_depth) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  *channels = png_get_channels(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decode an 8-bit PNG into RGB (HxWx3, row-major).  Gray/paletted/alpha
// inputs are expanded/stripped to plain RGB.  Returns 0 on success.
int dsac_read_png_rgb(const char* path, uint8_t* out, int width, int height) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  if ((int)png_get_image_width(png, info) != width ||
      (int)png_get_image_height(png, info) != height) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  png_set_expand(png);           // palette/gray -> 8-bit RGB(A)
  png_set_strip_16(png);         // 16 -> 8
  png_set_strip_alpha(png);      // drop alpha
  png_set_gray_to_rgb(png);      // gray -> RGB
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != (size_t)width * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) rows[y] = out + (size_t)y * width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decode a 16-bit grayscale PNG (depth, mm — the 7-Scenes convention the
// reference reads at core/read_data.cpp:36-46) into uint16 HxW.
int dsac_read_png_depth16(const char* path, uint16_t* out, int width,
                          int height) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  if ((int)png_get_image_width(png, info) != width ||
      (int)png_get_image_height(png, info) != height ||
      png_get_bit_depth(png, info) != 16 ||
      png_get_channels(png, info) != 1) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  // PNG is big-endian; swap to host little-endian.
  png_set_swap(png);
  png_read_update_info(png, info);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y)
    rows[y] = reinterpret_cast<png_bytep>(out + (size_t)y * width);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// threaded prefetching loader
// ---------------------------------------------------------------------------

struct Frame {
  std::vector<uint8_t> rgb;
  std::vector<uint16_t> depth;
  int index;     // position in the request sequence
  int file_idx;  // which dataset entry
  int status;    // 0 ok
};

struct Loader {
  std::vector<std::string> rgb_paths;
  std::vector<std::string> depth_paths;
  std::vector<int> sequence;  // order of file indices to emit
  int width = 0, height = 0;
  size_t capacity = 8;

  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::map<int, Frame> ready;  // seq index -> frame (in-order delivery)
  std::atomic<int> next_to_fetch{0};
  int next_to_emit = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  void work() {
    for (;;) {
      int seq = next_to_fetch.fetch_add(1);
      if (seq >= (int)sequence.size()) return;
      Frame f;
      f.index = seq;
      f.file_idx = sequence[seq];
      f.rgb.resize((size_t)width * height * 3);
      f.status =
          dsac_read_png_rgb(rgb_paths[f.file_idx].c_str(), f.rgb.data(),
                            width, height);
      if (!depth_paths.empty()) {
        f.depth.resize((size_t)width * height);
        int s = dsac_read_png_depth16(depth_paths[f.file_idx].c_str(),
                                      f.depth.data(), width, height);
        if (f.status == 0) f.status = s;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_produce.wait(lk, [&] {
        return stop || ready.size() < capacity || f.index == next_to_emit;
      });
      if (stop) return;
      ready.emplace(f.index, std::move(f));
      cv_consume.notify_all();
    }
  }
};

void* dsac_loader_create(const char** rgb_paths, const char** depth_paths,
                         int n_files, const int* sequence, int n_sequence,
                         int width, int height, int n_threads,
                         int capacity) {
  auto* L = new Loader();
  L->width = width;
  L->height = height;
  L->capacity = capacity > 0 ? capacity : 8;
  for (int i = 0; i < n_files; ++i) {
    L->rgb_paths.emplace_back(rgb_paths[i]);
    if (depth_paths) L->depth_paths.emplace_back(depth_paths[i]);
  }
  L->sequence.assign(sequence, sequence + n_sequence);
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

// Blocks until the next in-order frame is ready; copies it out.
// Returns the frame's decode status (0 ok), or -1 when exhausted.
int dsac_loader_next(void* handle, uint8_t* rgb_out, uint16_t* depth_out,
                     int* file_idx_out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= (int)L->sequence.size()) return -1;
  L->cv_consume.wait(lk, [&] {
    return L->ready.count(L->next_to_emit) > 0;
  });
  Frame f = std::move(L->ready[L->next_to_emit]);
  L->ready.erase(L->next_to_emit);
  L->next_to_emit++;
  L->cv_produce.notify_all();
  lk.unlock();
  std::memcpy(rgb_out, f.rgb.data(), f.rgb.size());
  if (depth_out && !f.depth.empty())
    std::memcpy(depth_out, f.depth.data(), f.depth.size() * 2);
  *file_idx_out = f.file_idx;
  return f.status;
}

void dsac_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_produce.notify_all();
  L->next_to_fetch.store(1 << 30);
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
