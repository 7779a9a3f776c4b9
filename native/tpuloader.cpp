// tpuloader: native data-loading core for the TPU input pipeline.
//
// The reference framework leans on native code through its dependencies
// (OpenCV decode/resize, libjpeg, torch DataLoader's C++ workers — see
// SURVEY.md §2.9); this library is the framework's own native equivalent:
// a multi-threaded image decoder + random-crop sampler that fills
// preallocated float32 RGB batch buffers, handing Python zero-copy numpy
// views. The heavy randomized degradation stays ON DEVICE
// (trainner_tpu/data/pipeline.py); this covers the host-side
// decode/crop/collate hot path that Python threads serialize on.
//
// Build: make -C native   (produces libtpuloader.so, linked against
// system libjpeg / libpng / zlib; no other deps).
//
// C API (ctypes-friendly):
//   tl_decode(path, out_w, out_h, out_c) -> float* (caller frees via
//       tl_free) — decode one JPEG/PNG to float32 RGB HWC in [0,1].
//   tl_create(paths, n, crop, batch, n_threads, seed) -> handle:
//       background pool decoding random crops into a bounded queue.
//   tl_next(handle, out) -> fills out[batch*crop*crop*3].
//   tl_destroy(handle).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
};

// ---------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
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
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() +
                   size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG
bool decode_png(FILE* f, Image* out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
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
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr,
               nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = int(w);
  out->h = int(h);
  out->c = 3;
  out->data.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (magic[0] == 0x89 && magic[1] == 0x50) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ------------------------------------------------------------- loader
struct Loader {
  std::vector<std::string> paths;
  int crop = 128;
  int batch = 16;
  size_t sample_floats = 0;

  std::queue<std::vector<float>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  size_t max_queue = 8;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker_main(uint64_t seed) {
    std::mt19937_64 rng(seed);
    while (!stop.load()) {
      // produce one batch
      std::vector<float> buf(size_t(batch) * sample_floats);
      for (int b = 0; b < batch; ++b) {
        Image img;
        // retry until a decodable, big-enough image is found
        for (int tries = 0; tries < 16; ++tries) {
          const std::string& p =
              paths[std::uniform_int_distribution<size_t>(
                  0, paths.size() - 1)(rng)];
          if (decode_file(p.c_str(), &img) && img.w >= crop &&
              img.h >= crop)
            break;
          img.w = img.h = 0;
        }
        float* dst = buf.data() + size_t(b) * sample_floats;
        if (img.w < crop || img.h < crop) {
          std::memset(dst, 0, sample_floats * sizeof(float));
          continue;
        }
        int y0 = std::uniform_int_distribution<int>(0, img.h - crop)(rng);
        int x0 = std::uniform_int_distribution<int>(0, img.w - crop)(rng);
        bool flip = std::uniform_int_distribution<int>(0, 1)(rng) != 0;
        const float inv = 1.0f / 255.0f;
        for (int y = 0; y < crop; ++y) {
          const uint8_t* src =
              img.data.data() + (size_t(y0 + y) * img.w + x0) * 3;
          float* drow = dst + size_t(y) * crop * 3;
          if (!flip) {
            for (int x = 0; x < crop * 3; ++x) drow[x] = src[x] * inv;
          } else {
            for (int x = 0; x < crop; ++x) {
              const uint8_t* s = src + (crop - 1 - x) * 3;
              drow[x * 3 + 0] = s[0] * inv;
              drow[x * 3 + 1] = s[1] * inv;
              drow[x * 3 + 2] = s[2] * inv;
            }
          }
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return ready.size() < max_queue || stop.load();
      });
      if (stop.load()) return;
      ready.push(std::move(buf));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// one-shot decode: returns malloc'd float32 RGB HWC in [0,1]
float* tl_decode(const char* path, int* out_h, int* out_w, int* out_c) {
  Image img;
  if (!decode_file(path, &img)) return nullptr;
  size_t n = size_t(img.w) * img.h * 3;
  float* out = static_cast<float*>(malloc(n * sizeof(float)));
  if (!out) return nullptr;
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) out[i] = img.data[i] * inv;
  *out_h = img.h;
  *out_w = img.w;
  *out_c = 3;
  return out;
}

void tl_free(float* p) { free(p); }

void* tl_create(const char** paths, int n_paths, int crop, int batch,
                int n_threads, uint64_t seed) {
  if (n_paths <= 0 || crop <= 0 || batch <= 0) return nullptr;
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->crop = crop;
  L->batch = batch;
  L->sample_floats = size_t(crop) * crop * 3;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back(&Loader::worker_main, L, seed + t * 7919);
  return L;
}

// fills out[batch * crop * crop * 3]; returns 0 on success
int tl_next(void* handle, float* out) {
  Loader* L = static_cast<Loader*>(handle);
  std::vector<float> buf;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return !L->ready.empty() || L->stop; });
    if (L->ready.empty()) return 1;
    buf = std::move(L->ready.front());
    L->ready.pop();
    L->cv_space.notify_one();
  }
  std::memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

void tl_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_ready.notify_all();
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
