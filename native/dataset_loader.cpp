// Native dataset loader with background prefetch.
//
// C++ equivalent of the reference's driver layer (sources/drivers/, C++ with
// OpenCV): decodes JPEG/PNG frames (libjpeg/libpng), converts to float32
// grayscale in [0,1], optionally bilinearly resizes to the network
// resolution, and prefetches frames on worker threads into a bounded ring
// buffer so the accelerator never waits on host I/O.
//
// C ABI consumed via ctypes (deepfactors_tpu/native.py).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // interleaved
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = cinfo.output_components;
  out->data.resize(size_t(out->w) * out->h * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() +
                   size_t(cinfo.output_scanline) * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = w;
  out->h = h;
  out->c = png_get_channels(png, info);
  out->data.resize(size_t(w) * h * out->c);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * out->c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// 16-bit depth PNG -> float meters with scale.
bool decode_png16(const std::string& path, std::vector<float>* out, int* w_out,
                  int* h_out, float scale) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  png_set_swap(png);  // PNG is big-endian
  png_read_update_info(png, info);
  std::vector<uint16_t> raw(size_t(w) * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = reinterpret_cast<png_bytep>(raw.data() + size_t(y) * w);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  out->resize(raw.size());
  for (size_t i = 0; i < raw.size(); ++i) (*out)[i] = raw[i] * scale;
  *w_out = w;
  *h_out = h;
  return true;
}

void to_gray_resized(const Image& img, int out_w, int out_h,
                     std::vector<float>* out) {
  out->resize(size_t(out_w) * out_h);
  const float sx = float(img.w) / out_w;
  const float sy = float(img.h) / out_h;
  for (int y = 0; y < out_h; ++y) {
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      float fy = (y + 0.5f) * sy - 0.5f;
      if (fx < 0) fx = 0;
      if (fy < 0) fy = 0;
      int x0 = int(fx), y0 = int(fy);
      if (x0 > img.w - 2) x0 = img.w - 2;
      if (y0 > img.h - 2) y0 = img.h - 2;
      float wx = fx - x0, wy = fy - y0;
      auto lum = [&](int yy, int xx) -> float {
        const uint8_t* p = img.data.data() + (size_t(yy) * img.w + xx) * img.c;
        if (img.c >= 3)
          // match cv2 BGR luma weights used in system.preprocess_image
          return 0.114f * p[2] + 0.587f * p[1] + 0.299f * p[0];
        return float(p[0]);
      };
      float v00 = lum(y0, x0), v01 = lum(y0, x0 + 1);
      float v10 = lum(y0 + 1, x0), v11 = lum(y0 + 1, x0 + 1);
      float top = v00 * (1 - wx) + v01 * wx;
      float bot = v10 * (1 - wx) + v11 * wx;
      (*out)[size_t(y) * out_w + x] = (top * (1 - wy) + bot * wy) / 255.0f;
    }
  }
}

struct Frame {
  int index = -1;
  std::vector<float> img;
  double timestamp = 0;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> files;
  std::vector<double> timestamps;
  int out_w = 0, out_h = 0;  // 0 = native size
  int native_w = 0, native_h = 0;

  // prefetch machinery
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::queue<int> todo;
  std::vector<Frame> done;
  int next_emit = 0;
  bool stop = false;

  ~Loader() { shutdown(); }

  void shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }
};

bool decode_any(const std::string& path, Image* img) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot);
  for (auto& c : ext) c = tolower(c);
  if (ext == ".jpg" || ext == ".jpeg") return decode_jpeg(path, img);
  if (ext == ".png") return decode_png(path, img);
  return decode_jpeg(path, img) || decode_png(path, img);
}

void worker_loop(Loader* L) {
  for (;;) {
    int idx;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      if (L->stop) return;
      if (L->todo.empty()) return;
      idx = L->todo.front();
      L->todo.pop();
    }
    Frame fr;
    fr.index = idx;
    fr.timestamp = L->timestamps[idx];
    Image img;
    if (decode_any(L->files[idx], &img)) {
      int ow = L->out_w ? L->out_w : img.w;
      int oh = L->out_h ? L->out_h : img.h;
      to_gray_resized(img, ow, oh, &fr.img);
      fr.ok = true;
    }
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->done.push_back(std::move(fr));
    }
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

// files: newline-separated list; timestamps parallel array (may be null).
void* df_loader_new(const char* file_list, const double* timestamps,
                    int n_files, int out_w, int out_h) {
  auto* L = new Loader();
  const char* p = file_list;
  for (int i = 0; i < n_files; ++i) {
    const char* e = strchr(p, '\n');
    if (!e) e = p + strlen(p);
    L->files.emplace_back(p, e);
    L->timestamps.push_back(timestamps ? timestamps[i] : double(i));
    p = (*e) ? e + 1 : e;
  }
  L->out_w = out_w;
  L->out_h = out_h;
  if (!L->files.empty()) {
    Image img;
    if (decode_any(L->files[0], &img)) {
      L->native_w = img.w;
      L->native_h = img.h;
    }
  }
  return L;
}

void df_loader_free(void* h) { delete static_cast<Loader*>(h); }

int df_loader_native_size(void* h, int* w, int* h_out) {
  auto* L = static_cast<Loader*>(h);
  *w = L->native_w;
  *h_out = L->native_h;
  return L->native_w > 0 ? 0 : -1;
}

void df_loader_start(void* h, int n_threads) {
  auto* L = static_cast<Loader*>(h);
  for (size_t i = 0; i < L->files.size(); ++i) L->todo.push(int(i));
  int n = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < n; ++i) L->workers.emplace_back(worker_loop, L);
}

// Blocks until the next in-order frame is decoded. Returns 0 on success,
// 1 on end-of-sequence, -1 on decode failure.
int df_loader_next(void* h, float* img_out, double* ts_out) {
  auto* L = static_cast<Loader*>(h);
  if (L->next_emit >= int(L->files.size())) return 1;
  std::unique_lock<std::mutex> lk(L->mu);
  for (;;) {
    for (auto it = L->done.begin(); it != L->done.end(); ++it) {
      if (it->index == L->next_emit) {
        if (!it->ok) {
          L->done.erase(it);
          L->next_emit++;
          return -1;
        }
        std::memcpy(img_out, it->img.data(), it->img.size() * sizeof(float));
        *ts_out = it->timestamp;
        L->done.erase(it);
        L->next_emit++;
        return 0;
      }
    }
    L->cv_ready.wait(lk);
  }
}

// One-shot 16-bit depth PNG load (ScanNet/TUM depth maps).
int df_load_depth_png(const char* path, float scale, float* out, int max_px,
                      int* w_out, int* h_out) {
  std::vector<float> buf;
  if (!decode_png16(path, &buf, w_out, h_out, scale)) return -1;
  if (int(buf.size()) > max_px) return -2;
  std::memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

}  // extern "C"
