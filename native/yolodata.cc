// yolodata: native host-side image loading runtime for yolo_v3_tpu.
//
// The reference's host input path is OpenCV decode/resize driven from Python
// worker processes (reference dataset.py:194-195, evaluate.py:216).  This is
// the TPU framework's native equivalent: a C++ thread-pool pipeline that
// decodes JPEGs (libjpeg), letterboxes with the same geometry as
// yolo_v3_tpu.ops.boxes.letterbox_params (int-truncated resize dims,
// floor-div center pads, gray-128 fill, Keys a=-0.75 cubic sampling), and
// hands back ready-to-device float32 NHWC buffers — no Python in the loop
// between file bytes and the batch tensor.
//
// Exposed as a minimal C API for ctypes (see
// yolo_v3_tpu/data/native_loader.py).

#include <algorithm>
#include <atomic>
#include <cmath>
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

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) -> RGB uint8
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// Cubic resize (Keys a = -0.75, half-pixel centers, clamped borders) —
// the same convention as ops/letterbox.py's matmul resize and OpenCV's
// INTER_CUBIC kernel.
// ---------------------------------------------------------------------------

inline float keys(float t) {
  const float a = -0.75f;
  t = std::fabs(t);
  if (t <= 1.f) return ((a + 2.f) * t - (a + 3.f)) * t * t + 1.f;
  if (t < 2.f) return (((t - 5.f) * t + 8.f) * t - 4.f) * a;
  return 0.f;
}

struct Taps {
  int idx[4];
  float w[4];
};

std::vector<Taps> make_taps(int src, int dst) {
  std::vector<Taps> taps(dst);
  double scale = double(src) / dst;
  for (int i = 0; i < dst; ++i) {
    double s = (i + 0.5) * scale - 0.5;
    int base = int(std::floor(s));
    float sum = 0.f;
    for (int k = 0; k < 4; ++k) {
      int j = base - 1 + k;
      float wt = keys(float(s - j));
      taps[i].idx[k] = std::min(std::max(j, 0), src - 1);
      taps[i].w[k] = wt;
      sum += wt;
    }
    for (int k = 0; k < 4; ++k) taps[i].w[k] /= sum;
  }
  return taps;
}

// Letterbox uint8 RGB [h, w, 3].  fdst (float32 [out_h, out_w, 3] in [0,1])
// or udst (uint8 [out_h, out_w, 3], cv2 pixel semantics) — exactly one is
// non-null.  The uint8 form is the int8 serving path's native feed
// (models/quantized.py u8 entry): 4x less host->device transfer.
void letterbox(const uint8_t* src, int w, int h, float* fdst, uint8_t* udst,
               int out_w, int out_h) {
  double ratio = std::min(double(out_w) / w, double(out_h) / h);
  int rw = int(w * ratio), rh = int(h * ratio);
  int xp = (out_w - rw) / 2, yp = (out_h - rh) / 2;

  if (fdst) {
    std::fill(fdst, fdst + size_t(out_w) * out_h * 3, 128.f / 255.f);
  } else {
    std::fill(udst, udst + size_t(out_w) * out_h * 3, uint8_t(128));
  }

  std::vector<Taps> tx = make_taps(w, rw), ty = make_taps(h, rh);

  // horizontal pass: [h, rw, 3] floats
  std::vector<float> tmp(size_t(h) * rw * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + size_t(y) * w * 3;
    float* trow = tmp.data() + size_t(y) * rw * 3;
    for (int x = 0; x < rw; ++x) {
      const Taps& t = tx[x];
      for (int c = 0; c < 3; ++c) {
        float v = 0.f;
        for (int k = 0; k < 4; ++k) v += t.w[k] * srow[t.idx[k] * 3 + c];
        trow[x * 3 + c] = v;
      }
    }
  }
  // vertical pass into the padded canvas
  for (int y = 0; y < rh; ++y) {
    const Taps& t = ty[y];
    size_t off = (size_t(y + yp) * out_w + xp) * 3;
    for (int x = 0; x < rw * 3; ++x) {
      float v = 0.f;
      for (int k = 0; k < 4; ++k)
        v += t.w[k] * tmp[size_t(t.idx[k]) * rw * 3 + x];
      if (fdst) {
        fdst[off + x] = std::min(std::max(v / 255.f, 0.f), 1.f);
      } else {
        udst[off + x] =
            uint8_t(std::min(std::max(int(v + 0.5f), 0), 255));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Thread-pool loader
// ---------------------------------------------------------------------------

struct Job {
  int64_t tag;
  std::string path;
  int out_w, out_h;
  int fmt;  // 0 = float32 [0,1], 1 = uint8
};

struct Result {
  int64_t tag;
  int status;  // 0 ok, <0 error
  int org_w, org_h;
  std::vector<float> pixels;       // [out_h, out_w, 3] when fmt == 0
  std::vector<uint8_t> pixels_u8;  // [out_h, out_w, 3] when fmt == 1
};

struct Loader {
  std::vector<std::thread> workers;
  std::deque<Job> jobs;
  std::deque<Result> results;
  std::mutex mu;
  std::condition_variable cv_job, cv_res;
  std::atomic<bool> stop{false};

  explicit Loader(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_job.notify_all();
    for (auto& t : workers) t.join();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      Result res;
      res.tag = job.tag;
      res.status = -1;
      res.org_w = res.org_h = 0;

      FILE* f = fopen(job.path.c_str(), "rb");
      if (f) {
        fseek(f, 0, SEEK_END);
        long len = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> bytes(len);
        if (fread(bytes.data(), 1, len, f) == size_t(len)) {
          std::vector<uint8_t> rgb;
          int w = 0, h = 0;
          if (decode_jpeg(bytes.data(), bytes.size(), &rgb, &w, &h)) {
            res.org_w = w;
            res.org_h = h;
            if (job.fmt == 1) {
              res.pixels_u8.resize(size_t(job.out_w) * job.out_h * 3);
              letterbox(rgb.data(), w, h, nullptr, res.pixels_u8.data(),
                        job.out_w, job.out_h);
            } else {
              res.pixels.resize(size_t(job.out_w) * job.out_h * 3);
              letterbox(rgb.data(), w, h, res.pixels.data(), nullptr,
                        job.out_w, job.out_h);
            }
            res.status = 0;
          } else {
            res.status = -2;  // not a decodable jpeg
          }
        }
        fclose(f);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        results.push_back(std::move(res));
      }
      cv_res.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* yolodata_create(int n_threads) { return new Loader(n_threads); }

void yolodata_destroy(void* h) { delete static_cast<Loader*>(h); }

void yolodata_submit(void* h, int64_t tag, const char* path, int out_w,
                     int out_h) {
  Loader* ldr = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(ldr->mu);
    ldr->jobs.push_back(Job{tag, path, out_w, out_h, /*fmt=*/0});
  }
  ldr->cv_job.notify_one();
}

// fmt: 0 = float32 in [0,1], 1 = uint8 (read back with yolodata_next_u8)
void yolodata_submit_fmt(void* h, int64_t tag, const char* path, int out_w,
                         int out_h, int fmt) {
  Loader* ldr = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(ldr->mu);
    ldr->jobs.push_back(Job{tag, path, out_w, out_h, fmt});
  }
  ldr->cv_job.notify_one();
}

// Blocks for the next finished result.  Copies pixels into `out` (must hold
// out_w*out_h*3 floats).  Returns status (0 ok, <0 error); fills tag/org
// dims.
int yolodata_next(void* h, int64_t* tag, float* out, int out_capacity,
                  int* org_w, int* org_h) {
  Loader* ldr = static_cast<Loader*>(h);
  Result res;
  {
    std::unique_lock<std::mutex> lk(ldr->mu);
    ldr->cv_res.wait(lk, [ldr] { return !ldr->results.empty(); });
    res = std::move(ldr->results.front());
    ldr->results.pop_front();
  }
  *tag = res.tag;
  *org_w = res.org_w;
  *org_h = res.org_h;
  if (res.status == 0) {
    if (int(res.pixels.size()) > out_capacity) return -3;
    std::memcpy(out, res.pixels.data(), res.pixels.size() * sizeof(float));
  }
  return res.status;
}

// uint8 variant: pops results submitted with fmt=1.
int yolodata_next_u8(void* h, int64_t* tag, uint8_t* out, int out_capacity,
                     int* org_w, int* org_h) {
  Loader* ldr = static_cast<Loader*>(h);
  Result res;
  {
    std::unique_lock<std::mutex> lk(ldr->mu);
    ldr->cv_res.wait(lk, [ldr] { return !ldr->results.empty(); });
    res = std::move(ldr->results.front());
    ldr->results.pop_front();
  }
  *tag = res.tag;
  *org_w = res.org_w;
  *org_h = res.org_h;
  if (res.status == 0) {
    if (int(res.pixels_u8.size()) > out_capacity) return -3;
    std::memcpy(out, res.pixels_u8.data(), res.pixels_u8.size());
  }
  return res.status;
}

}  // extern "C"
