// Native batch JPEG decoder for the host input pipeline.
//
// TPU chips do not decode JPEG; the pragmatic split (SURVEY.md §7 "Hard
// parts" #2) is host-side decode straight into the loader's padded static
// buffer (stride = max_w * 3, top-left aligned) so Python never touches
// pixels — the buffer is handed to jax.device_put as-is. Oversized images
// are downscaled with libjpeg's fractional DCT scaling (1/2, 1/4, 1/8)
// until they fit the static buffer, mirroring what the reference got from
// cv2.imdecode + resize.
//
// Build: make (g++ -O3 -shared, links -ljpeg -lpthread).
// Python binding: ctypes in cvm_tpu/native/__init__.py (PIL fallback).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <pthread.h>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

}  // namespace

extern "C" {

// Decode one JPEG into out[max_h][max_w][3] (RGB, row stride max_w*3).
// Returns 0 on success; fills out_h/out_w with the decoded (possibly
// DCT-downscaled) size. Non-fatal failure returns nonzero and leaves the
// buffer untouched.
int cvm_decode_into(const uint8_t* jpeg, unsigned long len, uint8_t* out,
                    int max_h, int max_w, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, jpeg, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain downscale until the frame fits the static buffer.
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  while (cinfo.scale_denom < 8) {
    jpeg_calc_output_dimensions(&cinfo);
    if ((int)cinfo.output_height <= max_h && (int)cinfo.output_width <= max_w)
      break;
    cinfo.scale_denom *= 2;
  }
  jpeg_calc_output_dimensions(&cinfo);
  if ((int)cinfo.output_height > max_h || (int)cinfo.output_width > max_w) {
    jpeg_destroy_decompress(&cinfo);
    return 3;  // still too large at 1/8 — caller should raise max buffer
  }
  jpeg_start_decompress(&cinfo);
  const int stride = max_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  *out_h = (int)cinfo.output_height;
  *out_w = (int)cinfo.output_width;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct BatchTask {
  int n;
  const uint8_t* const* jpegs;
  const unsigned long* lens;
  uint8_t* out;        // n * max_h * max_w * 3
  int max_h, max_w;
  int* out_hw;         // n * 2 (h, w)
  int* rc;             // n return codes
  int next;            // work index (guarded by mu)
  pthread_mutex_t mu;
};

void* batch_worker(void* arg) {
  BatchTask* t = static_cast<BatchTask*>(arg);
  const size_t frame = (size_t)t->max_h * t->max_w * 3;
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->n) break;
    t->rc[i] = cvm_decode_into(t->jpegs[i], t->lens[i], t->out + frame * i,
                               t->max_h, t->max_w, &t->out_hw[2 * i],
                               &t->out_hw[2 * i + 1]);
  }
  return nullptr;
}

// Decode a batch with a transient thread pool. Returns count of failures.
int cvm_decode_batch(int n, const uint8_t* const* jpegs,
                     const unsigned long* lens, uint8_t* out, int max_h,
                     int max_w, int* out_hw, int* rc, int num_threads) {
  BatchTask t{n, jpegs, lens, out, max_h, max_w, out_hw, rc, 0,
              PTHREAD_MUTEX_INITIALIZER};
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;
  pthread_t threads[64];
  if (num_threads > 64) num_threads = 64;
  for (int i = 0; i < num_threads; ++i)
    pthread_create(&threads[i], nullptr, batch_worker, &t);
  for (int i = 0; i < num_threads; ++i) pthread_join(threads[i], nullptr);
  int failures = 0;
  for (int i = 0; i < n; ++i) failures += (rc[i] != 0);
  return failures;
}

}  // extern "C"
