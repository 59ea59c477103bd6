// Native runtime for the TPU gaussian-splatting framework.
//
// The reference implements its hot non-device paths in C++/CUDA submodules
// (diff-gaussian-rasterization, simple-knn, fused-ssim); on TPU the device
// work moved to Pallas/XLA, and this library provides the *host* runtime the
// framework needs around it:
//
//   - COLMAP binary model parsing (cameras/images/points3D), replacing
//     per-record Python struct loops (reference scene/colmap_loader.py),
//   - JPEG/PNG decode + bilinear resize for the camera/data loader
//     (reference uses PIL in utils/camera_utils.py; here decoding runs in
//     C++ with the GIL released so the training loop overlaps host IO with
//     TPU compute),
//   - Morton-ordered approximate 3-NN mean distance for Gaussian scale init
//     (the role of the reference's simple-knn CUDA submodule,
//     submodules/simple-knn/simple_knn.cu) for host-side initialisation.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------- COLMAP

// points3D.bin record: id u64 | xyz 3xf64 | rgb 3xu8 | err f64 |
//                      track_len u64 | track 2xu32 * len
// Returns the number of points, or -1 on error.  First call with
// xyz == nullptr to get the count, then with allocated buffers.
long long colmap_read_points3d(const char* path, double* xyz, uint8_t* rgb,
                               double* err, long long* ids) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  if (xyz == nullptr) { fclose(f); return (long long)n; }

  // Read the whole file once; parse from memory (fast on network FS too).
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 8, SEEK_SET);
  std::vector<uint8_t> buf(size - 8);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return -1; }
  fclose(f);

  const uint8_t* p = buf.data();
  const uint8_t* end = p + buf.size();
  for (uint64_t i = 0; i < n; i++) {
    if (p + 8 + 24 + 3 + 8 + 8 > end) return -1;
    uint64_t id;
    memcpy(&id, p, 8); p += 8;
    memcpy(xyz + 3 * i, p, 24); p += 24;
    memcpy(rgb + 3 * i, p, 3); p += 3;
    memcpy(err + i, p, 8); p += 8;
    uint64_t track_len;
    memcpy(&track_len, p, 8); p += 8;
    if ((long long)track_len < 0 || p + 8 * (long long)track_len > end) return -1;
    p += 8 * track_len;
    if (ids) ids[i] = (long long)id;
  }
  return (long long)n;
}

// images.bin. Two-pass ctypes protocol:
//   pass 1 (meta == nullptr): returns total byte size needed for the
//     variable-length blob (names + 2D points); counts[0] = num images.
//   pass 2: fills fixed-size meta (per image: qvec 4d, tvec 3d) doubles,
//     int32 ids[2*i]=image_id, ids[2*i+1]=camera_id, npts[i], and the blob:
//     for each image, name bytes (nul-terminated) then, if want_points2d,
//     npts * (x f64, y f64, id i64) packed records.
long long colmap_read_images(const char* path, int want_points2d,
                             double* meta, int* ids, long long* npts,
                             uint8_t* blob, long long blob_cap,
                             long long* counts) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return -1; }
  fclose(f);

  const uint8_t* p = buf.data();
  const uint8_t* end = p + buf.size();
  if (p + 8 > end) return -1;
  uint64_t n;
  memcpy(&n, p, 8); p += 8;
  if (counts) counts[0] = (long long)n;

  long long blob_needed = 0;
  long long blob_off = 0;
  for (uint64_t i = 0; i < n; i++) {
    if (p + 4 + 32 + 24 + 4 > end) return -1;
    int32_t image_id, camera_id;
    memcpy(&image_id, p, 4); p += 4;
    const uint8_t* q = p; p += 56;  // qvec + tvec
    memcpy(&camera_id, p, 4); p += 4;
    const uint8_t* name_start = p;
    while (p < end && *p != 0) p++;
    if (p >= end) return -1;
    long long name_len = (p - name_start) + 1;  // include nul
    p++;
    if (p + 8 > end) return -1;
    uint64_t np2d;
    memcpy(&np2d, p, 8); p += 8;
    if ((long long)np2d < 0 || p + 24 * (long long)np2d > end) return -1;
    long long pts_bytes = want_points2d ? (long long)np2d * 24 : 0;

    if (meta == nullptr) {
      blob_needed += name_len + pts_bytes;
    } else {
      memcpy(meta + 7 * i, q, 56);
      ids[2 * i] = image_id;
      ids[2 * i + 1] = camera_id;
      npts[i] = (long long)np2d;
      if (blob_off + name_len + pts_bytes > blob_cap) return -1;
      memcpy(blob + blob_off, name_start, name_len);
      blob_off += name_len;
      if (want_points2d) {
        memcpy(blob + blob_off, p, pts_bytes);
        blob_off += pts_bytes;
      }
    }
    p += 24 * np2d;
  }
  return meta == nullptr ? blob_needed : blob_off;
}

// cameras.bin: per camera: id i32, model_id i32, width u64, height u64,
// params nparams*f64.  Fixed worst-case params = 12 (FULL_OPENCV).
// out layout per camera: id, model_id, width, height, nparams (5 x i64)
// followed in params_out by 12 doubles.
long long colmap_read_cameras(const char* path, long long* out,
                              double* params_out, long long cap) {
  static const int kNumParams[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  if (out == nullptr) { fclose(f); return (long long)n; }
  if ((long long)n > cap) { fclose(f); return -1; }
  for (uint64_t i = 0; i < n; i++) {
    int32_t id, model_id;
    uint64_t w, h;
    if (fread(&id, 4, 1, f) != 1 || fread(&model_id, 4, 1, f) != 1 ||
        fread(&w, 8, 1, f) != 1 || fread(&h, 8, 1, f) != 1) { fclose(f); return -1; }
    if (model_id < 0 || model_id > 10) { fclose(f); return -1; }
    int np = kNumParams[model_id];
    out[5 * i] = id;
    out[5 * i + 1] = model_id;
    out[5 * i + 2] = (long long)w;
    out[5 * i + 3] = (long long)h;
    out[5 * i + 4] = np;
    if (fread(params_out + 12 * i, 8, np, f) != (size_t)np) { fclose(f); return -1; }
  }
  fclose(f);
  return (long long)n;
}

// ---------------------------------------------------------------- images

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

// Decode JPEG/PNG (sniffed by magic bytes). Two-pass:
//   out == nullptr: fills dims[0..2] = h, w, channels; returns 0.
//   out != nullptr: fills h*w*channels uint8 (RGB or RGBA or gray); 0 = ok.
int image_decode(const char* path, uint8_t* out, long long* dims) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  fseek(f, 0, SEEK_SET);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    // JPEG
    JpegErr jerr;
    jpeg_decompress_struct cinfo;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
      return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    long long h = cinfo.output_height, w = cinfo.output_width, c = cinfo.output_components;
    dims[0] = h; dims[1] = w; dims[2] = c;
    if (out == nullptr) {
      jpeg_abort_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
      return 0;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row = out + (long long)cinfo.output_scanline * w * c;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int bit_depth = png_get_bit_depth(png, info);
    int color_type = png_get_color_type(png, info);
    // Normalise to 8-bit RGB/RGBA/gray (16-bit depth PNGs stay 16-bit gray).
    bool is_depth16 = (bit_depth == 16 && color_type == PNG_COLOR_TYPE_GRAY);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (bit_depth == 16 && !is_depth16) png_set_strip_16(png);
    if (is_depth16) png_set_swap(png);  // PNG is big-endian; we want LE u16
    png_read_update_info(png, info);
    int channels = png_get_channels(png, info);
    int bytes_per = is_depth16 ? 2 : 1;
    dims[0] = h; dims[1] = w; dims[2] = is_depth16 ? -1 : channels;  // -1 marks u16 depth
    if (out == nullptr) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return 0;
    }
    std::vector<png_bytep> rows(h);
    for (png_uint_32 i = 0; i < h; i++)
      rows[i] = out + (long long)i * w * channels * bytes_per;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
  }
  fclose(f);
  return -3;  // unknown format
}

// Bilinear resize uint8 HWC -> HWC (align_corners=false, pixel-center
// sampling — matches PIL Image.BILINEAR for downscale factors >= 1 closely
// and is the documented loader contract).
int image_resize_bilinear_u8(const uint8_t* in, long long ih, long long iw,
                             long long c, uint8_t* out, long long oh,
                             long long ow) {
  if (ih <= 0 || iw <= 0 || oh <= 0 || ow <= 0 || c <= 0) return -1;
  const double sy = (double)ih / oh;
  const double sx = (double)iw / ow;
  for (long long y = 0; y < oh; y++) {
    double fy = (y + 0.5) * sy - 0.5;
    long long y0 = (long long)floor(fy);
    double wy = fy - y0;
    long long y1 = y0 + 1;
    y0 = std::max(0LL, std::min(ih - 1, y0));
    y1 = std::max(0LL, std::min(ih - 1, y1));
    for (long long x = 0; x < ow; x++) {
      double fx = (x + 0.5) * sx - 0.5;
      long long x0 = (long long)floor(fx);
      double wx = fx - x0;
      long long x1 = x0 + 1;
      x0 = std::max(0LL, std::min(iw - 1, x0));
      x1 = std::max(0LL, std::min(iw - 1, x1));
      const uint8_t* p00 = in + (y0 * iw + x0) * c;
      const uint8_t* p01 = in + (y0 * iw + x1) * c;
      const uint8_t* p10 = in + (y1 * iw + x0) * c;
      const uint8_t* p11 = in + (y1 * iw + x1) * c;
      uint8_t* o = out + (y * ow + x) * c;
      for (long long k = 0; k < c; k++) {
        double v = (1 - wy) * ((1 - wx) * p00[k] + wx * p01[k]) +
                   wy * ((1 - wx) * p10[k] + wx * p11[k]);
        o[k] = (uint8_t)std::lround(std::min(255.0, std::max(0.0, v)));
      }
    }
  }
  return 0;
}

// uint8 HWC -> float32 CHW in [0,1] (PILtoTorch, utils/general_utils.py:21-27)
int image_u8_hwc_to_f32_chw(const uint8_t* in, long long h, long long w,
                            long long c, float* out) {
  const float inv = 1.0f / 255.0f;
  for (long long k = 0; k < c; k++)
    for (long long y = 0; y < h; y++)
      for (long long x = 0; x < w; x++)
        out[(k * h + y) * w + x] = in[(y * w + x) * c + k] * inv;
  return 0;
}

// ---------------------------------------------------------------- KNN

static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

// Mean of squared distances to the 3 nearest neighbors, approximated by a
// +-window scan along the Morton order (simple_knn.cu's strategy).
int knn_mean_sq_dist(const float* pts, long long n, int window, float* out) {
  if (n <= 1) {
    for (long long i = 0; i < n; i++) out[i] = 0.0f;
    return 0;
  }
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (long long i = 0; i < n; i++)
    for (int k = 0; k < 3; k++) {
      lo[k] = std::min(lo[k], pts[3 * i + k]);
      hi[k] = std::max(hi[k], pts[3 * i + k]);
    }
  std::vector<std::pair<uint32_t, uint32_t>> order(n);
  for (long long i = 0; i < n; i++) {
    uint32_t q[3];
    for (int k = 0; k < 3; k++) {
      float span = std::max(hi[k] - lo[k], 1e-9f);
      float t = (pts[3 * i + k] - lo[k]) / span * 1023.0f;
      q[k] = (uint32_t)std::min(1023.0f, std::max(0.0f, t));
    }
    order[i] = {expand_bits(q[0]) | (expand_bits(q[1]) << 1) |
                    (expand_bits(q[2]) << 2),
                (uint32_t)i};
  }
  std::sort(order.begin(), order.end());

  for (long long i = 0; i < n; i++) {
    const float* a = pts + 3 * order[i].second;
    float best[3] = {1e30f, 1e30f, 1e30f};
    long long jlo = std::max(0LL, i - window);
    long long jhi = std::min(n - 1, i + window);
    for (long long j = jlo; j <= jhi; j++) {
      if (j == i) continue;
      const float* b = pts + 3 * order[j].second;
      float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best[0]) { best[2] = best[1]; best[1] = best[0]; best[0] = d2; }
      else if (d2 < best[1]) { best[2] = best[1]; best[1] = d2; }
      else if (d2 < best[2]) { best[2] = d2; }
    }
    float m = 0.0f; int cnt = 0;
    for (int k = 0; k < 3; k++) if (best[k] < 1e29f) { m += best[k]; cnt++; }
    out[order[i].second] = cnt ? m / cnt : 0.0f;
  }
  return 0;
}

}  // extern "C"
