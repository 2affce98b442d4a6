// fastimage: native JPEG decode + staging resize for the host data path.
//
// TPU-native replacement for the reference's PIL/torchvision CPU decode
// (reference: src/mamba_clip/data.py:297-314 decodes JPEG bytes from HDF5
// via PIL). On a TPU VM the host CPU is the data-path bottleneck, so this
// module:
//   - decodes with libjpeg's DCT scaling (scale_num/8) so a 4000px source
//     headed for a 256px staging square is decoded at ~1/8 resolution,
//     skipping most of the IDCT work PIL would do;
//   - fuses keep-ratio bilinear resize + center-crop to the square staging
//     buffer in one pass, writing directly into a caller-provided numpy
//     array (no intermediate Python objects);
//   - holds no Python state, so callers drop the GIL for true parallel
//     decode across loader threads (ctypes releases the GIL around calls).
//
// C ABI only; loaded via ctypes (no pybind11 in the image).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize rows [src HxWx3] -> dst (side x side x 3), sampling the
// centered square of the keep-ratio-resized image.
void resize_center_square(const std::vector<uint8_t>& src, int h, int w,
                          int side, uint8_t* dst) {
  const float scale = static_cast<float>(side) / std::min(h, w);
  const float nh = h * scale, nw = w * scale;
  const float y_off = (nh - side) * 0.5f;
  const float x_off = (nw - side) * 0.5f;
  for (int oy = 0; oy < side; ++oy) {
    const float sy = (oy + y_off + 0.5f) / scale - 0.5f;
    const int y0 = std::clamp(static_cast<int>(std::floor(sy)), 0, h - 1);
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = sy - std::floor(sy);
    const uint8_t* row0 = src.data() + static_cast<size_t>(y0) * w * 3;
    const uint8_t* row1 = src.data() + static_cast<size_t>(y1) * w * 3;
    uint8_t* out = dst + static_cast<size_t>(oy) * side * 3;
    for (int ox = 0; ox < side; ++ox) {
      const float sx = (ox + x_off + 0.5f) / scale - 0.5f;
      const int x0 = std::clamp(static_cast<int>(std::floor(sx)), 0, w - 1);
      const int x1 = std::min(x0 + 1, w - 1);
      const float wx = sx - std::floor(sx);
      for (int c = 0; c < 3; ++c) {
        const float top = row0[x0 * 3 + c] * (1 - wx) + row0[x1 * 3 + c] * wx;
        const float bot = row1[x0 * 3 + c] * (1 - wx) + row1[x1 * 3 + c] * wx;
        out[ox * 3 + c] =
            static_cast<uint8_t>(std::lround(top * (1 - wy) + bot * wy));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `jpeg[0:len]` and write an RGB uint8 (side, side, 3) staging
// square into `out`. Returns 0 on success, nonzero on decode failure.
int fastimage_decode_resize(const uint8_t* jpeg, size_t len, int side,
                            uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(jpeg), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;

  // DCT scaling: decode at the smallest 1/8..8/8 size whose short side
  // still covers `side`.
  const int short_side = std::min(cinfo.image_width, cinfo.image_height);
  int num = 8;
  while (num > 1 && (short_side * (num - 1)) / 8 >= static_cast<unsigned>(side) * 1) {
    --num;
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * 3);
  std::vector<uint8_t> line(static_cast<size_t>(w) * ch);
  for (int y = 0; y < h; ++y) {
    JSAMPROW row = line.data();
    jpeg_read_scanlines(&cinfo, &row, 1);
    uint8_t* dstrow = buf.data() + static_cast<size_t>(y) * w * 3;
    if (ch == 3) {
      std::memcpy(dstrow, line.data(), static_cast<size_t>(w) * 3);
    } else {  // grayscale -> RGB
      for (int x = 0; x < w; ++x) {
        dstrow[x * 3] = dstrow[x * 3 + 1] = dstrow[x * 3 + 2] = line[x * ch];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  resize_center_square(buf, h, w, side, out);
  return 0;
}

// Batch variant: decode `n` images (concatenated blobs with offsets) into a
// contiguous (n, side, side, 3) buffer. Offsets has n+1 entries.
int fastimage_decode_batch(const uint8_t* blobs, const int64_t* offsets,
                           int n, int side, uint8_t* out) {
  const size_t stride = static_cast<size_t>(side) * side * 3;
  int rc = 0;
  for (int i = 0; i < n; ++i) {
    const int r = fastimage_decode_resize(
        blobs + offsets[i], static_cast<size_t>(offsets[i + 1] - offsets[i]),
        side, out + stride * i);
    if (r != 0) rc = r;
  }
  return rc;
}

}  // extern "C"
