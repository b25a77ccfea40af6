// Native patch decoder for the WSI data pipeline.
//
// Decodes one (input JPEG, label PNG) patch pair straight into caller-owned
// buffers: input as float32 HWC in [0, 1] (or raw uint8 for the device-side
// preprocessing path), label as uint8 {0, 1} (a 0/255 PNG mask divided by
// 255, matching reference utils/data_utils.py:220-221). Fusing decode +
// dtype conversion + scaling in C++ avoids the PIL->numpy intermediate
// copies of the Python path, and ctypes releases the GIL for the whole call
// so the loader's thread pool decodes truly in parallel.
//
// Anything this decoder cannot reproduce with PIL-identical semantics
// (CMYK/odd JPEGs, interlaced PNGs, ...) returns a negative code and the
// Python side falls back to PIL — wrong pixels must never decode "successfully".
//
// Exported C ABI (consumed by data/native_decoder.py via ctypes):
//   int decode_patch_pair(input_path, label_path, float* input_out,
//                         uint8_t* label_out, int expect_h, int expect_w)
//   returns 0 on success, negative error codes otherwise (see the stage
//   comments: -2..-4 are input-JPEG-stage, -5..-8 label-PNG-stage).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cstdint>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// One decode loop for both output flavors: Sink consumes one decoded RGB row
// (w*3 samples). -2: open failure, -3: decode failure, -4: unexpected
// dims/channels.
template <typename Sink>
int decode_jpeg_rgb(const char* path, int expect_h, int expect_w, Sink sink) {
  FILE* f = fopen(path, "rb");
  if (!f) return -2;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  const int c = cinfo.output_components;
  if (h != expect_h || w != expect_w || c != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -4;
  }

  JSAMPARRAY row = (*cinfo.mem->alloc_sarray)(
      reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE, w * c, 1);
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, row, 1);
    sink(y, row[0]);
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int decode_jpeg_rgb_u8(const char* path, uint8_t* out, int expect_h, int expect_w) {
  const int w3 = expect_w * 3;
  return decode_jpeg_rgb(path, expect_h, expect_w,
                         [out, w3](int y, const JSAMPLE* src) {
                           memcpy(out + static_cast<size_t>(y) * w3, src, w3);
                         });
}

int decode_jpeg_rgb01(const char* path, float* out, int expect_h, int expect_w) {
  const int w3 = expect_w * 3;
  constexpr float kInv255 = 1.0f / 255.0f;
  return decode_jpeg_rgb(path, expect_h, expect_w,
                         [out, w3](int y, const JSAMPLE* src) {
                           float* dst = out + static_cast<size_t>(y) * w3;
                           for (int i = 0; i < w3; ++i) dst[i] = src[i] * kInv255;
                         });
}

// -5: open failure, -6: not a PNG / init failure, -7: unexpected dims,
// -8: interlaced (punted to the PIL fallback: a raw png_read_row loop over
//     Adam7 passes would fill the buffer with garbage, not pixels)
int decode_png_label01(const char* path, uint8_t* out, int expect_h, int expect_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -5;

  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(f); return -6; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(f); return -6; }
  // volatile: written between setjmp and a potential longjmp (a corrupt PNG
  // erroring mid-png_read_row lands back here — the row buffer must still be
  // freed, not leaked once per bad file)
  png_bytep volatile row = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free(row);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -6;
  }

  png_init_io(png, f);
  png_read_info(png, info);

  if (png_get_interlace_type(png, info) != PNG_INTERLACE_NONE) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -8;
  }

  // normalize any PNG flavor to 8-bit grayscale (PIL convert("L") semantics
  // for the binary masks this pipeline stores: single-channel 0/255).
  // Color labels use explicit ITU-R 601 weights (0.299/0.587/0.114, PIL's
  // convert("L") matrix) — libpng's defaults are 709, which could flip a
  // near-threshold pixel across the /255 binarization. Exact for the binary
  // 0/255 masks either way; 601 keeps non-binary color labels PIL-consistent.
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  const png_byte color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && png_get_bit_depth(png, info) < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_COLOR)
    png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
  png_read_update_info(png, info);

  const int h = png_get_image_height(png, info);
  const int w = png_get_image_width(png, info);
  if (h != expect_h || w != expect_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -7;
  }

  row = static_cast<png_bytep>(malloc(png_get_rowbytes(png, info)));
  if (!row) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -6;
  }
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row, nullptr);
    uint8_t* dst = out + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) dst[x] = row[x] / 255;  // 0/255 -> 0/1
  }
  free(row);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

int decode_patch_pair(const char* input_path, const char* label_path,
                      float* input_out, uint8_t* label_out,
                      int expect_h, int expect_w) {
  int rc = decode_jpeg_rgb01(input_path, input_out, expect_h, expect_w);
  if (rc != 0) return rc;
  return decode_png_label01(label_path, label_out, expect_h, expect_w);
}

// Raw-uint8 variant for the device-side preprocessing path: pixels stay
// uint8 end-to-end (4x less host->device transfer; normalization runs on the
// TPU), label still {0, 1}.
int decode_patch_pair_u8(const char* input_path, const char* label_path,
                         uint8_t* input_out, uint8_t* label_out,
                         int expect_h, int expect_w) {
  int rc = decode_jpeg_rgb_u8(input_path, input_out, expect_h, expect_w);
  if (rc != 0) return rc;
  return decode_png_label01(label_path, label_out, expect_h, expect_w);
}

int decoder_abi_version() { return 3; }

}  // extern "C"
