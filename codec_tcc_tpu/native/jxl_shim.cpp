// In-process JPEG XL lossless codec shim over libjxl.so.0.7.
//
// The reference shells out to cjxl.exe / djxl.exe through temp PNG files
// (/root/reference/src/codec.py:108-182); this shim provides the same
// lossless round-trip as two C calls against the system libjxl, with no
// subprocess, no temp files, and no PNG detour. Grayscale uint8/uint16 only
// (the codec registry's contract). bits_per_sample is always the full dtype
// width so integer samples pass through unscaled and the decoder can
// recover the dtype from the codestream.
//
// Built by codec_tcc_tpu/io/jxl_binding.py:
//   g++ -O2 -fPIC -shared jxl_shim.cpp -l:libjxl.so.0.7 -o libjxlshim.so

#include <cstring>
#include <vector>

#include "jxl_min.h"

namespace {

int run_encoder_output(JxlEncoder* enc, std::vector<uint8_t>& out) {
  out.resize(1 << 16);
  uint8_t* next_out = out.data();
  size_t avail = out.size();
  for (;;) {
    JxlEncoderStatus st = JxlEncoderProcessOutput(enc, &next_out, &avail);
    if (st == JXL_ENC_SUCCESS) {
      out.resize(next_out - out.data());
      return 0;
    }
    if (st == JXL_ENC_NEED_MORE_OUTPUT) {
      size_t done = next_out - out.data();
      out.resize(out.size() * 2);
      next_out = out.data() + done;
      avail = out.size() - done;
      continue;
    }
    return 1;
  }
}

}  // namespace

extern "C" {

// Returns 0 on success; dst receives a complete JXL codestream/container.
int jxl_encode(const void* pixels, int h, int w, int dtype_bits, int effort,
               uint8_t* dst, size_t dst_cap, size_t* out_size) {
  if (h <= 0 || w <= 0 || (dtype_bits != 8 && dtype_bits != 16)) return 1;
  JxlEncoder* enc = JxlEncoderCreate(nullptr);
  if (!enc) return 1;

  JxlBasicInfo info;
  std::memset(&info, 0, sizeof(info));
  JxlEncoderInitBasicInfo(&info);
  info.xsize = static_cast<uint32_t>(w);
  info.ysize = static_cast<uint32_t>(h);
  info.bits_per_sample = static_cast<uint32_t>(dtype_bits);
  info.exponent_bits_per_sample = 0;
  info.num_color_channels = 1;
  info.uses_original_profile = JXL_TRUE;  // required for lossless
  if (JxlEncoderSetBasicInfo(enc, &info) != JXL_ENC_SUCCESS) {
    JxlEncoderDestroy(enc);
    return 2;
  }
  JxlColorEncoding color;
  std::memset(&color, 0, sizeof(color));
  JxlColorEncodingSetToSRGB(&color, JXL_TRUE);
  if (JxlEncoderSetColorEncoding(enc, &color) != JXL_ENC_SUCCESS) {
    JxlEncoderDestroy(enc);
    return 2;
  }

  JxlEncoderFrameSettings* fs = JxlEncoderFrameSettingsCreate(enc, nullptr);
  if (!fs || JxlEncoderSetFrameLossless(fs, JXL_TRUE) != JXL_ENC_SUCCESS) {
    JxlEncoderDestroy(enc);
    return 2;
  }
  // effort 3 mirrors the reference's `cjxl -d 0 -e 3` (src/codec.py:122)
  JxlEncoderFrameSettingsSetOption(fs, JXL_ENC_FRAME_SETTING_EFFORT, effort);

  JxlPixelFormat fmt = {
      1, dtype_bits == 16 ? JXL_TYPE_UINT16 : JXL_TYPE_UINT8,
      JXL_LITTLE_ENDIAN, 0,
  };
  size_t nbytes = static_cast<size_t>(h) * w * (dtype_bits / 8);
  if (JxlEncoderAddImageFrame(fs, &fmt, pixels, nbytes) != JXL_ENC_SUCCESS) {
    JxlEncoderDestroy(enc);
    return 3;
  }
  JxlEncoderCloseInput(enc);

  std::vector<uint8_t> out;
  int rc = run_encoder_output(enc, out);
  JxlEncoderDestroy(enc);
  if (rc != 0) return 3;
  if (out.size() > dst_cap) return 4;
  std::memcpy(dst, out.data(), out.size());
  *out_size = out.size();
  return 0;
}

// Parses the basic info only. Returns 0 on success.
int jxl_probe(const uint8_t* src, size_t n, int* out_h, int* out_w,
              int* out_bits) {
  JxlDecoder* dec = JxlDecoderCreate(nullptr);
  if (!dec) return 1;
  int rc = 1;
  if (JxlDecoderSubscribeEvents(dec, JXL_DEC_BASIC_INFO) == JXL_DEC_SUCCESS &&
      JxlDecoderSetInput(dec, src, n) == JXL_DEC_SUCCESS) {
    JxlDecoderCloseInput(dec);
    for (;;) {
      JxlDecoderStatus st = JxlDecoderProcessInput(dec);
      if (st == JXL_DEC_BASIC_INFO) {
        JxlBasicInfo info;
        std::memset(&info, 0, sizeof(info));
        if (JxlDecoderGetBasicInfo(dec, &info) == JXL_DEC_SUCCESS &&
            info.num_color_channels == 1 && info.xsize && info.ysize) {
          *out_h = static_cast<int>(info.ysize);
          *out_w = static_cast<int>(info.xsize);
          *out_bits = static_cast<int>(info.bits_per_sample);
          rc = 0;
        }
        break;
      }
      if (st != JXL_DEC_SUCCESS && st != JXL_DEC_FULL_IMAGE) break;
    }
  }
  JxlDecoderDestroy(dec);
  return rc;
}

// Returns 0 on success; fills dst (row-major uint16 regardless of depth).
int jxl_decode(const uint8_t* src, size_t n, uint16_t* dst, size_t dst_cap,
               int* out_h, int* out_w, int* out_bits) {
  JxlDecoder* dec = JxlDecoderCreate(nullptr);
  if (!dec) return 1;
  if (JxlDecoderSubscribeEvents(dec, JXL_DEC_BASIC_INFO | JXL_DEC_FULL_IMAGE) !=
          JXL_DEC_SUCCESS ||
      JxlDecoderSetInput(dec, src, n) != JXL_DEC_SUCCESS) {
    JxlDecoderDestroy(dec);
    return 1;
  }
  JxlDecoderCloseInput(dec);

  JxlBasicInfo info;
  std::memset(&info, 0, sizeof(info));
  JxlPixelFormat fmt = {1, JXL_TYPE_UINT16, JXL_LITTLE_ENDIAN, 0};
  int rc = 1;
  for (;;) {
    JxlDecoderStatus st = JxlDecoderProcessInput(dec);
    if (st == JXL_DEC_BASIC_INFO) {
      if (JxlDecoderGetBasicInfo(dec, &info) != JXL_DEC_SUCCESS) break;
      if (info.num_color_channels != 1 || info.xsize == 0 || info.ysize == 0)
        break;  // registry contract: grayscale only
      if (static_cast<size_t>(info.xsize) * info.ysize > dst_cap) {
        rc = 2;
        break;
      }
    } else if (st == JXL_DEC_NEED_IMAGE_OUT_BUFFER) {
      size_t need = 0;
      if (JxlDecoderImageOutBufferSize(dec, &fmt, &need) != JXL_DEC_SUCCESS ||
          need != static_cast<size_t>(info.xsize) * info.ysize * 2)
        break;
      if (JxlDecoderSetImageOutBuffer(dec, &fmt, dst, need) != JXL_DEC_SUCCESS)
        break;
    } else if (st == JXL_DEC_FULL_IMAGE) {
      // one frame is all we encode; keep processing to SUCCESS
    } else if (st == JXL_DEC_SUCCESS) {
      *out_h = static_cast<int>(info.ysize);
      *out_w = static_cast<int>(info.xsize);
      *out_bits = static_cast<int>(info.bits_per_sample);
      rc = 0;
      break;
    } else {
      break;  // error / need-more-input on a complete buffer
    }
  }
  JxlDecoderDestroy(dec);
  return rc;
}

unsigned jxl_runtime_version(void) { return JxlDecoderVersion(); }

}  // extern "C"
