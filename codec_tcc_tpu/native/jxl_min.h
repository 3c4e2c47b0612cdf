/* Minimal libjxl 0.7 C-API declarations (vendored).
 *
 * The environment ships libjxl.so.0.7 (runtime library only — no dev
 * headers), so the subset of the public API the shim needs is declared here
 * from the documented stable C ABI. Struct layouts and enum values are the
 * v0.7 ones (JxlBasicInfo has carried trailing `padding[100]` reserved bytes
 * since then, and the enums are append-only); the round-trip tests in
 * tests/test_jxl.py validate the ABI agreement at runtime.
 */
#ifndef CODEC_TCC_TPU_JXL_MIN_H_
#define CODEC_TCC_TPU_JXL_MIN_H_

#include <stddef.h>
#include <stdint.h>

extern "C" {

typedef int JxlBool;
#define JXL_TRUE 1
#define JXL_FALSE 0

typedef enum {
  JXL_TYPE_FLOAT = 0,
  JXL_TYPE_UINT8 = 2,
  JXL_TYPE_UINT16 = 3,
  JXL_TYPE_FLOAT16 = 5,
} JxlDataType;

typedef enum {
  JXL_NATIVE_ENDIAN = 0,
  JXL_LITTLE_ENDIAN = 1,
  JXL_BIG_ENDIAN = 2,
} JxlEndianness;

typedef struct {
  uint32_t num_channels;
  JxlDataType data_type;
  JxlEndianness endianness;
  size_t align;
} JxlPixelFormat;

typedef struct {
  uint32_t xsize;
  uint32_t ysize;
} JxlPreviewHeader;

typedef struct {
  uint32_t tps_numerator;
  uint32_t tps_denominator;
  uint32_t num_loops;
  JxlBool have_timecodes;
} JxlAnimationHeader;

typedef int JxlOrientation; /* enum, int-sized; 1 = identity */

typedef struct {
  JxlBool have_container;
  uint32_t xsize;
  uint32_t ysize;
  uint32_t bits_per_sample;
  uint32_t exponent_bits_per_sample;
  float intensity_target;
  float min_nits;
  JxlBool relative_to_max_display;
  float linear_below;
  JxlBool uses_original_profile;
  JxlBool have_preview;
  JxlBool have_animation;
  JxlOrientation orientation;
  uint32_t num_color_channels;
  uint32_t num_extra_channels;
  uint32_t alpha_bits;
  uint32_t alpha_exponent_bits;
  JxlBool alpha_premultiplied;
  JxlPreviewHeader preview;
  JxlAnimationHeader animation;
  uint32_t intrinsic_xsize;
  uint32_t intrinsic_ysize;
  uint8_t padding[100];
} JxlBasicInfo;

typedef struct {
  int color_space;       /* JxlColorSpace */
  int white_point;       /* JxlWhitePoint */
  double white_point_xy[2];
  int primaries;         /* JxlPrimaries */
  double primaries_red_xy[2];
  double primaries_green_xy[2];
  double primaries_blue_xy[2];
  int transfer_function; /* JxlTransferFunction */
  double gamma;
  int rendering_intent;  /* JxlRenderingIntent */
} JxlColorEncoding;

void JxlColorEncodingSetToSRGB(JxlColorEncoding* color_encoding,
                               JxlBool is_gray);

/* ---- encoder ---- */
typedef struct JxlEncoderStruct JxlEncoder;
typedef struct JxlEncoderFrameSettingsStruct JxlEncoderFrameSettings;
typedef enum {
  JXL_ENC_SUCCESS = 0,
  JXL_ENC_ERROR = 1,
  JXL_ENC_NEED_MORE_OUTPUT = 2,
} JxlEncoderStatus;
#define JXL_ENC_FRAME_SETTING_EFFORT 0

JxlEncoder* JxlEncoderCreate(const void* memory_manager);
void JxlEncoderDestroy(JxlEncoder* enc);
void JxlEncoderInitBasicInfo(JxlBasicInfo* info);
JxlEncoderStatus JxlEncoderSetBasicInfo(JxlEncoder* enc,
                                        const JxlBasicInfo* info);
JxlEncoderStatus JxlEncoderSetColorEncoding(JxlEncoder* enc,
                                            const JxlColorEncoding* color);
JxlEncoderFrameSettings* JxlEncoderFrameSettingsCreate(
    JxlEncoder* enc, const JxlEncoderFrameSettings* source);
JxlEncoderStatus JxlEncoderSetFrameLossless(
    JxlEncoderFrameSettings* frame_settings, JxlBool lossless);
JxlEncoderStatus JxlEncoderFrameSettingsSetOption(
    JxlEncoderFrameSettings* frame_settings, int option, int64_t value);
JxlEncoderStatus JxlEncoderAddImageFrame(
    const JxlEncoderFrameSettings* frame_settings,
    const JxlPixelFormat* pixel_format, const void* buffer, size_t size);
void JxlEncoderCloseInput(JxlEncoder* enc);
JxlEncoderStatus JxlEncoderProcessOutput(JxlEncoder* enc, uint8_t** next_out,
                                         size_t* avail_out);

/* ---- decoder ---- */
typedef struct JxlDecoderStruct JxlDecoder;
typedef enum {
  JXL_DEC_SUCCESS = 0,
  JXL_DEC_ERROR = 1,
  JXL_DEC_NEED_MORE_INPUT = 2,
  JXL_DEC_NEED_IMAGE_OUT_BUFFER = 5,
  JXL_DEC_BASIC_INFO = 0x40,
  JXL_DEC_FULL_IMAGE = 0x1000,
} JxlDecoderStatus;

JxlDecoder* JxlDecoderCreate(const void* memory_manager);
void JxlDecoderDestroy(JxlDecoder* dec);
JxlDecoderStatus JxlDecoderSubscribeEvents(JxlDecoder* dec, int events_wanted);
JxlDecoderStatus JxlDecoderSetInput(JxlDecoder* dec, const uint8_t* data,
                                    size_t size);
void JxlDecoderCloseInput(JxlDecoder* dec);
JxlDecoderStatus JxlDecoderProcessInput(JxlDecoder* dec);
JxlDecoderStatus JxlDecoderGetBasicInfo(const JxlDecoder* dec,
                                        JxlBasicInfo* info);
JxlDecoderStatus JxlDecoderImageOutBufferSize(const JxlDecoder* dec,
                                              const JxlPixelFormat* format,
                                              size_t* size);
JxlDecoderStatus JxlDecoderSetImageOutBuffer(JxlDecoder* dec,
                                             const JxlPixelFormat* format,
                                             void* buffer, size_t size);
uint32_t JxlDecoderVersion(void);
uint32_t JxlEncoderVersion(void);

}  /* extern "C" */

#endif  /* CODEC_TCC_TPU_JXL_MIN_H_ */
