// JPEG-LS (ITU-T T.87 / LOCO-I) lossless codec for 8/16-bit grayscale.
//
// Native replacement for the reference's `gdcmconv --jpegls` subprocess round
// (/root/reference/src/codec.py:140-142): the reference shells out to GDCM's
// C++ JPEG-LS through temp DICOM files and returns asymmetric byte payloads
// (defect B3 in SURVEY.md 2.4). This implementation is a from-spec, in-process
// codec with a symmetric C API consumed via ctypes
// (codec_tcc_tpu/io/jpegls_binding.py).
//
// Scope: single component, NEAR=0 (lossless), no LSE presets (defaults per
// T.87 C.2.4.1.1), standard J[] run-length table, byte-stuffed bitstream,
// SOI/SOF55/SOS/EOI markers. Encoder and decoder share the modeling code so
// the context state machines cannot drift apart.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

#ifdef JLS_TRACE
#include <cstdio>
#define TR(...) fprintf(stderr, __VA_ARGS__)
#else
#define TR(...)
#endif

namespace {

constexpr int kMinC = -128;
constexpr int kMaxC = 127;
constexpr int kReset = 64;

const int kJ[32] = {0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
                    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15};

struct Params {
  int maxval, range, qbpp, bpp, limit;
  int t1, t2, t3;
};

Params make_params(int bits) {
  Params p{};
  p.maxval = (1 << bits) - 1;
  p.range = p.maxval + 1;          // NEAR = 0
  p.bpp = std::max(2, bits);
  p.qbpp = p.bpp;                  // NEAR = 0
  p.limit = 2 * (p.bpp + std::max(8, p.bpp));
  // default thresholds, T.87 C.2.4.1.1.1 with NEAR = 0
  if (p.maxval >= 128) {
    int factor = (std::min(p.maxval, 4095) + 128) >> 8;
    p.t1 = std::clamp(factor + 2, 1, p.maxval);
    p.t2 = std::clamp(4 * factor + 3, p.t1, p.maxval);
    p.t3 = std::clamp(17 * factor + 4, p.t2, p.maxval);
  } else {
    int factor = 256 / (p.maxval + 1);
    p.t1 = std::clamp(std::max(2, 3 / factor), 1, p.maxval);
    p.t2 = std::clamp(std::max(3, 7 / factor), p.t1, p.maxval);
    p.t3 = std::clamp(std::max(4, 21 / factor), p.t2, p.maxval);
  }
  return p;
}

struct Ctx {
  // 365 regular contexts + 2 run-interruption contexts (365, 366)
  int A[367], B[367], C[367], N[367];
  int Nn[2];  // negative-error counters for contexts 365/366
  int run_index = 0;

  void init(const Params& p) {
    int a0 = std::max(2, (p.range + 32) >> 6);
    for (int i = 0; i < 367; i++) {
      A[i] = a0;
      B[i] = 0;
      C[i] = 0;
      N[i] = 1;
    }
    Nn[0] = Nn[1] = 0;
    run_index = 0;
  }
};

int quantize(int d, const Params& p) {
  if (d <= -p.t3) return -4;
  if (d <= -p.t2) return -3;
  if (d <= -p.t1) return -2;
  if (d < 0) return -1;       // NEAR = 0
  if (d == 0) return 0;
  if (d < p.t1) return 1;
  if (d < p.t2) return 2;
  if (d < p.t3) return 3;
  return 4;
}

int med_predict(int a, int b, int c) {
  if (c >= std::max(a, b)) return std::min(a, b);
  if (c <= std::min(a, b)) return std::max(a, b);
  return a + b - c;
}

// ---------------------------------------------------------------------------
// bit I/O with JPEG-LS byte stuffing (a 0 bit follows every 0xFF byte)
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t>& out;
  uint32_t acc = 0;
  int nbits = 0;       // bits currently in acc
  int cap = 8;         // bits the next emitted byte can hold

  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}

  void put(int bit) {
    acc = (acc << 1) | (bit & 1);
    if (++nbits == cap) {
      uint8_t byte = static_cast<uint8_t>(acc);
      if (cap == 7) byte &= 0x7F;  // stuffed 0 occupies the MSB
      out.push_back(byte);
      cap = (byte == 0xFF) ? 7 : 8;
      acc = 0;
      nbits = 0;
    }
  }

  void put_bits(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) put((v >> i) & 1);
  }

  void flush() {
    while (nbits != 0) put(0);
  }
};

struct BitReader {
  const uint8_t* data;
  size_t size, pos = 0;
  uint32_t acc = 0;
  int nbits = 0;
  bool prev_ff = false;
  bool overrun = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  void fill() {
    while (nbits <= 24) {
      if (pos >= size) {
        // feed zeros past the end; flag if bits are actually consumed later
        acc = (acc << 8);
        nbits += 8;
        overrun = true;
        continue;
      }
      uint8_t byte = data[pos++];
      if (prev_ff) {
        acc = (acc << 7) | (byte & 0x7F);
        nbits += 7;
      } else {
        acc = (acc << 8) | byte;
        nbits += 8;
      }
      prev_ff = (byte == 0xFF);
    }
  }

  int get() {
    if (nbits == 0) fill();
    nbits--;
    return (acc >> nbits) & 1;
  }

  uint32_t get_bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | get();
    return v;
  }
};

// ---------------------------------------------------------------------------
// limited-length Golomb coding (T.87 A.5.3)
// ---------------------------------------------------------------------------

void golomb_encode(BitWriter& bw, int merr, int k, int limit, int qbpp) {
  int hi = merr >> k;
  if (hi < limit - qbpp - 1) {
    for (int i = 0; i < hi; i++) bw.put(0);
    bw.put(1);
    bw.put_bits(static_cast<uint32_t>(merr) & ((1u << k) - 1), k);
  } else {
    for (int i = 0; i < limit - qbpp - 1; i++) bw.put(0);
    bw.put(1);
    bw.put_bits(static_cast<uint32_t>(merr - 1), qbpp);
  }
}

int golomb_decode(BitReader& br, int k, int limit, int qbpp) {
  int hi = 0;
  while (br.get() == 0) {
    if (++hi > limit) return -1;  // corrupt stream guard
  }
  if (hi < limit - qbpp - 1) {
    return (hi << k) | static_cast<int>(br.get_bits(k));
  }
  return static_cast<int>(br.get_bits(qbpp)) + 1;
}

int golomb_k(int n, int a) {
  int k = 0;
  while ((n << k) < a && k < 24) k++;
  return k;
}

// ---------------------------------------------------------------------------
// regular-mode error coding (shared state updates)
// ---------------------------------------------------------------------------

void update_regular(Ctx& ctx, int q, int errval) {
  ctx.B[q] += errval;  // NEAR=0: *(2*NEAR+1) == 1
  ctx.A[q] += std::abs(errval);
  if (ctx.N[q] == kReset) {
    ctx.A[q] >>= 1;
    ctx.B[q] = (ctx.B[q] >= 0) ? (ctx.B[q] >> 1) : -((1 - ctx.B[q]) >> 1);
    ctx.N[q] >>= 1;
  }
  ctx.N[q]++;
  // bias computation (A.6.2)
  if (ctx.B[q] <= -ctx.N[q]) {
    if (ctx.C[q] > kMinC) ctx.C[q]--;
    ctx.B[q] += ctx.N[q];
    if (ctx.B[q] <= -ctx.N[q]) ctx.B[q] = -ctx.N[q] + 1;
  } else if (ctx.B[q] > 0) {
    if (ctx.C[q] < kMaxC) ctx.C[q]++;
    ctx.B[q] -= ctx.N[q];
    if (ctx.B[q] > 0) ctx.B[q] = 0;
  }
}

int modulo_range(int errval, const Params& p) {
  if (errval < 0) errval += p.range;
  if (errval >= (p.range + 1) / 2) errval -= p.range;
  return errval;
}

// run-interruption sample state update (A.7.2)
void update_interrupt(Ctx& ctx, int q, int errval, int emerr, int ritype) {
  if (errval < 0) ctx.Nn[q - 365]++;
  ctx.A[q] += (emerr + 1 - ritype) >> 1;
  if (ctx.N[q] == kReset) {
    ctx.A[q] >>= 1;
    ctx.N[q] >>= 1;
    ctx.Nn[q - 365] >>= 1;
  }
  ctx.N[q]++;
}

// ---------------------------------------------------------------------------
// encoder
// ---------------------------------------------------------------------------

void put_u16(std::vector<uint8_t>& out, uint16_t v) {
  out.push_back(v >> 8);
  out.push_back(v & 0xFF);
}

void encode_scan(const uint16_t* src, int h, int w, const Params& p,
                 std::vector<uint8_t>& out) {
  Ctx ctx;
  ctx.init(p);
  BitWriter bw(out);

  std::vector<int> prev(w + 2, 0), cur(w + 2, 0);
  int pprev_first = 0;  // recon(y-2, 0): the Rc of each line's first sample

  for (int y = 0; y < h; y++) {
    int rc_first = (y >= 2) ? pprev_first : 0;
    pprev_first = (y >= 1) ? prev[1] : 0;
    for (int x = 0; x < w;) {
      int a = (x == 0) ? ((y > 0) ? prev[1] : 0) : cur[x];
      int b = (y > 0) ? prev[x + 1] : 0;
      int c = (x == 0) ? rc_first : ((y > 0) ? prev[x] : 0);
      int d = (y > 0) ? ((x + 1 < w) ? prev[x + 2] : b) : 0;

      int q1 = quantize(d - b, p), q2 = quantize(b - c, p), q3 = quantize(c - a, p);

      if (q1 == 0 && q2 == 0 && q3 == 0) {
        // ---- run mode (A.7) ----
        TR("E runenter y=%d x=%d a=%d b=%d c=%d d=%d\n", y, x, a, b, c, d);
        int runcnt = 0;
        int xs = x;
        while (x < w && static_cast<int>(src[y * w + x]) == a) {
          cur[x + 1] = a;
          x++;
          runcnt++;
        }
        (void)xs;
        // encode run length
        int rc = runcnt;
        while (rc >= (1 << kJ[ctx.run_index])) {
          bw.put(1);
          rc -= 1 << kJ[ctx.run_index];
          if (ctx.run_index < 31) ctx.run_index++;
        }
        if (x >= w) {
          // run broken by end of line
          if (rc > 0) bw.put(1);
          continue;
        }
        // run interrupted by a mismatching sample
        bw.put(0);
        bw.put_bits(static_cast<uint32_t>(rc), kJ[ctx.run_index]);
        int jri = kJ[ctx.run_index];
        if (ctx.run_index > 0) ctx.run_index--;

        // interruption sample (A.7.2)
        int xv = static_cast<int>(src[y * w + x]);
        b = (y > 0) ? prev[x + 1] : 0;
        int ritype = (a == b) ? 1 : 0;   // NEAR = 0
        int px = ritype ? a : b;
        int errval = xv - px;
        int sign = (!ritype && a > b) ? -1 : 1;
        if (sign < 0) errval = -errval;
        errval = modulo_range(errval, p);

        int q = 365 + ritype;
        int temp = ritype ? (ctx.A[366] + (ctx.N[366] >> 1)) : ctx.A[365];
        int k = golomb_k(ctx.N[q], temp);
        int map;
        if (k == 0 && errval > 0 && 2 * ctx.Nn[q - 365] < ctx.N[q]) map = 1;
        else if (errval < 0 && 2 * ctx.Nn[q - 365] >= ctx.N[q]) map = 1;
        else if (errval < 0 && k != 0) map = 1;
        else map = 0;
        int emerr = 2 * std::abs(errval) - ritype - map;
        TR("E run y=%d x=%d runcnt=%d ri=%d k=%d e=%d emerr=%d jri=%d\n", y, x, runcnt, ritype, k, errval, emerr, jri);
        golomb_encode(bw, emerr, k, p.limit - jri - 1, p.qbpp);
        update_interrupt(ctx, q, errval, emerr, ritype);

        cur[x + 1] = xv;
        x++;
        continue;
      }

      // ---- regular mode (A.4-A.6) ----
      int sign = 1, q;
      if (q1 < 0 || (q1 == 0 && (q2 < 0 || (q2 == 0 && q3 < 0)))) {
        sign = -1;
        q = ((-q1) * 9 + (-q2)) * 9 + (-q3);
      } else {
        q = (q1 * 9 + q2) * 9 + q3;
      }
      int px = med_predict(a, b, c);
      px += (sign > 0) ? ctx.C[q] : -ctx.C[q];
      px = std::clamp(px, 0, p.maxval);

      int xv = static_cast<int>(src[y * w + x]);
      int errval = xv - px;
      if (sign < 0) errval = -errval;
      errval = modulo_range(errval, p);

      int k = golomb_k(ctx.N[q], ctx.A[q]);
      int merr;
      if (k == 0 && 2 * ctx.B[q] <= -ctx.N[q]) {
        merr = (errval >= 0) ? 2 * errval + 1 : -2 * (errval + 1);
      } else {
        merr = (errval >= 0) ? 2 * errval : -2 * errval - 1;
      }
      TR("E reg y=%d x=%d q=%d k=%d e=%d merr=%d B=%d N=%d C=%d A=%d\n", y, x, q, k, errval, merr, ctx.B[q], ctx.N[q], ctx.C[q], ctx.A[q]);
      golomb_encode(bw, merr, k, p.limit, p.qbpp);
      update_regular(ctx, q, errval);

      cur[x + 1] = xv;  // lossless: reconstruction == source
      x++;
    }
    cur[0] = cur[1];
    std::swap(prev, cur);
  }
  bw.flush();
}

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

bool decode_scan(BitReader& br, uint16_t* dst, int h, int w, const Params& p) {
  Ctx ctx;
  ctx.init(p);

  std::vector<int> prev(w + 2, 0), cur(w + 2, 0);
  int pprev_first = 0;

  for (int y = 0; y < h; y++) {
    int rc_first = (y >= 2) ? pprev_first : 0;
    pprev_first = (y >= 1) ? prev[1] : 0;
    for (int x = 0; x < w;) {
      int a = (x == 0) ? ((y > 0) ? prev[1] : 0) : cur[x];
      int b = (y > 0) ? prev[x + 1] : 0;
      int c = (x == 0) ? rc_first : ((y > 0) ? prev[x] : 0);
      int d = (y > 0) ? ((x + 1 < w) ? prev[x + 2] : b) : 0;

      int q1 = quantize(d - b, p), q2 = quantize(b - c, p), q3 = quantize(c - a, p);

      if (q1 == 0 && q2 == 0 && q3 == 0) {
        // ---- run mode ----
        TR("D runenter y=%d x=%d a=%d b=%d c=%d d=%d\n", y, x, a, b, c, d);
        int remaining = w - x;
        int runcnt = 0;
        bool interrupted = true;
        while (br.get() == 1) {
          int chunk = std::min(1 << kJ[ctx.run_index], remaining - runcnt);
          runcnt += chunk;
          if (chunk == (1 << kJ[ctx.run_index]) && ctx.run_index < 31) {
            ctx.run_index++;
          }
          if (runcnt == remaining) {
            interrupted = false;  // run to end of line
            break;
          }
        }
        if (interrupted) {
          // the 0 bit was just consumed; remainder follows in J bits
          runcnt += static_cast<int>(br.get_bits(kJ[ctx.run_index]));
        }
        for (int i = 0; i < runcnt; i++) {
          cur[x + 1] = a;
          dst[y * w + x] = static_cast<uint16_t>(a);
          x++;
        }
        if (!interrupted) continue;  // end of line

        int jri = kJ[ctx.run_index];
        if (ctx.run_index > 0) ctx.run_index--;

        b = (y > 0) ? prev[x + 1] : 0;
        int ritype = (a == b) ? 1 : 0;
        int px = ritype ? a : b;
        int q = 365 + ritype;
        int temp = ritype ? (ctx.A[366] + (ctx.N[366] >> 1)) : ctx.A[365];
        int k = golomb_k(ctx.N[q], temp);
        int emerr = golomb_decode(br, k, p.limit - jri - 1, p.qbpp);
        TR("D run y=%d x=%d runcnt=%d ri=%d k=%d emerr=%d jri=%d\n", y, x, runcnt, ritype, k, emerr, jri);
        if (emerr < 0) return false;

        // invert the interruption mapping: temp2 = 2|e| - map, so the low
        // bit of temp2 IS map, and the sign follows from the map condition
        int temp2 = emerr + ritype;
        int map = temp2 & 1;
        int mag = (temp2 + map) / 2;
        bool neg_case = (k != 0 || 2 * ctx.Nn[q - 365] >= ctx.N[q]);
        int errval = (map == (neg_case ? 1 : 0)) ? -mag : mag;

        int sign = (!ritype && a > b) ? -1 : 1;
        int xv = px + sign * errval;
        if (xv < 0) xv += p.range;
        else if (xv > p.maxval) xv -= p.range;
        xv = std::clamp(xv, 0, p.maxval);

        update_interrupt(ctx, q, errval, emerr, ritype);
        cur[x + 1] = xv;
        dst[y * w + x] = static_cast<uint16_t>(xv);
        x++;
        continue;
      }

      // ---- regular mode ----
      int sign = 1, q;
      if (q1 < 0 || (q1 == 0 && (q2 < 0 || (q2 == 0 && q3 < 0)))) {
        sign = -1;
        q = ((-q1) * 9 + (-q2)) * 9 + (-q3);
      } else {
        q = (q1 * 9 + q2) * 9 + q3;
      }
      int px = med_predict(a, b, c);
      px += (sign > 0) ? ctx.C[q] : -ctx.C[q];
      px = std::clamp(px, 0, p.maxval);

      int k = golomb_k(ctx.N[q], ctx.A[q]);
      int merr = golomb_decode(br, k, p.limit, p.qbpp);
      TR("D reg y=%d x=%d q=%d k=%d merr=%d B=%d N=%d C=%d A=%d\n", y, x, q, k, merr, ctx.B[q], ctx.N[q], ctx.C[q], ctx.A[q]);
      // NOTE: br.overrun is advisory only — the reader's eager 24-bit
      // prefetch trips it on the padded tail of valid streams
      if (merr < 0) return false;

      // inverse error mapping; the k==0 low-bias twist flips the parity
      // convention (e>=0 -> odd codes instead of even)
      int errval;
      if (k == 0 && 2 * ctx.B[q] <= -ctx.N[q]) {
        errval = (merr & 1) ? (merr - 1) / 2 : -(merr + 2) / 2;
      } else {
        errval = (merr & 1) ? -(merr + 1) / 2 : merr / 2;
      }

      int xv = px + sign * errval;
      if (xv < 0) xv += p.range;
      else if (xv > p.maxval) xv -= p.range;
      xv = std::clamp(xv, 0, p.maxval);

      update_regular(ctx, q, errval);
      cur[x + 1] = xv;
      dst[y * w + x] = static_cast<uint16_t>(xv);
      x++;
    }
    cur[0] = cur[1];
    std::swap(prev, cur);
  }
  // note: br.overrun may be set by eager read-ahead past the padded tail of a
  // valid stream, so it is not a failure signal; corrupt streams are caught
  // by the unary-run guard in golomb_decode
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// Returns 0 on success. dst receives a complete JPEG-LS stream.
int jls_encode(const uint16_t* src, int h, int w, int bits, uint8_t* dst,
               size_t dst_cap, size_t* out_size) {
  if (h <= 0 || w <= 0 || bits < 2 || bits > 16) return 1;
  // T.87 SOF55 carries dimensions as 16-bit fields and this encoder emits no
  // LSE oversize extension; larger images would silently truncate (put_u16)
  // into a stream that decodes to the wrong geometry.
  if (h > 65535 || w > 65535) return 1;
  Params p = make_params(bits);
  std::vector<uint8_t> out;
  out.reserve(static_cast<size_t>(h) * w / 2 + 64);

  out.push_back(0xFF); out.push_back(0xD8);              // SOI
  out.push_back(0xFF); out.push_back(0xF7);              // SOF55
  put_u16(out, 11);
  out.push_back(static_cast<uint8_t>(bits));
  put_u16(out, static_cast<uint16_t>(h));
  put_u16(out, static_cast<uint16_t>(w));
  out.push_back(1);                                      // 1 component
  out.push_back(1); out.push_back(0x11); out.push_back(0);
  out.push_back(0xFF); out.push_back(0xDA);              // SOS
  put_u16(out, 8);
  out.push_back(1);                                      // 1 component in scan
  out.push_back(1); out.push_back(0);
  out.push_back(0);                                      // NEAR = 0
  out.push_back(0);                                      // ILV = none
  out.push_back(0);                                      // Al/Ah

  encode_scan(src, h, w, p, out);

  out.push_back(0xFF); out.push_back(0xD9);              // EOI

  if (out.size() > dst_cap) return 2;
  std::memcpy(dst, out.data(), out.size());
  *out_size = out.size();
  return 0;
}

// Parses the header only. Returns 0 on success.
int jls_probe(const uint8_t* src, size_t n, int* h, int* w, int* bits) {
  if (n < 20 || src[0] != 0xFF || src[1] != 0xD8) return 1;
  size_t pos = 2;
  while (pos + 4 <= n) {
    if (src[pos] != 0xFF) return 1;
    uint8_t marker = src[pos + 1];
    if (marker == 0xF7) {  // SOF55
      if (pos + 9 >= n) return 1;
      *bits = src[pos + 4];
      *h = (src[pos + 5] << 8) | src[pos + 6];
      *w = (src[pos + 7] << 8) | src[pos + 8];
      return 0;
    }
    uint16_t len = (src[pos + 2] << 8) | src[pos + 3];
    pos += 2 + len;
  }
  return 1;
}

// Returns 0 on success; fills dst (row-major uint16, even for 8-bit data).
int jls_decode(const uint8_t* src, size_t n, uint16_t* dst, size_t dst_cap,
               int* out_h, int* out_w, int* out_bits) {
  int h = 0, w = 0, bits = 0;
  if (jls_probe(src, n, &h, &w, &bits) != 0) return 1;
  if (bits < 2 || bits > 16 || h <= 0 || w <= 0) return 1;
  if (dst_cap < static_cast<size_t>(h) * w) return 2;

  // find SOS and the start of entropy data
  size_t pos = 2;
  size_t data_start = 0;
  while (pos + 4 <= n) {
    if (src[pos] != 0xFF) return 1;
    uint8_t marker = src[pos + 1];
    uint16_t len = (src[pos + 2] << 8) | src[pos + 3];
    if (marker == 0xDA) {
      data_start = pos + 2 + len;
      break;
    }
    pos += 2 + len;
  }
  // Require at least the 2-byte EOI after the entropy segment start: the
  // BitReader size below subtracts 2, and `data_start == n - 1` would wrap
  // the unsigned subtraction to SIZE_MAX (out-of-bounds reads in fill()).
  if (data_start == 0 || data_start + 2 > n) return 1;

  Params p = make_params(bits);
  BitReader br(src + data_start, n - data_start - 2);  // exclude EOI
  if (!decode_scan(br, dst, h, w, p)) return 3;
  *out_h = h;
  *out_w = w;
  *out_bits = bits;
  return 0;
}

}  // extern "C"
