// C++ host demux core: the native production path of claxon_tpu.
//
// Does for the TPU pipeline what the reference's input.rs/frame.rs/
// subframe.rs layers do natively in Rust (SURVEY.md section 2 parity
// requirement): walk the bit-serial FLAC stream once, verify CRC-8/CRC-16,
// and either
//   * EXTRACT per-(frame, channel) descriptors -- residual/warm-up samples
//     plus (order, shift, coefficients, wasted bits) -- for the batched
//     device kernels (claxon_tpu.ops), or
//   * DECODE fully on the host (prediction + wasted-bits + stereo
//     decorrelation), the reference-fidelity scalar path used as oracle and
//     as the low-latency single-stream fallback.
//
// Semantics (including every validation and its exact error message) mirror
// claxon `src/frame.rs:131-316`, `src/subframe.rs:29-380,651-721`; the two
// implementations are differentially tested against each other and against
// the STREAMINFO MD5 oracle.
//
// C ABI (ctypes, see ../binding.py): cxt_extract/cxt_decode parse a whole
// stream positioned at its first frame byte; counts are queried, the caller
// allocates numpy buffers, cxt_fill/cxt_pcm_fill copy out, cxt_free frees.

#include <cstdint>
#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

// Per-frame descriptor; the SAME definition is the internal storage and
// the C-ABI output record (matched by FRAME_DTYPE in binding.py), so the
// layouts can never drift apart.
struct CxtFrame {
  int64_t time;
  int32_t block_size, channels, mode, bps;
};

namespace {

// ---------------------------------------------------------------------------
// Errors: code 1 = FormatError, 2 = Unsupported, 3 = IoError (EOF).
// Messages are static strings identical to the Python/claxon wording.

struct Err {
  int32_t code;
  const char* msg;
};

[[noreturn]] void fmt_err(const char* msg) { throw Err{1, msg}; }
[[noreturn]] void unsupported(const char* msg) { throw Err{2, msg}; }
[[noreturn]] void eof_err() { throw Err{3, "unexpected end of stream"}; }

// ---------------------------------------------------------------------------
// CRC tables (generated from the polynomials; claxon `src/crc.rs:59-69`).

struct CrcTables {
  uint8_t crc8[256];
  uint16_t crc16[256];
  CrcTables() {
    for (int b = 0; b < 256; ++b) {
      uint32_t c8 = b;
      uint32_t c16 = b << 8;
      for (int i = 0; i < 8; ++i) {
        c8 = (c8 & 0x80) ? ((c8 << 1) ^ 0x07) : (c8 << 1);
        c16 = (c16 & 0x8000) ? ((c16 << 1) ^ 0x8005) : (c16 << 1);
      }
      crc8[b] = (uint8_t)c8;
      crc16[b] = (uint16_t)c16;
    }
  }
};
const CrcTables kCrc;

uint8_t crc8_range(const uint8_t* p, const uint8_t* end) {
  uint8_t crc = 0;
  for (; p < end; ++p) crc = kCrc.crc8[crc ^ *p];
  return crc;
}

uint16_t crc16_range(const uint8_t* p, const uint8_t* end) {
  uint16_t crc = 0;
  for (; p < end; ++p) crc = kCrc.crc16[(crc >> 8) ^ *p] ^ (uint16_t)(crc << 8);
  return crc;
}

// ---------------------------------------------------------------------------
// MSB-first bit reader over an in-memory byte range (the native counterpart
// of claxon `src/input.rs:414-643`). The accumulator keeps unconsumed bits
// left-aligned so the Rice quotient read is a count-leading-zeros.

struct Bits {
  const uint8_t* base;
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;  // top `n` bits are valid; bits below are zero
  int n = 0;

  explicit Bits(const uint8_t* data, size_t len)
      : base(data), p(data), end(data + len) {}

  inline void refill() {
    // Fast path: one unaligned 64-bit load + byte swap inserts every
    // whole byte that fits ((64-n) & ~7 bits) in a single operation.
    if (__builtin_expect(n <= 56 && end - p >= 8, 1)) {
      uint64_t w;
      std::memcpy(&w, p, 8);
      w = __builtin_bswap64(w);
      int t = (64 - n) & ~7;  // >= 8 since n <= 56
      acc |= (w & (~0ULL << (64 - t))) >> n;
      p += t >> 3;
      n += t;
      return;
    }
    while (n <= 56 && p < end) {
      acc |= (uint64_t)(*p++) << (56 - n);
      n += 8;
    }
  }

  inline bool at_eos() const { return n == 0 && p == end; }

  // Read k bits (0 <= k <= 32), MSB-first.
  inline uint32_t read(int k) {
    if (k == 0) return 0;
    if (n < k) {
      refill();
      if (n < k) eof_err();
    }
    uint32_t v = (uint32_t)(acc >> (64 - k));
    acc <<= k;
    n -= k;
    return v;
  }

  inline bool read_bit() { return read(1) != 0; }

  // Count zeros until the terminating 1 (Rice quotient; claxon
  // `src/input.rs:475-511` uses the same leading-zeros acceleration).
  inline uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      if (n == 0) {
        refill();
        if (n == 0) eof_err();
      }
      if (acc == 0) {  // all n buffered bits are zeros
        q += (uint32_t)n;
        n = 0;
        continue;
      }
      int z = __builtin_clzll(acc);  // acc != 0, and z < n by invariant
      q += (uint32_t)z;
      // z can be 63 right after a full-word refill (n == 64); a shift by
      // 64 is UB and would leave a stale bit in the accumulator.
      int c = z + 1;
      acc = (c == 64) ? 0 : acc << c;
      n -= c;
      return q;
    }
  }

  // Drop bits to the next byte boundary (bitstream drop in the reference,
  // `src/frame.rs:744-750`).
  inline void align() {
    int r = n & 7;
    acc <<= r;
    n -= r;
  }

  // Byte offset from `base` of the next unconsumed byte; valid only when
  // byte-aligned.
  inline size_t bytepos() const { return (size_t)(p - base) - (size_t)(n / 8); }

  inline uint32_t read_u8() { return read(8); }
  inline uint32_t read_be_u16() { return read(16); }
};

inline int32_t extend_sign(uint32_t val, int bits) {
  int64_t v = val;
  if (v >= (int64_t)1 << (bits - 1)) v -= (int64_t)1 << bits;
  return (int32_t)v;
}

// ---------------------------------------------------------------------------
// Frame header (claxon `src/frame.rs:131-316`).

struct Header {
  int64_t time;  // resolved first inter-channel sample number
  int32_t block_size;
  int32_t channels;
  int32_t mode;  // 0 independent, 1 left/side, 2 right/side, 3 mid/side
  int32_t bps;   // -1 when the header omits it
};

// "UTF-8"-style variable-length int, up to 36 bits (`src/frame.rs:61-105`).
uint64_t read_var_length_int(Bits& b) {
  uint32_t first = b.read_u8();
  int read_additional = 0;
  uint32_t mask_data = 0x7F, mask_mark = 0x80;
  while (first & mask_mark) {
    ++read_additional;
    mask_data >>= 1;
    mask_mark >>= 1;
  }
  if (read_additional > 0) {
    if (read_additional == 1) fmt_err("invalid variable-length integer");
    --read_additional;
  }
  uint64_t result = (uint64_t)(first & mask_data) << (6 * read_additional);
  for (int i = read_additional - 1; i >= 0; --i) {
    uint32_t byte = b.read_u8();
    if ((byte & 0xC0) != 0x80) fmt_err("invalid variable-length integer");
    result |= (uint64_t)(byte & 0x3F) << (6 * i);
  }
  return result;
}

// Returns false at a clean EOF: the stream ending at the frame boundary
// OR one byte into the would-be sync word, matching the reference's
// read_be_u16_or_eof (`src/input.rs:93-100`).
bool read_frame_header(Bits& b, Header& h) {
  if ((size_t)b.n + 8 * (size_t)(b.end - b.p) < 16) return false;
  size_t hdr_start = b.bytepos();

  uint32_t sync_res_block = b.read_be_u16();
  if ((sync_res_block & 0xFFFC) != 0xFFF8) fmt_err("frame sync code missing");
  if (sync_res_block & 0x0002)
    fmt_err("invalid frame header, encountered reserved value");
  bool variable_blocking = (sync_res_block & 1) != 0;

  uint32_t bs_sr = b.read_u8();
  uint32_t bs_code = bs_sr >> 4;
  int32_t block_size = 0;
  bool read_8bit_bs = false, read_16bit_bs = false;
  if (bs_code == 0) {
    fmt_err("invalid frame header, encountered reserved value");
  } else if (bs_code == 1) {
    block_size = 192;
  } else if (bs_code <= 5) {
    block_size = 576 << (bs_code - 2);
  } else if (bs_code == 6) {
    read_8bit_bs = true;
  } else if (bs_code == 7) {
    read_16bit_bs = true;
  } else {
    block_size = 256 << (bs_code - 8);
  }

  static const int32_t kSampleRates[16] = {
      0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
      32000, 44100, 48000, 96000, -1, -1, -1, -1};
  uint32_t sr_code = bs_sr & 0x0F;
  bool read_8bit_sr = false, read_16bit_sr = false, read_16bit_sr_ten = false;
  if (sr_code == 0x0C) read_8bit_sr = true;
  else if (sr_code == 0x0D) read_16bit_sr = true;
  else if (sr_code == 0x0E) read_16bit_sr_ten = true;
  else if (sr_code == 0x0F) fmt_err("invalid frame header");

  uint32_t chan_bps_res = b.read_u8();
  uint32_t ca = chan_bps_res >> 4;
  if (ca < 8) {
    h.channels = (int32_t)ca + 1;
    h.mode = 0;
  } else if (ca == 0x8) {
    h.channels = 2;
    h.mode = 1;  // left/side
  } else if (ca == 0x9) {
    h.channels = 2;
    h.mode = 2;  // right/side
  } else if (ca == 0xA) {
    h.channels = 2;
    h.mode = 3;  // mid/side
  } else {
    fmt_err("invalid frame header, encountered reserved value");
  }

  static const int32_t kBps[8] = {-1, 8, 12, -2, 16, 20, 24, -2};
  uint32_t bps_code = (chan_bps_res & 0x0E) >> 1;
  int32_t bps = kBps[bps_code];
  if (bps == -2) fmt_err("invalid frame header, encountered reserved value");
  if (chan_bps_res & 1)
    fmt_err("invalid frame header, encountered reserved value");

  uint64_t time_value;
  bool time_is_frame_number;
  if (variable_blocking) {
    time_value = read_var_length_int(b);  // sample number, <= 36 bits
    time_is_frame_number = false;
  } else {
    time_value = read_var_length_int(b);  // frame number, <= 31 bits
    if (time_value > 0x7FFFFFFF)
      fmt_err("invalid frame header, frame number too large");
    time_is_frame_number = true;
  }

  if (read_8bit_bs) block_size = (int32_t)b.read_u8() + 1;
  if (read_16bit_bs) {
    uint32_t bs = b.read_be_u16();
    // 0xffff would exceed the 16-bit max block size in the streaminfo.
    if (bs == 0xFFFF) fmt_err("invalid block size, exceeds 65535");
    block_size = (int32_t)bs + 1;
  }
  if (read_8bit_sr) (void)b.read_u8();
  if (read_16bit_sr) (void)b.read_be_u16();
  if (read_16bit_sr_ten) (void)b.read_be_u16();
  (void)kSampleRates;

  uint8_t computed = crc8_range(b.base + hdr_start, b.base + b.bytepos());
  uint32_t presumed = b.read_u8();
  if (computed != presumed) fmt_err("frame header CRC mismatch");

  h.block_size = block_size;
  h.bps = bps;
  // Reference quirk (`src/frame.rs:771-773`): with fixed-size blocking the
  // time is current_block_size * frame_number.
  h.time = time_is_frame_number ? (int64_t)block_size * (int64_t)time_value
                                : (int64_t)time_value;
  return true;
}

// ---------------------------------------------------------------------------
// Subframes (claxon `src/subframe.rs`).

struct SubDesc {
  int32_t order, shift, wasted, pad_;
  int32_t coefs[32];  // left-padded: coefs[31] multiplies out[t-1]
};

void decode_rice_partition(Bits& b, int32_t* buf, int64_t start, int64_t len,
                           bool rice2) {
  int param_bits = rice2 ? 5 : 4;
  uint32_t rice_param = b.read(param_bits);
  if (rice_param == (uint32_t)((1 << param_bits) - 1))
    unsupported("unencoded binary is not yet implemented");
  int k = (int)rice_param;
  for (int64_t i = start; i < start + len; ++i) {
    // Fast path: after one refill the accumulator holds >= 57 bits, which
    // covers quotient + terminator + remainder for virtually every sample
    // (q + 1 + k <= n). One branch per sample instead of two.
    if (b.n <= 56) b.refill();
    if (__builtin_expect(b.acc != 0, 1)) {
      int z = __builtin_clzll(b.acc);
      // z+1+k < 64 also keeps every shift below 64 (no UB).
      if (__builtin_expect(z + 1 + k <= b.n && z + 1 + k < 64, 1)) {
        uint32_t r = k ? (uint32_t)((b.acc << (z + 1)) >> (64 - k)) : 0;
        b.acc <<= z + 1 + k;
        b.n -= z + 1 + k;
        uint32_t v = (((uint32_t)z) << k) | r;
        buf[i] = (v & 1) ? (int32_t)~(v >> 1) : (int32_t)(v >> 1);
        continue;
      }
    }
    // Slow path: long quotient run or end-of-buffer straddle.
    uint32_t q = b.read_unary();
    uint32_t r = b.read(k);
    // u32 wrap like the reference (`src/subframe.rs:340`).
    uint32_t v = (q << rice_param) | r;
    buf[i] = (v & 1) ? (int32_t)~(v >> 1) : (int32_t)(v >> 1);
  }
}

void decode_residual(Bits& b, int64_t block_size, int32_t* buf, int64_t start,
                     int64_t len) {
  uint32_t method = b.read(2);
  bool rice2;
  if (method == 0) rice2 = false;
  else if (method == 1) rice2 = true;
  else fmt_err("invalid residual, encountered reserved value");

  uint32_t order = b.read(4);
  int64_t n_partitions = (int64_t)1 << order;
  int64_t per_partition = block_size >> order;
  if (block_size & (n_partitions - 1)) fmt_err("invalid partition order");
  int64_t n_warm_up = block_size - len;
  if (n_warm_up > per_partition) fmt_err("invalid residual");

  int64_t pos = start;
  int64_t length = per_partition - n_warm_up;
  for (int64_t p = 0; p < n_partitions; ++p) {
    decode_rice_partition(b, buf, pos, length, rice2);
    pos += length;
    length = per_partition;
  }
}

void decode_verbatim(Bits& b, int bps, int32_t* buf, int64_t start,
                     int64_t len) {
  for (int64_t i = start; i < start + len; ++i)
    buf[i] = extend_sign(b.read(bps), bps);
}

// Pascal's-triangle coefficients (`src/subframe.rs:427-431`), oldest first.
const int32_t kFixedCoefs[5][4] = {
    {}, {1}, {-1, 2}, {1, -3, 3}, {-1, 4, -6, 4}};

// Parse one subframe: fills buf[0..block_size) with warm-up ++ residuals
// (no prediction applied) and the descriptor. Mirrors claxon
// `src/subframe.rs:29-91,184-228,651-721` and claxon_tpu.extract.
void parse_subframe(Bits& b, int bps, int64_t block_size, int32_t* buf,
                    SubDesc& d) {
  // Header: one padding bit, 6-bit type, optional unary wasted-bits count.
  if (b.read_bit()) fmt_err("invalid subframe header");
  uint32_t n = b.read(6);
  enum { CONSTANT, VERBATIM, FIXED, LPC } type;
  int order = 0;
  if (n == 0) {
    type = CONSTANT;
  } else if (n == 1) {
    type = VERBATIM;
  } else if ((n & 0x3E) == 0x02 || (n & 0x3C) == 0x04 || (n & 0x30) == 0x10) {
    fmt_err("invalid subframe header, encountered reserved value");
    __builtin_unreachable();
  } else if ((n & 0x38) == 0x08) {
    order = (int)(n & 0x07);
    if (order > 4)
      fmt_err("invalid subframe header, encountered reserved value");
    type = FIXED;
  } else {
    type = LPC;
    order = (int)(n & 0x1F) + 1;
  }

  // Keep the unary count unsigned so a pathological multi-billion-zero
  // run cannot wrap negative and bypass the bound checks (the reference
  // stays in u32 for the same reason).
  uint32_t wasted_u = 0;
  if (b.read_bit()) wasted_u = 1 + b.read_unary();
  if (wasted_u > 31) fmt_err("wasted bits per sample must not exceed 31");
  int wasted = (int)wasted_u;
  if (wasted >= bps) fmt_err("subframe has no non-wasted bits");
  int sf_bps = bps - wasted;

  std::memset(d.coefs, 0, sizeof(d.coefs));
  d.wasted = wasted;
  d.shift = 0;
  d.order = 0;
  d.pad_ = 0;

  switch (type) {
    case CONSTANT: {
      int32_t v = extend_sign(b.read(sf_bps), sf_bps);
      for (int64_t i = 0; i < block_size; ++i) buf[i] = v;
      return;
    }
    case VERBATIM:
      decode_verbatim(b, sf_bps, buf, 0, block_size);
      return;
    case FIXED: {
      if (block_size < order)
        fmt_err("invalid fixed subframe, order is larger than block size");
      decode_verbatim(b, sf_bps, buf, 0, order);
      decode_residual(b, block_size, buf, order, block_size - order);
      d.order = order;
      for (int k = 0; k < order; ++k) d.coefs[32 - order + k] = kFixedCoefs[order][k];
      return;
    }
    case LPC: {
      if (block_size < order)
        fmt_err("invalid LPC subframe, lpc order is larger than block size");
      decode_verbatim(b, sf_bps, buf, 0, order);
      int qlp_precision = (int)b.read(4) + 1;
      if (qlp_precision - 1 == 0x0F)
        fmt_err("invalid subframe, qlp precision value invalid");
      int32_t qlp_shift = extend_sign(b.read(5), 5);
      if (qlp_shift < 0)
        unsupported(
            "a negative quantized linear predictor coefficient shift is "
            "not supported, please file a bug.");
      // Most recent sample's coefficient first in the stream; store
      // oldest-first, right-aligned at column 31.
      for (int k = order - 1; k >= 0; --k)
        d.coefs[32 - order + k] = extend_sign(b.read(qlp_precision), qlp_precision);
      decode_residual(b, block_size, buf, order, block_size - order);
      d.order = order;
      d.shift = qlp_shift;
      return;
    }
  }
}

// ---------------------------------------------------------------------------
// Host prediction + epilogue (decode mode; the reference's hot loops,
// `src/subframe.rs:417-474,524-614`, `src/frame.rs:318-399`).

// Fixed-order instantiations let the compiler fully unroll and vectorize
// the inner product (the reference specializes low orders the same way,
// zero-padding to a fixed width 12, `src/subframe.rs:524-583`).
template <int ORDER>
void predict_order(const int32_t* c, int32_t shift, int32_t* buf,
                   int64_t block_size) {
  for (int64_t i = ORDER; i < block_size; ++i) {
    int64_t acc = 0;
    for (int k = 0; k < ORDER; ++k)
      acc += (int64_t)c[k] * (int64_t)buf[i - ORDER + k];
    int64_t pred = acc >> shift;
    buf[i] = (int32_t)(uint32_t)((uint64_t)pred + (uint32_t)buf[i]);
  }
}

void predict_in_place(const SubDesc& d, int32_t* buf, int64_t block_size) {
  int order = d.order;
  if (order == 0) return;
  const int32_t* c = d.coefs + 32 - order;
  switch (order) {
    case 1: return predict_order<1>(c, d.shift, buf, block_size);
    case 2: return predict_order<2>(c, d.shift, buf, block_size);
    case 3: return predict_order<3>(c, d.shift, buf, block_size);
    case 4: return predict_order<4>(c, d.shift, buf, block_size);
    case 5: return predict_order<5>(c, d.shift, buf, block_size);
    case 6: return predict_order<6>(c, d.shift, buf, block_size);
    case 7: return predict_order<7>(c, d.shift, buf, block_size);
    case 8: return predict_order<8>(c, d.shift, buf, block_size);
    case 9: return predict_order<9>(c, d.shift, buf, block_size);
    case 10: return predict_order<10>(c, d.shift, buf, block_size);
    case 11: return predict_order<11>(c, d.shift, buf, block_size);
    case 12: return predict_order<12>(c, d.shift, buf, block_size);
    default: break;
  }
  for (int64_t i = order; i < block_size; ++i) {
    int64_t acc = 0;
    for (int k = 0; k < order; ++k)
      acc += (int64_t)c[k] * (int64_t)buf[i - order + k];
    int64_t pred = acc >> d.shift;
    buf[i] = (int32_t)(uint32_t)((uint64_t)pred + (uint32_t)buf[i]);
  }
}

void apply_wasted(int wasted, int32_t* buf, int64_t n) {
  if (!wasted) return;
  for (int64_t i = 0; i < n; ++i)
    buf[i] = (int32_t)((uint32_t)buf[i] << wasted);
}

// ---------------------------------------------------------------------------
// Whole-stream walkers.

struct Handle {
  std::vector<CxtFrame> frames;
  std::vector<SubDesc> subs;
  std::vector<int32_t> samples;  // extract: lane-concatenated x buffers
  std::vector<int32_t> pcm;      // decode: interleaved samples
};

// Per-channel subframe bps: the side channel carries one extra bit
// (`src/frame.rs:705-742`).
inline int channel_bps(int mode, int ch, int bps) {
  switch (mode) {
    case 1: return ch == 1 ? bps + 1 : bps;  // left/side
    case 2: return ch == 0 ? bps + 1 : bps;  // right/side
    case 3: return ch == 1 ? bps + 1 : bps;  // mid/side
    default: return bps;
  }
}

void walk_stream(const uint8_t* data, size_t len, bool full_decode,
                 Handle& h, int64_t max_frames = -1,
                 size_t* consumed = nullptr) {
  Bits b(data, len);
  std::vector<int32_t> scratch;
  // Typical FLAC compresses 16-bit audio to ~0.5x, i.e. about one sample
  // per input byte; reserving 2x that (capped) avoids the growth
  // reallocations' large memcpys on the extraction hot path.
  if (!full_decode && max_frames < 0)
    h.samples.reserve(std::min<size_t>(len * 2, (size_t)1 << 27));
  if (full_decode && max_frames < 0)
    h.pcm.reserve(std::min<size_t>(len * 2, (size_t)1 << 27));
  while (max_frames < 0 || (int64_t)h.frames.size() < max_frames) {
    size_t frame_start = b.bytepos();
    Header hdr;
    if (!read_frame_header(b, hdr)) break;
    if (hdr.bps < 0) unsupported("header without bits per sample info");

    int64_t bs = hdr.block_size;
    int nch = hdr.channels;

    int32_t* bufs;
    size_t sub0 = h.subs.size();
    if (full_decode) {
      scratch.resize((size_t)bs * nch);
      bufs = scratch.data();
    } else {
      size_t off = h.samples.size();
      h.samples.resize(off + (size_t)bs * nch);
      bufs = h.samples.data() + off;
    }

    for (int ch = 0; ch < nch; ++ch) {
      SubDesc d;
      parse_subframe(b, channel_bps(hdr.mode, ch, hdr.bps), bs,
                     bufs + (size_t)ch * bs, d);
      h.subs.push_back(d);
    }

    b.align();
    uint16_t computed = crc16_range(b.base + frame_start, b.base + b.bytepos());
    uint32_t presumed = b.read_be_u16();
    if (computed != presumed) fmt_err("frame CRC mismatch");

    h.frames.push_back(
        CxtFrame{hdr.time, hdr.block_size, hdr.channels, hdr.mode, hdr.bps});

    if (full_decode) {
      for (int ch = 0; ch < nch; ++ch) {
        const SubDesc& d = h.subs[sub0 + ch];
        int32_t* buf = bufs + (size_t)ch * bs;
        predict_in_place(d, buf, bs);
        apply_wasted(d.wasted, buf, bs);
      }
      if (hdr.mode != 0) {
        int32_t* c0 = bufs;
        int32_t* c1 = bufs + bs;
        if (hdr.mode == 1) {          // left/side: right = left - side
          for (int64_t i = 0; i < bs; ++i)
            c1[i] = (int32_t)((uint32_t)c0[i] - (uint32_t)c1[i]);
        } else if (hdr.mode == 2) {   // right/side: left = side + right
          for (int64_t i = 0; i < bs; ++i)
            c0[i] = (int32_t)((uint32_t)c0[i] + (uint32_t)c1[i]);
        } else {                      // mid/side
          for (int64_t i = 0; i < bs; ++i) {
            int32_t mid2 =
                (int32_t)((uint32_t)c0[i] << 1) | (c1[i] & 1);
            int32_t side = c1[i];
            // mid2 +- side is always even; >> is the truncating div by 2.
            c0[i] = (int32_t)((uint32_t)mid2 + (uint32_t)side) >> 1;
            c1[i] = (int32_t)((uint32_t)mid2 - (uint32_t)side) >> 1;
          }
        }
      }
      size_t off = h.pcm.size();
      h.pcm.resize(off + (size_t)bs * nch);
      int32_t* out = h.pcm.data() + off;
      for (int ch = 0; ch < nch; ++ch) {
        const int32_t* buf = bufs + (size_t)ch * bs;
        for (int64_t i = 0; i < bs; ++i) out[i * nch + ch] = buf[i];
      }
      h.subs.resize(sub0);  // decode mode keeps only frames + pcm
    }
    if (consumed) *consumed = b.bytepos();
  }
}

Handle* run(const uint8_t* data, uint64_t len, bool full_decode,
            int32_t* err_code, char* err_msg, uint64_t msg_cap,
            int64_t max_frames = -1, size_t* consumed = nullptr) {
  // Everything, including the allocation, stays inside the try: no C++
  // exception (bad_alloc included) may cross the extern "C" boundary.
  Handle* h = nullptr;
  try {
    h = new Handle();
    walk_stream(data, (size_t)len, full_decode, *h, max_frames, consumed);
    *err_code = 0;
    return h;
  } catch (const Err& e) {
    *err_code = e.code;
    if (msg_cap) {
      std::strncpy(err_msg, e.msg, msg_cap - 1);
      err_msg[msg_cap - 1] = 0;
    }
  } catch (const std::exception& e) {
    *err_code = 100;
    if (msg_cap) {
      std::strncpy(err_msg, e.what(), msg_cap - 1);
      err_msg[msg_cap - 1] = 0;
    }
  }
  delete h;
  return nullptr;
}

}  // namespace

extern "C" {

void* cxt_extract(const uint8_t* data, uint64_t len, int32_t* err_code,
                  char* err_msg, uint64_t msg_cap) {
  return run(data, len, /*full_decode=*/false, err_code, err_msg, msg_cap);
}

void* cxt_decode(const uint8_t* data, uint64_t len, int32_t* err_code,
                 char* err_msg, uint64_t msg_cap) {
  return run(data, len, /*full_decode=*/true, err_code, err_msg, msg_cap);
}

// Extract at most max_frames frames (container chunks hold a known frame
// count; parsing must stop before inter-chunk slack).
void* cxt_extract_limited(const uint8_t* data, uint64_t len,
                          int64_t max_frames, uint64_t* consumed,
                          int32_t* err_code, char* err_msg,
                          uint64_t msg_cap) {
  size_t used = 0;
  Handle* h = run(data, len, /*full_decode=*/false, err_code, err_msg,
                  msg_cap, max_frames, &used);
  *consumed = used;
  return h;
}

// Decode at most max_frames frames; *consumed reports the bytes consumed
// by the successfully decoded frames (the streaming FrameReader entry).
void* cxt_decode_limited(const uint8_t* data, uint64_t len,
                         int64_t max_frames, uint64_t* consumed,
                         int32_t* err_code, char* err_msg,
                         uint64_t msg_cap) {
  size_t used = 0;
  Handle* h = run(data, len, /*full_decode=*/true, err_code, err_msg,
                  msg_cap, max_frames, &used);
  *consumed = used;
  return h;
}

uint64_t cxt_n_frames(void* h) { return ((Handle*)h)->frames.size(); }
uint64_t cxt_n_subframes(void* h) { return ((Handle*)h)->subs.size(); }
uint64_t cxt_n_lane_samples(void* h) { return ((Handle*)h)->samples.size(); }
uint64_t cxt_pcm_len(void* h) { return ((Handle*)h)->pcm.size(); }

void cxt_fill(void* hv, CxtFrame* frames, void* subs, int32_t* samples) {
  Handle* h = (Handle*)hv;
  static_assert(sizeof(CxtFrame) == 24, "CxtFrame layout");
  static_assert(sizeof(SubDesc) == 16 + 128, "SubDesc layout");
  if (frames && !h->frames.empty())
    std::memcpy(frames, h->frames.data(),
                h->frames.size() * sizeof(CxtFrame));
  if (subs && !h->subs.empty())
    std::memcpy(subs, h->subs.data(), h->subs.size() * sizeof(SubDesc));
  if (samples && !h->samples.empty())
    std::memcpy(samples, h->samples.data(),
                h->samples.size() * sizeof(int32_t));
}

void cxt_pcm_fill(void* hv, int32_t* out) {
  Handle* h = (Handle*)hv;
  if (out && !h->pcm.empty())
    std::memcpy(out, h->pcm.data(), h->pcm.size() * sizeof(int32_t));
}

void cxt_free(void* h) { delete (Handle*)h; }

// Fused bucket-fill helper for the pipeline's packed-input fast path:
// copy n_rows rows of bs int32 samples (starting at src[0]) into an int16
// destination with dst_stride int16 elements per row, converting in one
// pass (values must already be known to fit int16; the caller decides via
// a min/max scan). Rows beyond bs stay untouched (pre-zeroed by caller).
void cxt_rows_to_i16(const int32_t* __restrict src, int64_t n_rows,
                     int64_t bs, int16_t* __restrict dst,
                     int64_t dst_stride, int64_t lane0) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const int32_t* __restrict s = src + r * bs;
    int16_t* __restrict d = dst + (lane0 + r) * dst_stride;
#pragma GCC ivdep
    for (int64_t i = 0; i < bs; ++i) d[i] = (int16_t)s[i];
  }
}

// Min/max over a run of int32 samples (the packing decision), single pass.
void cxt_minmax(const int32_t* src, int64_t n, int32_t* mn, int32_t* mx) {
  int32_t lo = 0, hi = 0;  // padding is zero, so include 0 in the range
  for (int64_t i = 0; i < n; ++i) {
    int32_t v = src[i];
    lo = v < lo ? v : lo;
    hi = v > hi ? v : hi;
  }
  *mn = lo;
  *mx = hi;
}

int32_t cxt_abi_version() { return 1; }

}  // extern "C"
