// Native bitstream codec: bit packing + range (arithmetic) coding.
//
// C++ implementation of the one inherently serial, scalar component of the
// system (SURVEY.md §2.9): the EnCodec .ecdc entropy-coding loop
// (reference srcs/encodec/binary.py:55-122, srcs/encodec/quantization/
// ac.py:56-260).  Bit-exact with the Python reference implementation in
// ../binary.py and ../ac.py, which the tests cross-check.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image).  Stateful encoder/decoder handles keep the stream alive across
// frame-by-frame LM probability updates.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitWriter {
  std::vector<uint8_t> bytes;
  uint64_t current = 0;
  int nbits = 0;
  int width = 1;

  void push(uint64_t value) {
    current += value << nbits;
    nbits += width;
    while (nbits >= 8) {
      bytes.push_back(static_cast<uint8_t>(current & 0xff));
      nbits -= 8;
      current >>= 8;
    }
  }
  void flush() {
    if (nbits) {
      bytes.push_back(static_cast<uint8_t>(current));
      current = 0;
      nbits = 0;
    }
  }
};

struct BitReader {
  const uint8_t* data;
  int64_t len;
  int64_t pos = 0;
  uint64_t current = 0;
  int nbits = 0;
  int width = 1;
  uint64_t mask;

  BitReader(const uint8_t* d, int64_t l, int w)
      : data(d), len(l), width(w), mask((1ull << w) - 1) {}

  // returns -1 on EOF
  int64_t pull() {
    while (nbits < width) {
      if (pos >= len) return -1;
      current += static_cast<uint64_t>(data[pos++]) << nbits;
      nbits += 8;
    }
    uint64_t out = current & mask;
    current >>= width;
    nbits -= width;
    return static_cast<int64_t>(out);
  }
};

struct Encoder {
  BitWriter writer;  // width 1: single bits
  int total_range_bits;
  int64_t low = 0, high = 0;
  int max_bit = -1;

  explicit Encoder(int trb) : total_range_bits(trb) { writer.width = 1; }

  int64_t delta() const { return high - low + 1; }

  void flush_common_prefix() {
    while (max_bit >= 0) {
      int64_t b1 = low >> max_bit;
      int64_t b2 = high >> max_bit;
      if (b1 != b2) break;
      low -= b1 << max_bit;
      high -= b1 << max_bit;
      --max_bit;
      writer.push(static_cast<uint64_t>(b1));
    }
  }

  void push(int64_t symbol, const int64_t* cdf) {
    const int64_t total = int64_t(1) << total_range_bits;
    while (delta() < total) {
      low *= 2;
      high = high * 2 + 1;
      ++max_bit;
    }
    int64_t range_low = symbol == 0 ? 0 : cdf[symbol - 1];
    int64_t range_high = cdf[symbol] - 1;
    double scale = static_cast<double>(delta()) / static_cast<double>(total);
    int64_t effective_low = static_cast<int64_t>(std::ceil(range_low * scale));
    int64_t effective_high = static_cast<int64_t>(std::floor(range_high * scale));
    high = low + effective_high;
    low = low + effective_low;
    flush_common_prefix();
  }

  void finish() {
    while (max_bit >= 0) {
      writer.push(static_cast<uint64_t>((low >> max_bit) & 1));
      --max_bit;
    }
    writer.flush();
  }
};

struct Decoder {
  BitReader reader;
  int total_range_bits;
  int64_t low = 0, high = 0, current = 0;
  int max_bit = -1;

  Decoder(const uint8_t* data, int64_t len, int trb)
      : reader(data, len, 1), total_range_bits(trb) {}

  int64_t delta() const { return high - low + 1; }

  void flush_common_prefix() {
    while (max_bit >= 0) {
      int64_t b1 = low >> max_bit;
      int64_t b2 = high >> max_bit;
      if (b1 != b2) break;
      low -= b1 << max_bit;
      high -= b1 << max_bit;
      current -= b1 << max_bit;
      --max_bit;
    }
  }

  // returns decoded symbol or -1 on EOF
  int64_t pull(const int64_t* cdf, int64_t cdf_len) {
    const int64_t total = int64_t(1) << total_range_bits;
    while (delta() < total) {
      int64_t bit = reader.pull();
      if (bit < 0) return -1;
      low *= 2;
      high = high * 2 + 1;
      current = current * 2 + bit;
      ++max_bit;
    }
    double scale = static_cast<double>(delta()) / static_cast<double>(total);
    int64_t low_idx = 0, high_idx = cdf_len - 1;
    int64_t sym, nlow, nhigh;
    for (;;) {
      if (high_idx < low_idx) return -2;  // corrupt stream
      int64_t mid = (low_idx + high_idx) / 2;
      int64_t range_low = mid > 0 ? cdf[mid - 1] : 0;
      int64_t range_high = cdf[mid] - 1;
      int64_t effective_low = static_cast<int64_t>(std::ceil(range_low * scale));
      int64_t effective_high = static_cast<int64_t>(std::floor(range_high * scale));
      int64_t lo = effective_low + low;
      int64_t hi = effective_high + low;
      if (current >= lo) {
        if (current <= hi) {
          sym = mid;
          nlow = lo;
          nhigh = hi;
          break;
        }
        low_idx = mid + 1;
      } else {
        high_idx = mid - 1;
      }
    }
    low = nlow;
    high = nhigh;
    flush_common_prefix();
    return sym;
  }
};

}  // namespace

extern "C" {

// ---- fixed-width packing (whole sequences at once) ----

// out must have capacity >= (n*bits + 7)/8 + 1; returns bytes written.
int64_t ldc_pack_codes(const int32_t* codes, int64_t n, int bits, uint8_t* out) {
  BitWriter w;
  w.width = bits;
  w.bytes.reserve((n * bits) / 8 + 2);
  for (int64_t i = 0; i < n; ++i) w.push(static_cast<uint64_t>(codes[i]));
  w.flush();
  std::memcpy(out, w.bytes.data(), w.bytes.size());
  return static_cast<int64_t>(w.bytes.size());
}

// returns number of codes written (== count) or -1 if the stream ran out.
int64_t ldc_unpack_codes(const uint8_t* data, int64_t len, int bits, int64_t count,
                         int32_t* out) {
  BitReader r(data, len, bits);
  for (int64_t i = 0; i < count; ++i) {
    int64_t v = r.pull();
    if (v < 0) return -1;
    out[i] = static_cast<int32_t>(v);
  }
  return count;
}

// ---- quantized CDF (float32 contract identical to the Python reference) ----

void ldc_build_cdf(const float* pdf, int64_t n, int total_range_bits, float roundoff,
                   int64_t min_range, int64_t* out) {
  const double total_range = static_cast<double>(int64_t(1) << total_range_bits);
  const double alpha = static_cast<double>(min_range) * n / total_range;
  const float scale = static_cast<float>((1.0 - alpha) * total_range);
  int64_t acc = 0;
  for (int64_t i = 0; i < n; ++i) {
    float p = pdf[i];
    if (roundoff > 0) p = std::floor(p / roundoff) * roundoff;
    int64_t r = static_cast<int64_t>(std::floor(scale * p)) + min_range;
    acc += r;
    out[i] = acc;
  }
}

// Batched variant: k stacked PDFs of length n -> k stacked CDFs.  One FFI
// crossing per frame (or per whole sequence) instead of one per codebook.
void ldc_build_cdfs(const float* pdfs, int64_t k, int64_t n, int total_range_bits,
                    float roundoff, int64_t min_range, int64_t* out) {
  for (int64_t j = 0; j < k; ++j) {
    ldc_build_cdf(pdfs + j * n, n, total_range_bits, roundoff, min_range, out + j * n);
  }
}

// ---- arithmetic coder handles ----

void* ldc_encoder_new(int total_range_bits) { return new Encoder(total_range_bits); }

void ldc_encoder_push(void* h, const int32_t* symbols, int64_t n, const int64_t* cdfs,
                      int64_t cdf_len) {
  Encoder* e = static_cast<Encoder*>(h);
  for (int64_t i = 0; i < n; ++i) e->push(symbols[i], cdfs + i * cdf_len);
}

int64_t ldc_encoder_finish(void* h, uint8_t* out, int64_t cap) {
  Encoder* e = static_cast<Encoder*>(h);
  e->finish();
  int64_t sz = static_cast<int64_t>(e->writer.bytes.size());
  if (sz > cap) return -sz;  // caller must retry with larger buffer
  std::memcpy(out, e->writer.bytes.data(), sz);
  return sz;
}

void ldc_encoder_free(void* h) { delete static_cast<Encoder*>(h); }

void* ldc_decoder_new(const uint8_t* data, int64_t len, int total_range_bits) {
  // decoder copies the stream so the Python buffer may be freed
  Decoder* d = new Decoder(nullptr, 0, total_range_bits);
  uint8_t* copy = new uint8_t[len];
  std::memcpy(copy, data, len);
  d->reader = BitReader(copy, len, 1);
  return d;
}

int64_t ldc_decoder_pull(void* h, const int64_t* cdfs, int64_t cdf_len, int64_t n,
                         int32_t* out) {
  Decoder* d = static_cast<Decoder*>(h);
  for (int64_t i = 0; i < n; ++i) {
    int64_t sym = d->pull(cdfs + i * cdf_len, cdf_len);
    if (sym < 0) return sym;
    out[i] = static_cast<int32_t>(sym);
  }
  return n;
}

// bytes consumed from the input stream so far (for multi-segment parsing)
int64_t ldc_decoder_tell(void* h) { return static_cast<Decoder*>(h)->reader.pos; }

void ldc_decoder_free(void* h) {
  Decoder* d = static_cast<Decoder*>(h);
  delete[] d->reader.data;
  delete d;
}

}  // extern "C"
