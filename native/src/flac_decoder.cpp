// flac_decoder — from-scratch FLAC decoder for the VCTK corpus path.
//
// The reference converts the downloaded VCTK 0.92 flac corpus to wav through
// torchaudio (reference data_loader/data_loaders.py:151-246); this image has
// no flac decoder, so the framework ships its own. Scope: the full FLAC
// subset any real encoder emits — CONSTANT / VERBATIM / FIXED(0-4) /
// LPC(1-32) subframes, RICE and RICE2 residual partitions with escape codes,
// wasted bits, all channel assignments (independent, left/side, right/side,
// mid/side), 4-32 bit samples, fixed and variable blocking strategies.
// CRCs and the MD5 signature are parsed past, not verified (decode speed
// over integrity checking — corrupt corpora fail loudly elsewhere).
//
// C ABI (ctypes, same pattern as vm_asr_native.cpp):
//   vm_flac_decode(buf, len, &out_i32_interleaved, &n_frames, &sr, &ch, &bps)
//     returns 0 on success; out buffer is malloc'd, free with vm_flac_free.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)

  bool eof() const { return byte >= size; }

  // n <= 32
  uint32_t read_bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (byte >= size) return v << (n - 1 - i);
      v = (v << 1) | ((data[byte] >> (7 - bit)) & 1u);
      if (++bit == 8) {
        bit = 0;
        ++byte;
      }
    }
    return v;
  }

  uint64_t read_bits64(int n) {
    uint64_t v = 0;
    if (n > 32) {
      v = read_bits(n - 32);
      return (v << 32) | read_bits(32);
    }
    return read_bits(n);
  }

  int64_t read_signed(int n) {
    // up to 33 bits: 32-bit samples gain one bit in a side channel
    uint64_t v = read_bits64(n);
    if (n == 0) return 0;
    if (n < 64 && ((v >> (n - 1)) & 1u))
      v |= ~((1ull << n) - 1ull);
    return static_cast<int64_t>(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (byte < size) {
      if ((data[byte] >> (7 - bit)) & 1u) {
        if (++bit == 8) {
          bit = 0;
          ++byte;
        }
        return q;
      }
      ++q;
      if (++bit == 8) {
        bit = 0;
        ++byte;
      }
    }
    return q;
  }

  void align_byte() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }

  void skip_bytes(size_t n) { byte += n; }
};

// Frame-header UTF-8-style coded number (frame or sample index, ≤ 36 bits).
bool read_coded_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = br.read_bits(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80u) == 0) {
    extra = 0;
    v = b0;
  } else if ((b0 & 0xE0u) == 0xC0u) {
    extra = 1;
    v = b0 & 0x1Fu;
  } else if ((b0 & 0xF0u) == 0xE0u) {
    extra = 2;
    v = b0 & 0x0Fu;
  } else if ((b0 & 0xF8u) == 0xF0u) {
    extra = 3;
    v = b0 & 0x07u;
  } else if ((b0 & 0xFCu) == 0xF8u) {
    extra = 4;
    v = b0 & 0x03u;
  } else if ((b0 & 0xFEu) == 0xFCu) {
    extra = 5;
    v = b0 & 0x01u;
  } else if (b0 == 0xFEu) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = br.read_bits(8);
    if ((b & 0xC0u) != 0x80u) return false;
    v = (v << 6) | (b & 0x3Fu);
  }
  *out = v;
  return true;
}

const int kFixedCoeffs[5][4] = {
    {},
    {1},
    {2, -1},
    {3, -3, 1},
    {4, -6, 4, -1},
};

// Rice/escape residual into s[order..blocksize).
bool read_residual(BitReader& br, int order, int blocksize,
                   std::vector<int64_t>& s) {
  uint32_t method = br.read_bits(2);
  if (method > 1) return false;
  const int param_bits = method == 0 ? 4 : 5;
  const uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t part_order = br.read_bits(4);
  uint32_t n_parts = 1u << part_order;
  if (blocksize % n_parts) return false;
  int idx = order;
  for (uint32_t p = 0; p < n_parts; ++p) {
    int count = blocksize >> part_order;
    if (p == 0) count -= order;
    if (count < 0) return false;
    uint32_t param = br.read_bits(param_bits);
    if (param == escape) {
      uint32_t raw = br.read_bits(5);
      for (int i = 0; i < count; ++i)
        s[idx++] = raw ? br.read_signed(static_cast<int>(raw)) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint32_t low = param ? br.read_bits(static_cast<int>(param)) : 0;
        uint64_t u = (static_cast<uint64_t>(q) << param) | low;
        s[idx++] = static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
      }
    }
    if (br.eof()) return false;
  }
  return true;
}

bool read_subframe(BitReader& br, int blocksize, int bps,
                   std::vector<int64_t>& s) {
  if (br.read_bits(1) != 0) return false;  // mandatory zero pad
  uint32_t type = br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) wasted = static_cast<int>(br.read_unary()) + 1;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  s.assign(blocksize, 0);
  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; ++i) s[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) s[i] = br.read_signed(bps);
  } else if ((type & 0x38u) == 0x08u && (type & 0x07u) <= 4) {  // FIXED
    int order = static_cast<int>(type & 0x07u);
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) s[i] = br.read_signed(bps);
    if (!read_residual(br, order, blocksize, s)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j)
        pred += static_cast<int64_t>(kFixedCoeffs[order][j]) * s[i - 1 - j];
      s[i] += pred;
    }
  } else if (type & 0x20u) {  // LPC
    int order = static_cast<int>(type & 0x1Fu) + 1;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) s[i] = br.read_signed(bps);
    int precision = static_cast<int>(br.read_bits(4)) + 1;
    if (precision == 16) return false;  // 0b1111 is invalid
    int shift = br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!read_residual(br, order, blocksize, s)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * s[i - 1 - j];
      s[i] += pred >> shift;
    }
  } else {
    return false;  // reserved subframe type
  }
  if (wasted)
    for (int i = 0; i < blocksize; ++i)
      s[i] = static_cast<int64_t>(static_cast<uint64_t>(s[i]) << wasted);
  return true;
}

struct StreamInfo {
  int sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
};

const int kBlockSizes[16] = {0,    192,  576,  1152, 2304, 4608, -1,   -2,
                             256,  512,  1024, 2048, 4096, 8192, 16384, 32768};
}  // namespace

extern "C" {

// Returns 0 on success. out: malloc'd interleaved int32 samples
// (n_frames * channels entries).
int vm_flac_decode(const uint8_t* buf, int64_t len, int32_t** out,
                   int64_t* n_frames, int* sample_rate, int* channels,
                   int* bits_per_sample) try {
  if (!buf || len < 42 || memcmp(buf, "fLaC", 4) != 0) return 1;
  BitReader br{buf, static_cast<size_t>(len)};
  br.skip_bytes(4);

  StreamInfo si;
  bool have_si = false;
  for (;;) {
    uint32_t head = br.read_bits(8);
    bool last = (head & 0x80u) != 0;
    uint32_t type = head & 0x7Fu;
    uint32_t blen = br.read_bits(24);
    if (type == 0) {  // STREAMINFO
      br.read_bits(16);  // min blocksize
      br.read_bits(16);  // max blocksize
      br.read_bits(24);  // min framesize
      br.read_bits(24);  // max framesize
      si.sample_rate = static_cast<int>(br.read_bits(20));
      si.channels = static_cast<int>(br.read_bits(3)) + 1;
      si.bps = static_cast<int>(br.read_bits(5)) + 1;
      si.total_samples = br.read_bits64(36);
      br.skip_bytes(16);  // MD5
      have_si = true;
    } else {
      br.skip_bytes(blen);
    }
    if (last) break;
    if (br.eof()) return 2;
  }
  if (!have_si || si.sample_rate == 0 || si.channels < 1 || si.channels > 8)
    return 3;

  // A fuzzed/corrupt STREAMINFO can claim up to 2^36 samples — never
  // pre-allocate more than the compressed stream could plausibly expand to
  // (bounded by the input size; FLAC is lossless, ≤ ~4 B/sample raw).
  std::vector<int32_t> pcm;
  if (si.total_samples) {
    uint64_t claim = si.total_samples * static_cast<uint64_t>(si.channels);
    uint64_t plausible = static_cast<uint64_t>(len) * 2;
    pcm.reserve(static_cast<size_t>(claim < plausible ? claim : plausible));
  }
  std::vector<std::vector<int64_t>> chan(si.channels);

  while (!br.eof()) {
    br.align_byte();
    if (br.byte >= br.size) break;
    // frame sync 0b11111111111110
    uint32_t sync = br.read_bits(14);
    if (br.eof()) break;
    if (sync != 0x3FFEu) return 4;
    br.read_bits(1);  // reserved
    br.read_bits(1);  // blocking strategy
    uint32_t bs_code = br.read_bits(4);
    uint32_t sr_code = br.read_bits(4);
    uint32_t ch_code = br.read_bits(4);
    uint32_t sz_code = br.read_bits(3);
    br.read_bits(1);  // reserved
    uint64_t coded;
    if (!read_coded_number(br, &coded)) return 5;

    int blocksize;
    if (bs_code == 6)
      blocksize = static_cast<int>(br.read_bits(8)) + 1;
    else if (bs_code == 7)
      blocksize = static_cast<int>(br.read_bits(16)) + 1;
    else if (kBlockSizes[bs_code] > 0)
      blocksize = kBlockSizes[bs_code];
    else
      return 6;

    if (sr_code == 12)
      br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14)
      br.read_bits(16);
    else if (sr_code == 15)
      return 6;  // invalid per spec — fail at the header, not downstream

    int bps;
    switch (sz_code) {
      case 0: bps = si.bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return 7;
    }
    br.read_bits(8);  // header CRC-8

    int n_ch;
    int side = -1;  // which channel carries the side signal (+1 bit)
    if (ch_code < 8) {
      n_ch = static_cast<int>(ch_code) + 1;
    } else if (ch_code <= 10) {
      n_ch = 2;
      side = (ch_code == 8) ? 1 : (ch_code == 9 ? 0 : 1);
    } else {
      return 8;
    }
    if (n_ch != si.channels) return 9;

    for (int c = 0; c < n_ch; ++c) {
      int sub_bps = bps + (c == side ? 1 : 0);
      if (!read_subframe(br, blocksize, sub_bps, chan[c])) return 10;
    }
    br.align_byte();
    br.read_bits(16);  // frame CRC-16

    // undo inter-channel decorrelation
    if (ch_code == 8) {  // left/side → right = left − side
      for (int i = 0; i < blocksize; ++i) chan[1][i] = chan[0][i] - chan[1][i];
    } else if (ch_code == 9) {  // right/side → left = right + side
      for (int i = 0; i < blocksize; ++i) chan[0][i] = chan[1][i] + chan[0][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t side_v = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side_v & 1);
        chan[0][i] = (mid + side_v) >> 1;
        chan[1][i] = (mid - side_v) >> 1;
      }
    }

    for (int i = 0; i < blocksize; ++i)
      for (int c = 0; c < n_ch; ++c)
        pcm.push_back(static_cast<int32_t>(chan[c][i]));

    if (si.total_samples &&
        pcm.size() >= si.total_samples * static_cast<size_t>(si.channels))
      break;
  }

  if (si.total_samples &&
      pcm.size() > si.total_samples * static_cast<size_t>(si.channels))
    pcm.resize(static_cast<size_t>(si.total_samples) * si.channels);

  int32_t* mem =
      static_cast<int32_t*>(malloc(pcm.size() * sizeof(int32_t)));
  if (!mem && !pcm.empty()) return 11;
  memcpy(mem, pcm.data(), pcm.size() * sizeof(int32_t));
  *out = mem;
  *n_frames = static_cast<int64_t>(pcm.size() / si.channels);
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  *bits_per_sample = si.bps;
  return 0;
} catch (...) {
  // Corrupt input must surface as an error code, never cross the C ABI as
  // a C++ exception (bad_alloc from absurd claimed sizes, etc.).
  return 12;
}

void vm_flac_free(int32_t* p) { free(p); }

}  // extern "C"
