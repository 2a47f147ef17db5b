// Native FLAC decoder for corpus preparation (LibriSpeech ingestion).
//
// Mirrors the pure-Python reference implementation in
// e2e_asr_tpu/data/flac.py (which is the readable spec and the test oracle;
// tests/test_flac.py runs both against hand-built bitstreams). Decodes
// CONSTANT / VERBATIM / FIXED / LPC subframes, Rice and Rice2 residual
// partitions with escape codes, wasted bits, and all stereo decorrelation
// modes. CRCs are parsed over but not verified.
//
// C ABI (ctypes, see e2e_asr_tpu/data/native.py):
//   void*  flac_open(const uint8_t* data, int64 len)   -> handle or nullptr
//   void   flac_info(handle, int64* n, *channels, *rate, *bps)
//   void   flac_copy(handle, int32* out)               -> interleaved n*ch
//   void   flac_close(handle)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t len;
  int64_t pos = 0;   // byte
  int bit = 0;       // bit within byte, MSB first
  bool fail = false;

  uint64_t ReadUint(int bits) {
    uint64_t out = 0;
    while (bits > 0) {
      if (pos >= len) { fail = true; return 0; }
      int avail = 8 - bit;
      int take = avail < bits ? avail : bits;
      uint8_t byte = data[pos];
      out = (out << take) | ((byte >> (avail - take)) & ((1u << take) - 1));
      bit += take;
      bits -= take;
      if (bit == 8) { pos++; bit = 0; }
    }
    return out;
  }

  int64_t ReadInt(int bits) {
    uint64_t v = ReadUint(bits);
    if (bits > 0 && (v >> (bits - 1)) & 1) {
      return static_cast<int64_t>(v) - (int64_t(1) << bits);
    }
    return static_cast<int64_t>(v);
  }

  int64_t ReadUnary() {
    int64_t n = 0;
    for (;;) {
      if (pos >= len) { fail = true; return 0; }
      uint8_t byte = data[pos] & ((1u << (8 - bit)) - 1);
      if (byte == 0) {
        n += 8 - bit;
        pos++;
        bit = 0;
      } else {
        int top = 31 - __builtin_clz(byte);  // highest set bit position
        int zeros = (8 - bit) - (top + 1);
        n += zeros;
        bit += zeros + 1;
        if (bit == 8) { pos++; bit = 0; }
        return n;
      }
    }
  }

  void Align() {
    if (bit) { pos++; bit = 0; }
  }
};

int64_t ReadUtf8Number(BitReader& br) {
  uint64_t b0 = br.ReadUint(8);
  if (b0 < 0x80) return static_cast<int64_t>(b0);
  int n = 0;
  while ((b0 << n) & 0x80) n++;
  uint64_t v = b0 & (0x7Fu >> n);
  for (int i = 0; i < n - 1; i++) {
    v = (v << 6) | (br.ReadUint(8) & 0x3F);
  }
  return static_cast<int64_t>(v);
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                             256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};
const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool DecodeResidual(BitReader& br, int64_t block_size, int order,
                    std::vector<int64_t>& out) {
  int method = static_cast<int>(br.ReadUint(2));
  if (method > 1) return false;
  int plen = 4 + method;
  uint32_t escape = (1u << plen) - 1;
  int porder = static_cast<int>(br.ReadUint(4));
  int64_t n_part = int64_t(1) << porder;
  if (block_size % n_part) return false;
  out.resize(block_size - order);
  int64_t idx = 0;
  for (int64_t p = 0; p < n_part; p++) {
    int64_t n = block_size / n_part - (p == 0 ? order : 0);
    uint32_t param = static_cast<uint32_t>(br.ReadUint(plen));
    if (param == escape) {
      int bits = static_cast<int>(br.ReadUint(5));
      for (int64_t i = 0; i < n; i++) {
        out[idx++] = bits ? br.ReadInt(bits) : 0;
      }
    } else {
      for (int64_t i = 0; i < n; i++) {
        uint64_t q = static_cast<uint64_t>(br.ReadUnary());
        uint64_t v = (q << param) | (param ? br.ReadUint(param) : 0);
        out[idx++] = static_cast<int64_t>(v >> 1) ^ -static_cast<int64_t>(v & 1);
      }
    }
    if (br.fail) return false;
  }
  return true;
}

bool DecodeSubframe(BitReader& br, int64_t block_size, int bps,
                    std::vector<int64_t>& samples) {
  if (br.ReadUint(1)) return false;
  int sf_type = static_cast<int>(br.ReadUint(6));
  int wasted = 0;
  if (br.ReadUint(1)) {
    wasted = static_cast<int>(br.ReadUnary()) + 1;
    bps -= wasted;
  }
  samples.resize(block_size);
  std::vector<int64_t> resid;
  if (sf_type == 0) {                       // CONSTANT
    int64_t v = br.ReadInt(bps);
    for (int64_t i = 0; i < block_size; i++) samples[i] = v;
  } else if (sf_type == 1) {                // VERBATIM
    for (int64_t i = 0; i < block_size; i++) samples[i] = br.ReadInt(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // FIXED
    int order = sf_type - 8;
    for (int i = 0; i < order; i++) samples[i] = br.ReadInt(bps);
    if (!DecodeResidual(br, block_size, order, resid)) return false;
    for (int64_t i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) {
        pred += kFixedCoeffs[order][j] * samples[i - 1 - j];
      }
      samples[i] = pred + resid[i - order];
    }
  } else if (sf_type >= 32) {               // LPC
    int order = sf_type - 31;
    for (int i = 0; i < order; i++) samples[i] = br.ReadInt(bps);
    int precision = static_cast<int>(br.ReadUint(4)) + 1;
    if (precision == 16) return false;
    int shift = static_cast<int>(br.ReadInt(5));
    std::vector<int64_t> coeffs(order);
    for (int i = 0; i < order; i++) coeffs[i] = br.ReadInt(precision);
    if (!DecodeResidual(br, block_size, order, resid)) return false;
    for (int64_t i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coeffs[j] * samples[i - 1 - j];
      samples[i] = (pred >> shift) + resid[i - order];
    }
  } else {
    return false;
  }
  if (wasted) {
    for (int64_t i = 0; i < block_size; i++) samples[i] <<= wasted;
  }
  return !br.fail;
}

struct Decoded {
  std::vector<int32_t> samples;  // interleaved
  int64_t n = 0;
  int channels = 1;
  int64_t rate = 16000;
  int bps = 16;
};

Decoded* Decode(const uint8_t* data, int64_t len) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return nullptr;
  int64_t pos = 4;
  auto dec = new Decoded();
  int64_t total = 0;
  // Metadata blocks.
  for (;;) {
    if (pos + 4 > len) { delete dec; return nullptr; }
    uint8_t header = data[pos];
    bool last = header & 0x80;
    int btype = header & 0x7F;
    int64_t blen = (int64_t(data[pos + 1]) << 16) |
                   (int64_t(data[pos + 2]) << 8) | data[pos + 3];
    if (pos + 4 + blen > len) { delete dec; return nullptr; }
    if (btype == 0 && blen >= 34) {
      BitReader br{data + pos + 4, blen};
      br.ReadUint(16); br.ReadUint(16); br.ReadUint(24); br.ReadUint(24);
      dec->rate = static_cast<int64_t>(br.ReadUint(20));
      dec->channels = static_cast<int>(br.ReadUint(3)) + 1;
      dec->bps = static_cast<int>(br.ReadUint(5)) + 1;
      total = static_cast<int64_t>(br.ReadUint(36));
    }
    pos += 4 + blen;
    if (last) break;
  }

  std::vector<std::vector<int64_t>> subs(dec->channels);
  while (pos < len && (total == 0 || dec->n < total)) {
    BitReader br{data, len};
    br.pos = pos;
    if (br.ReadUint(14) != 0b11111111111110) break;
    br.ReadUint(1);
    br.ReadUint(1);
    int bs_code = static_cast<int>(br.ReadUint(4));
    int sr_code = static_cast<int>(br.ReadUint(4));
    int ch_code = static_cast<int>(br.ReadUint(4));
    int ss_code = static_cast<int>(br.ReadUint(3));
    br.ReadUint(1);
    ReadUtf8Number(br);
    int64_t block_size;
    if (bs_code == 6) {
      block_size = static_cast<int64_t>(br.ReadUint(8)) + 1;
    } else if (bs_code == 7) {
      block_size = static_cast<int64_t>(br.ReadUint(16)) + 1;
    } else if (bs_code >= 1 && kBlockSizes[bs_code] > 0) {
      block_size = kBlockSizes[bs_code];
    } else {
      delete dec; return nullptr;
    }
    if (sr_code == 12) br.ReadUint(8);
    else if (sr_code == 13 || sr_code == 14) br.ReadUint(16);
    int bps = ss_code == 0 ? dec->bps : kSampleSizes[ss_code];
    br.ReadUint(8);  // header CRC-8

    bool ok = true;
    int n_ch;
    if (ch_code < 8) {
      n_ch = ch_code + 1;
      if (n_ch != dec->channels) { delete dec; return nullptr; }
      for (int c = 0; c < n_ch && ok; c++) {
        ok = DecodeSubframe(br, block_size, bps, subs[c]);
      }
    } else if (ch_code <= 10) {
      n_ch = 2;
      if (dec->channels != 2) { delete dec; return nullptr; }
      std::vector<int64_t> a, b;
      if (ch_code == 8) {          // left/side
        ok = DecodeSubframe(br, block_size, bps, a) &&
             DecodeSubframe(br, block_size, bps + 1, b);
        if (ok) {
          subs[0] = a;
          subs[1].resize(block_size);
          for (int64_t i = 0; i < block_size; i++) subs[1][i] = a[i] - b[i];
        }
      } else if (ch_code == 9) {   // right/side
        ok = DecodeSubframe(br, block_size, bps + 1, a) &&
             DecodeSubframe(br, block_size, bps, b);
        if (ok) {
          subs[1] = b;
          subs[0].resize(block_size);
          for (int64_t i = 0; i < block_size; i++) subs[0][i] = b[i] + a[i];
        }
      } else {                     // mid/side
        ok = DecodeSubframe(br, block_size, bps, a) &&
             DecodeSubframe(br, block_size, bps + 1, b);
        if (ok) {
          subs[0].resize(block_size);
          subs[1].resize(block_size);
          for (int64_t i = 0; i < block_size; i++) {
            int64_t mid2 = (a[i] << 1) | (b[i] & 1);
            subs[0][i] = (mid2 + b[i]) >> 1;
            subs[1][i] = (mid2 - b[i]) >> 1;
          }
        }
      }
    } else {
      delete dec; return nullptr;
    }
    if (!ok || br.fail) { delete dec; return nullptr; }
    br.Align();
    br.ReadUint(16);  // frame CRC-16
    pos = br.pos;

    int64_t keep = block_size;
    if (total && dec->n + keep > total) keep = total - dec->n;
    for (int64_t i = 0; i < keep; i++) {
      for (int c = 0; c < dec->channels; c++) {
        dec->samples.push_back(static_cast<int32_t>(subs[c][i]));
      }
    }
    dec->n += keep;
  }
  return dec;
}

}  // namespace

extern "C" {

void* flac_open(const uint8_t* data, int64_t len) {
  return Decode(data, len);
}

void flac_info(void* handle, int64_t* n, int64_t* channels, int64_t* rate,
               int64_t* bps) {
  auto* dec = static_cast<Decoded*>(handle);
  *n = dec->n;
  *channels = dec->channels;
  *rate = dec->rate;
  *bps = dec->bps;
}

void flac_copy(void* handle, int32_t* out) {
  auto* dec = static_cast<Decoded*>(handle);
  memcpy(out, dec->samples.data(), dec->samples.size() * sizeof(int32_t));
}

void flac_close(void* handle) {
  delete static_cast<Decoded*>(handle);
}

}  // extern "C"
