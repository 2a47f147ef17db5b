// Native TFRecord + SequenceExample reader for the speech data pipeline.
//
// The reference delegated record IO to tf.data's C++ core
// (/root/reference/speech_dataset.py:49-60); this is the equivalent native
// component for the TPU framework: it parses TFRecord framing and the
// protobuf wire format of tf.train.SequenceExample (the subset the schema
// uses) into contiguous buffers, ~2 orders of magnitude faster than the
// pure-Python fallback in e2e_asr_tpu/data/example.py.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C runtime  (produces libtfrec.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <fstream>
#include <memory>

namespace {

struct Utterance {
  std::string utt_id;
  std::vector<float> logmel;   // T * feat flattened
  int64_t frames = 0;
  int64_t feat = 0;
  std::vector<int64_t> cint;
  std::vector<int64_t> pint;
};

struct SpeechFile {
  std::vector<Utterance> utts;
};

// --- protobuf wire primitives ---------------------------------------------

bool ReadVarint(const uint8_t* data, size_t size, size_t* pos, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < size) {
    uint8_t b = data[(*pos)++];
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
    if (shift >= 64) return false;
  }
  return false;
}

struct Field {
  uint32_t number;
  uint32_t wire;
  const uint8_t* data;   // for length-delimited
  size_t len;
  uint64_t varint;       // for varint fields
};

// Iterate fields of a message [data, data+size). Calls fn for each field;
// returns false on malformed input.
template <typename Fn>
bool ForEachField(const uint8_t* data, size_t size, Fn&& fn) {
  size_t pos = 0;
  while (pos < size) {
    uint64_t tag;
    if (!ReadVarint(data, size, &pos, &tag)) return false;
    Field f;
    f.number = static_cast<uint32_t>(tag >> 3);
    f.wire = static_cast<uint32_t>(tag & 7);
    switch (f.wire) {
      case 0: {  // varint
        if (!ReadVarint(data, size, &pos, &f.varint)) return false;
        f.data = nullptr;
        f.len = 0;
        break;
      }
      case 1: {  // 64-bit
        if (pos + 8 > size) return false;
        f.data = data + pos;
        f.len = 8;
        pos += 8;
        break;
      }
      case 2: {  // length-delimited
        uint64_t len;
        if (!ReadVarint(data, size, &pos, &len)) return false;
        if (pos + len > size) return false;
        f.data = data + pos;
        f.len = static_cast<size_t>(len);
        pos += len;
        break;
      }
      case 5: {  // 32-bit
        if (pos + 4 > size) return false;
        f.data = data + pos;
        f.len = 4;
        pos += 4;
        break;
      }
      default:
        return false;
    }
    if (!fn(f)) return false;
  }
  return true;
}

// Feature -> appends float values / int64 values, or captures bytes.
struct FeatureValue {
  std::vector<float>* floats = nullptr;
  std::vector<int64_t>* ints = nullptr;
  std::string* bytes = nullptr;
};

bool ParseFeature(const uint8_t* data, size_t size, const FeatureValue& out) {
  return ForEachField(data, size, [&](const Field& f) {
    if (f.number == 1 && f.wire == 2 && out.bytes) {  // bytes_list
      ForEachField(f.data, f.len, [&](const Field& f2) {
        if (f2.number == 1 && f2.wire == 2) {
          out.bytes->assign(reinterpret_cast<const char*>(f2.data), f2.len);
        }
        return true;
      });
    } else if (f.number == 2 && f.wire == 2 && out.floats) {  // float_list
      ForEachField(f.data, f.len, [&](const Field& f2) {
        if (f2.number == 1) {
          if (f2.wire == 2) {  // packed
            size_t n = f2.len / 4;
            size_t base = out.floats->size();
            out.floats->resize(base + n);
            std::memcpy(out.floats->data() + base, f2.data, n * 4);
          } else if (f2.wire == 5) {
            float v;
            std::memcpy(&v, f2.data, 4);
            out.floats->push_back(v);
          }
        }
        return true;
      });
    } else if (f.number == 3 && f.wire == 2 && out.ints) {  // int64_list
      ForEachField(f.data, f.len, [&](const Field& f2) {
        if (f2.number == 1) {
          if (f2.wire == 2) {  // packed varints
            size_t p = 0;
            uint64_t v;
            while (p < f2.len) {
              if (!ReadVarint(f2.data, f2.len, &p, &v)) return false;
              out.ints->push_back(static_cast<int64_t>(v));
            }
          } else if (f2.wire == 0) {
            out.ints->push_back(static_cast<int64_t>(f2.varint));
          }
        }
        return true;
      });
    }
    return true;
  });
}

bool ParseSequenceExample(const uint8_t* data, size_t size, int64_t feat_len,
                          Utterance* utt) {
  return ForEachField(data, size, [&](const Field& f) {
    if (f.number == 1 && f.wire == 2) {  // context: Features (map entries)
      ForEachField(f.data, f.len, [&](const Field& entry) {
        if (entry.number != 1 || entry.wire != 2) return true;
        std::string name;
        const uint8_t* feat_data = nullptr;
        size_t feat_size = 0;
        ForEachField(entry.data, entry.len, [&](const Field& kv) {
          if (kv.number == 1 && kv.wire == 2) {
            name.assign(reinterpret_cast<const char*>(kv.data), kv.len);
          } else if (kv.number == 2 && kv.wire == 2) {
            feat_data = kv.data;
            feat_size = kv.len;
          }
          return true;
        });
        if (feat_data && name == "segment") {
          FeatureValue v;
          v.bytes = &utt->utt_id;
          ParseFeature(feat_data, feat_size, v);
        }
        return true;
      });
    } else if (f.number == 2 && f.wire == 2) {  // feature_lists
      ForEachField(f.data, f.len, [&](const Field& entry) {
        if (entry.number != 1 || entry.wire != 2) return true;
        std::string name;
        const uint8_t* fl_data = nullptr;
        size_t fl_size = 0;
        ForEachField(entry.data, entry.len, [&](const Field& kv) {
          if (kv.number == 1 && kv.wire == 2) {
            name.assign(reinterpret_cast<const char*>(kv.data), kv.len);
          } else if (kv.number == 2 && kv.wire == 2) {
            fl_data = kv.data;
            fl_size = kv.len;
          }
          return true;
        });
        if (!fl_data) return true;
        FeatureValue v;
        if (name == "logmel") v.floats = &utt->logmel;
        else if (name == "cint") v.ints = &utt->cint;
        else if (name == "pint") v.ints = &utt->pint;
        else return true;
        ForEachField(fl_data, fl_size, [&](const Field& fe) {
          if (fe.number == 1 && fe.wire == 2) {
            ParseFeature(fe.data, fe.len, v);
          }
          return true;
        });
        return true;
      });
    }
    return true;
  });
  return true;
}

}  // namespace

extern "C" {

// Parse a whole TFRecord file of SequenceExamples. Returns handle or nullptr.
void* sf_load(const char* path, int64_t feat_len) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return nullptr;
  std::string buf((std::istreambuf_iterator<char>(in)),
                  std::istreambuf_iterator<char>());
  auto file = std::make_unique<SpeechFile>();
  const uint8_t* data = reinterpret_cast<const uint8_t*>(buf.data());
  size_t size = buf.size(), pos = 0;
  while (pos + 12 <= size) {
    uint64_t len;
    std::memcpy(&len, data + pos, 8);  // little-endian host assumed (x86/arm)
    pos += 12;                          // skip length + length crc
    if (pos + len + 4 > size) return nullptr;  // truncated
    Utterance utt;
    if (!ParseSequenceExample(data + pos, len, feat_len, &utt)) return nullptr;
    utt.feat = feat_len;
    utt.frames = feat_len ? static_cast<int64_t>(utt.logmel.size()) / feat_len : 0;
    file->utts.push_back(std::move(utt));
    pos += len + 4;                     // skip data + data crc
  }
  return file.release();
}

int64_t sf_num_utts(void* handle) {
  return static_cast<SpeechFile*>(handle)->utts.size();
}

void sf_utt_dims(void* handle, int64_t i, int64_t* frames, int64_t* feat,
                 int64_t* n_char, int64_t* n_phone, int64_t* id_len) {
  const Utterance& u = static_cast<SpeechFile*>(handle)->utts[i];
  *frames = u.frames;
  *feat = u.feat;
  *n_char = u.cint.size();
  *n_phone = u.pint.size();
  *id_len = u.utt_id.size();
}

void sf_utt_copy(void* handle, int64_t i, float* logmel, int64_t* cint,
                 int64_t* pint, char* utt_id) {
  const Utterance& u = static_cast<SpeechFile*>(handle)->utts[i];
  if (logmel && !u.logmel.empty())
    std::memcpy(logmel, u.logmel.data(), u.logmel.size() * sizeof(float));
  if (cint && !u.cint.empty())
    std::memcpy(cint, u.cint.data(), u.cint.size() * sizeof(int64_t));
  if (pint && !u.pint.empty())
    std::memcpy(pint, u.pint.data(), u.pint.size() * sizeof(int64_t));
  if (utt_id && !u.utt_id.empty())
    std::memcpy(utt_id, u.utt_id.data(), u.utt_id.size());
}

void sf_free(void* handle) { delete static_cast<SpeechFile*>(handle); }

}  // extern "C"
