// Native reader for the ASDF-pack dataset format (written by
// tools/pack_dataset.py) — the framework's production data path, replacing
// the reference's LMDB + python decode (reference tools/create_lmdb.py,
// utils/sdf_utils.py:119-163).
//
// File layout (little endian):
//   magic   "ASDFPK01" (8 bytes)
//   u64     n_records
//   u64     index_offset
//   ...record blobs...
//   index: per record, 7*u64: key_off, key_len, img_off, img_len,
//          meta_off, sdf_hand_off, sdf_obj_off
//   (lengths of meta/sdf blocks are implied by their fixed headers below)
//
// Blob encodings:
//   img:  raw uint8 H*W*3 (RGB)
//   meta: f32[4 + 61*3]  — [scale, offset(3)] + the reference's (61,3) meta
//         block (joints 21, corners 9, rest corners 9, pose 15, affine 4,
//         intrinsics 3 — reference tools/create_lmdb.py:106-115)
//   sdf:  u32 pos_num, u32 neg_num, then f32[(pos+neg) * 6]
//         rows = [xyz, sdf_self, sdf_other, label]
//
// The hot per-sample work (NaN drop, |sdf|<2 filter, split-half sampling with
// replacement, clamp-label masking — reference utils/sdf_utils.py:119-163)
// runs here in native code; python gets back fixed-shape float32 buffers.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <random>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <string>
#include <vector>

namespace {

struct Record {
  uint64_t key_off, key_len, img_off, img_len, meta_off, sdf_hand_off,
      sdf_obj_off;
};

struct Pack {
  int fd = -1;
  const uint8_t *data = nullptr;
  size_t size = 0;
  uint64_t n_records = 0;
  const Record *index = nullptr;
};

}  // namespace

extern "C" {

void *packed_open(const char *path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void *map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t *data = static_cast<const uint8_t *>(map);
  if (st.st_size < 24 || std::memcmp(data, "ASDFPK01", 8) != 0) {
    munmap(map, st.st_size);
    ::close(fd);
    return nullptr;
  }
  Pack *p = new Pack;
  p->fd = fd;
  p->data = data;
  p->size = st.st_size;
  std::memcpy(&p->n_records, data + 8, 8);
  uint64_t index_offset;
  std::memcpy(&index_offset, data + 16, 8);
  p->index = reinterpret_cast<const Record *>(data + index_offset);
  return p;
}

void packed_close(void *handle) {
  Pack *p = static_cast<Pack *>(handle);
  if (!p) return;
  munmap(const_cast<uint8_t *>(p->data), p->size);
  ::close(p->fd);
  delete p;
}

int64_t packed_count(void *handle) {
  return static_cast<Pack *>(handle)->n_records;
}

int64_t packed_key(void *handle, int64_t i, char *out, int64_t cap) {
  Pack *p = static_cast<Pack *>(handle);
  const Record &r = p->index[i];
  int64_t n = std::min<int64_t>(r.key_len, cap - 1);
  std::memcpy(out, p->data + r.key_off, n);
  out[n] = '\0';
  return r.key_len;
}

int64_t packed_image_len(void *handle, int64_t i) {
  return static_cast<Pack *>(handle)->index[i].img_len;
}

void packed_image(void *handle, int64_t i, uint8_t *out) {
  Pack *p = static_cast<Pack *>(handle);
  const Record &r = p->index[i];
  std::memcpy(out, p->data + r.img_off, r.img_len);
}

void packed_meta(void *handle, int64_t i, float *out /* 4 + 183 floats */) {
  Pack *p = static_cast<Pack *>(handle);
  const Record &r = p->index[i];
  std::memcpy(out, p->data + r.meta_off, (4 + 61 * 3) * sizeof(float));
}

// Split-half sampling with filtering; writes samples (subsample, 5) rows
// [xyz, sdf_hand_col, sdf_obj_col] and labels (subsample,).
// `hand` selects which sdf block AND the column order (reference
// utils/sdf_utils.py:171-188): for hand rows are [xyz, self, other]; for obj
// they are reordered to [xyz, other(=hand), self(=obj)].
int packed_sample_sdf(void *handle, int64_t i, int hand, int64_t subsample,
                      float clamp, int filter_dist, uint64_t seed,
                      float *out_samples, float *out_labels) {
  Pack *p = static_cast<Pack *>(handle);
  const Record &r = p->index[i];
  const uint8_t *blob = p->data + (hand ? r.sdf_hand_off : r.sdf_obj_off);
  uint32_t pos_num, neg_num;
  std::memcpy(&pos_num, blob, 4);
  std::memcpy(&neg_num, blob + 4, 4);
  const float *rows = reinterpret_cast<const float *>(blob + 8);

  auto gather_valid = [&](uint32_t begin, uint32_t end,
                          std::vector<uint32_t> *keep) {
    keep->clear();
    for (uint32_t k = begin; k < end; ++k) {
      const float *row = rows + k * 6;
      float s_self = row[3], s_other = row[4];
      if (std::isnan(s_self)) continue;
      if (filter_dist &&
          !(std::fabs(s_self) < 2.f && std::fabs(s_other) < 2.f))
        continue;
      keep->push_back(k);
    }
  };

  std::vector<uint32_t> pos_keep, neg_keep;
  gather_valid(0, pos_num, &pos_keep);
  gather_valid(pos_num, pos_num + neg_num, &neg_keep);

  std::mt19937_64 rng(seed);
  int64_t half = subsample / 2;

  auto emit = [&](const std::vector<uint32_t> &keep, int64_t count,
                  int64_t out_base) {
    std::uniform_real_distribution<double> uf(0.0, 1.0);
    for (int64_t s = 0; s < count; ++s) {
      float *out_row = out_samples + (out_base + s) * 5;
      if (keep.empty()) {
        std::memset(out_row, 0, 5 * sizeof(float));
        out_labels[out_base + s] = 0.f;
        continue;
      }
      uint32_t k = keep[static_cast<size_t>(uf(rng) * keep.size()) % keep.size()];
      const float *row = rows + k * 6;
      out_row[0] = row[0];
      out_row[1] = row[1];
      out_row[2] = row[2];
      if (hand) {
        out_row[3] = row[3];  // self = hand column
        out_row[4] = row[4];  // other = obj column
      } else {
        out_row[3] = row[4];  // other(=hand) column first
        out_row[4] = row[3];  // self(=obj)
      }
      out_labels[out_base + s] = row[5];
    }
  };

  emit(pos_keep, half, 0);
  emit(neg_keep, subsample - half, half);

  // clamp-label masking + obj labels forced to -1 (reference :156-161)
  for (int64_t s = 0; s < subsample; ++s) {
    float sdf_hand_col = out_samples[s * 5 + 3];
    if (clamp > 0 && (sdf_hand_col < -clamp || sdf_hand_col > clamp))
      out_labels[s] = -1.f;
    if (!hand) out_labels[s] = -1.f;
  }
  return 0;
}

int packed_reader_version() { return 1; }

}  // extern "C"
