// Minimal .npy/.npz (zip, stored) writer + .npy reader.
//
// Replaces the reference's vendored cnpy (reference third-party/cnpy) for the
// preprocessing tools.  Writes numpy-compatible v1.0 .npy headers and a
// stored (no-compression) zip container that numpy.load reads directly.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

#include <zlib.h>  // crc32

namespace npz {

inline std::string npy_header(const std::string &dtype,
                              const std::vector<size_t> &shape) {
  std::string shape_s = "(";
  for (size_t i = 0; i < shape.size(); ++i) {
    shape_s += std::to_string(shape[i]);
    if (shape.size() == 1 || i + 1 < shape.size()) shape_s += ",";
  }
  shape_s += ")";
  std::string dict = "{'descr': '" + dtype +
                     "', 'fortran_order': False, 'shape': " + shape_s + ", }";
  // pad with spaces so that magic+header is a multiple of 64, ending in \n
  size_t unpadded = 10 + dict.size() + 1;
  size_t padded = (unpadded + 63) / 64 * 64;
  dict.append(padded - unpadded, ' ');
  dict += '\n';

  std::string out("\x93NUMPY\x01\x00", 8);
  uint16_t hlen = static_cast<uint16_t>(dict.size());
  out.push_back(static_cast<char>(hlen & 0xff));
  out.push_back(static_cast<char>(hlen >> 8));
  out += dict;
  return out;
}

struct ZipEntry {
  std::string name;
  uint32_t crc;
  uint32_t size;
  uint32_t offset;
};

// Incremental stored-zip writer holding one open file.
class NpzWriter {
 public:
  explicit NpzWriter(const std::string &path) : f_(path, std::ios::binary) {
    if (!f_) throw std::runtime_error("cannot open " + path);
  }

  template <typename T>
  void add(const std::string &name, const T *data,
           const std::vector<size_t> &shape, const std::string &dtype) {
    std::string header = npy_header(dtype, shape);
    size_t count = 1;
    for (size_t s : shape) count *= s;
    size_t payload = header.size() + count * sizeof(T);

    uint32_t crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, reinterpret_cast<const Bytef *>(header.data()), header.size());
    crc = crc32(crc, reinterpret_cast<const Bytef *>(data), count * sizeof(T));

    std::string fname = name + ".npy";
    ZipEntry e{fname, crc, static_cast<uint32_t>(payload),
               static_cast<uint32_t>(f_.tellp())};
    entries_.push_back(e);

    write_local_header(e);
    f_.write(header.data(), header.size());
    f_.write(reinterpret_cast<const char *>(data), count * sizeof(T));
  }

  void close() {
    uint32_t cd_start = static_cast<uint32_t>(f_.tellp());
    for (const auto &e : entries_) write_central_header(e);
    uint32_t cd_size = static_cast<uint32_t>(f_.tellp()) - cd_start;
    // end of central directory
    put32(0x06054b50);
    put16(0); put16(0);
    put16(static_cast<uint16_t>(entries_.size()));
    put16(static_cast<uint16_t>(entries_.size()));
    put32(cd_size);
    put32(cd_start);
    put16(0);
    f_.close();
  }

 private:
  void put16(uint16_t v) { f_.write(reinterpret_cast<char *>(&v), 2); }
  void put32(uint32_t v) { f_.write(reinterpret_cast<char *>(&v), 4); }

  void write_local_header(const ZipEntry &e) {
    put32(0x04034b50);
    put16(20); put16(0); put16(0);  // version, flags, method=stored
    put16(0); put16(0);             // time, date
    put32(e.crc);
    put32(e.size); put32(e.size);
    put16(static_cast<uint16_t>(e.name.size())); put16(0);
    f_.write(e.name.data(), e.name.size());
  }

  void write_central_header(const ZipEntry &e) {
    put32(0x02014b50);
    put16(20); put16(20); put16(0); put16(0);
    put16(0); put16(0);
    put32(e.crc);
    put32(e.size); put32(e.size);
    put16(static_cast<uint16_t>(e.name.size())); put16(0); put16(0);
    put16(0); put16(0); put32(0);
    put32(e.offset);
    f_.write(e.name.data(), e.name.size());
  }

  std::ofstream f_;
  std::vector<ZipEntry> entries_;
};

// Minimal .npy reader (little-endian, C-order) for face2label lookup tables.
template <typename T>
std::vector<T> load_npy(const std::string &path, std::vector<size_t> *shape_out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  char magic[8];
  f.read(magic, 8);
  if (std::memcmp(magic + 1, "NUMPY", 5) != 0)
    throw std::runtime_error("not an npy file: " + path);
  uint16_t hlen = 0;
  f.read(reinterpret_cast<char *>(&hlen), 2);
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);

  auto pos = header.find("'shape':");
  auto lp = header.find('(', pos);
  auto rp = header.find(')', lp);
  std::string shape_s = header.substr(lp + 1, rp - lp - 1);
  std::vector<size_t> shape;
  size_t start = 0;
  while (start < shape_s.size()) {
    size_t comma = shape_s.find(',', start);
    std::string tok = shape_s.substr(start, comma - start);
    if (!tok.empty() && tok.find_first_not_of(" ") != std::string::npos)
      shape.push_back(std::stoul(tok));
    if (comma == std::string::npos) break;
    start = comma + 1;
  }
  size_t count = 1;
  for (size_t s : shape) count *= s;
  std::vector<T> data(count);
  f.read(reinterpret_cast<char *>(data.data()), count * sizeof(T));
  if (shape_out) *shape_out = shape;
  return data;
}

}  // namespace npz
