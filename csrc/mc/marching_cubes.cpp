// Native marching cubes (same tables/convention as the numpy implementation
// in alignsdf_tpu/geom/marching_cubes.py; loaded via ctypes).
//
// C API: two-call protocol — mc_extract fills internal buffers and returns
// counts, mc_fetch copies them out and frees.  Vertices are deduplicated via
// a global-edge-id hash map, faces wound outward (matching the python path).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "mc_tables.h"

namespace {

const int EDGE_CORNERS[12][2] = {
    {0, 1}, {1, 2}, {2, 3}, {3, 0}, {4, 5}, {5, 6},
    {6, 7}, {7, 4}, {0, 4}, {1, 5}, {2, 6}, {3, 7},
};
const int CORNER_OFFSETS[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

struct Result {
  std::vector<float> verts;
  std::vector<int64_t> faces;
};

thread_local Result g_result;

inline int64_t edge_global_id(int64_t ci, int64_t cj, int64_t ck, int edge,
                              int64_t ny, int64_t nz) {
  const int *a = CORNER_OFFSETS[EDGE_CORNERS[edge][0]];
  const int *b = CORNER_OFFSETS[EDGE_CORNERS[edge][1]];
  int lo[3], axis = 0;
  for (int d = 0; d < 3; ++d) {
    lo[d] = a[d] < b[d] ? a[d] : b[d];
    if (a[d] != b[d]) axis = d;
  }
  int64_t oi = ci + lo[0], oj = cj + lo[1], ok = ck + lo[2];
  return ((oi * ny + oj) * nz + ok) * 3 + axis;
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 when no surface crosses the level.
// On success *n_verts / *n_faces are set; call mc_fetch to copy + release.
int mc_extract(const float *volume, int64_t nx, int64_t ny, int64_t nz,
               float level, float sx, float sy, float sz,
               int64_t *n_verts, int64_t *n_faces) {
  Result &res = g_result;
  res.verts.clear();
  res.faces.clear();

  std::unordered_map<int64_t, int64_t> vert_of_edge;
  vert_of_edge.reserve(1 << 16);

  auto vol = [&](int64_t i, int64_t j, int64_t k) -> float {
    return volume[(i * ny + j) * nz + k];
  };

  float corner[8];
  for (int64_t i = 0; i + 1 < nx; ++i) {
    for (int64_t j = 0; j + 1 < ny; ++j) {
      for (int64_t k = 0; k + 1 < nz; ++k) {
        int code = 0;
        for (int c = 0; c < 8; ++c) {
          corner[c] = vol(i + CORNER_OFFSETS[c][0], j + CORNER_OFFSETS[c][1],
                          k + CORNER_OFFSETS[c][2]);
          if (corner[c] < level) code |= 1 << c;
        }
        if (MC_EDGE_TABLE[code] == 0) continue;

        const int8_t *tris = MC_TRI_TABLE[code];
        for (int t = 0; t < 15 && tris[t] >= 0; t += 3) {
          int64_t tri_vs[3];
          for (int e = 0; e < 3; ++e) {
            int edge = tris[t + e];
            int64_t eid = edge_global_id(i, j, k, edge, ny, nz);
            auto it = vert_of_edge.find(eid);
            if (it == vert_of_edge.end()) {
              int ca = EDGE_CORNERS[edge][0], cb = EDGE_CORNERS[edge][1];
              float va = corner[ca], vb = corner[cb];
              float denom = vb - va;
              float tt = std::fabs(denom) > 1e-12f ? (level - va) / denom : 0.5f;
              if (tt < 0) tt = 0;
              if (tt > 1) tt = 1;
              float px = i + CORNER_OFFSETS[ca][0] +
                         tt * (CORNER_OFFSETS[cb][0] - CORNER_OFFSETS[ca][0]);
              float py = j + CORNER_OFFSETS[ca][1] +
                         tt * (CORNER_OFFSETS[cb][1] - CORNER_OFFSETS[ca][1]);
              float pz = k + CORNER_OFFSETS[ca][2] +
                         tt * (CORNER_OFFSETS[cb][2] - CORNER_OFFSETS[ca][2]);
              int64_t id = static_cast<int64_t>(res.verts.size() / 3);
              res.verts.push_back(px * sx);
              res.verts.push_back(py * sy);
              res.verts.push_back(pz * sz);
              vert_of_edge.emplace(eid, id);
              tri_vs[e] = id;
            } else {
              tri_vs[e] = it->second;
            }
          }
          if (tri_vs[0] == tri_vs[1] || tri_vs[1] == tri_vs[2] ||
              tri_vs[0] == tri_vs[2])
            continue;  // degenerate (iso-value hits a corner)
          // flip winding for outward normals (python path parity)
          res.faces.push_back(tri_vs[2]);
          res.faces.push_back(tri_vs[1]);
          res.faces.push_back(tri_vs[0]);
        }
      }
    }
  }

  if (res.faces.empty()) return -1;
  *n_verts = static_cast<int64_t>(res.verts.size() / 3);
  *n_faces = static_cast<int64_t>(res.faces.size() / 3);
  return 0;
}

void mc_fetch(float *verts_out, int64_t *faces_out) {
  Result &res = g_result;
  std::memcpy(verts_out, res.verts.data(), res.verts.size() * sizeof(float));
  std::memcpy(faces_out, res.faces.data(), res.faces.size() * sizeof(int64_t));
  res.verts.clear();
  res.verts.shrink_to_fit();
  res.faces.clear();
  res.faces.shrink_to_fit();
}

}  // extern "C"
