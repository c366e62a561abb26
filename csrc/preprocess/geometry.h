// Mesh IO, kd-tree and BVH raycasting for the SDF preprocessing tool.
//
// Replaces the reference's Pangolin/Eigen/nanoflann stack (reference
// scripts/sample_points/src/Utils.{h,cpp}) with dependency-free C++17.
#pragma once

#include <algorithm>
#include <array>
#include <cmath>
#include <fstream>
#include <limits>
#include <numeric>
#include <queue>
#include <random>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace geo {

struct Vec3 {
  float x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  Vec3 operator/(float s) const { return {x / s, y / s, z / s}; }
  float dot(const Vec3 &o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3 &o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  float norm() const { return std::sqrt(dot(*this)); }
  Vec3 normalized() const {
    float n = norm();
    return n > 0 ? *this / n : Vec3{0, 0, 0};
  }
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
  float &operator[](int i) { return i == 0 ? x : (i == 1 ? y : z); }
};

struct Mesh {
  std::vector<Vec3> vertices;
  std::vector<std::array<uint32_t, 3>> faces;
};

// ------------------------------------------------------------------ OBJ/PLY IO

inline Mesh load_obj(const std::string &path) {
  Mesh mesh;
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.rfind("v ", 0) == 0) {
      std::istringstream ss(line.substr(2));
      Vec3 v;
      ss >> v.x >> v.y >> v.z;
      mesh.vertices.push_back(v);
    } else if (line.rfind("f ", 0) == 0) {
      std::istringstream ss(line.substr(2));
      std::vector<uint32_t> idx;
      std::string tok;
      while (ss >> tok) {
        idx.push_back(static_cast<uint32_t>(
            std::stol(tok.substr(0, tok.find('/'))) - 1));
      }
      for (size_t k = 2; k < idx.size(); ++k)
        mesh.faces.push_back({idx[0], idx[k - 1], idx[k]});
    }
  }
  return mesh;
}

inline Mesh load_mesh(const std::string &path) {
  if (path.size() >= 4 && path.substr(path.size() - 4) == ".obj")
    return load_obj(path);
  throw std::runtime_error("unsupported mesh format: " + path);
}

// ------------------------------------------------------------------- kd-tree

// Median-split kd-tree with k-NN search over a fixed point set
// (replaces nanoflann; reference src/Utils.h:10-35).
class KdTree {
 public:
  explicit KdTree(const std::vector<Vec3> &pts) : pts_(pts) {
    idx_.resize(pts.size());
    std::iota(idx_.begin(), idx_.end(), 0u);
    nodes_.reserve(pts.size() * 2);
    root_ = build(0, static_cast<int>(pts.size()), 0);
  }

  void knn(const Vec3 &q, int k, int *out_idx, float *out_d2) const {
    // max-heap of (dist2, index)
    std::priority_queue<std::pair<float, int>> heap;
    search(root_, q, k, heap);
    int n = static_cast<int>(heap.size());
    for (int i = n - 1; i >= 0; --i) {
      out_d2[i] = heap.top().first;
      out_idx[i] = heap.top().second;
      heap.pop();
    }
    for (int i = n; i < k; ++i) { out_idx[i] = -1; out_d2[i] = 1e30f; }
  }

 private:
  struct Node {
    int left = -1, right = -1;
    int begin = 0, end = 0;  // leaf range into idx_
    int axis = 0;
    float split = 0;
    bool leaf = false;
  };

  int build(int begin, int end, int depth) {
    Node node;
    if (end - begin <= 16) {
      node.leaf = true;
      node.begin = begin;
      node.end = end;
      nodes_.push_back(node);
      return static_cast<int>(nodes_.size()) - 1;
    }
    int axis = depth % 3;
    int mid = (begin + end) / 2;
    std::nth_element(idx_.begin() + begin, idx_.begin() + mid,
                     idx_.begin() + end, [&](uint32_t a, uint32_t b) {
                       return pts_[a][axis] < pts_[b][axis];
                     });
    node.axis = axis;
    node.split = pts_[idx_[mid]][axis];
    int self = static_cast<int>(nodes_.size());
    nodes_.push_back(node);
    int left = build(begin, mid, depth + 1);
    int right = build(mid, end, depth + 1);
    nodes_[self].left = left;
    nodes_[self].right = right;
    return self;
  }

  void search(int ni, const Vec3 &q, int k,
              std::priority_queue<std::pair<float, int>> &heap) const {
    const Node &node = nodes_[ni];
    if (node.leaf) {
      for (int i = node.begin; i < node.end; ++i) {
        const Vec3 d = pts_[idx_[i]] - q;
        float d2 = d.dot(d);
        if (static_cast<int>(heap.size()) < k) {
          heap.emplace(d2, static_cast<int>(idx_[i]));
        } else if (d2 < heap.top().first) {
          heap.pop();
          heap.emplace(d2, static_cast<int>(idx_[i]));
        }
      }
      return;
    }
    float delta = q[node.axis] - node.split;
    int near = delta <= 0 ? node.left : node.right;
    int far = delta <= 0 ? node.right : node.left;
    search(near, q, k, heap);
    if (static_cast<int>(heap.size()) < k || delta * delta < heap.top().first)
      search(far, q, k, heap);
  }

  const std::vector<Vec3> &pts_;
  std::vector<uint32_t> idx_;
  std::vector<Node> nodes_;
  int root_;
};

// ---------------------------------------------------------------------- BVH

// Median BVH over triangles for ray casting (visibility validation — replaces
// the reference's 100-viewpoint OpenGL render votes, src/PreprocessMesh.cpp:412-574).
class Bvh {
 public:
  explicit Bvh(const Mesh &mesh) : mesh_(mesh) {
    size_t n = mesh.faces.size();
    centroids_.resize(n);
    order_.resize(n);
    for (size_t i = 0; i < n; ++i) {
      const auto &f = mesh.faces[i];
      centroids_[i] = (mesh.vertices[f[0]] + mesh.vertices[f[1]] +
                       mesh.vertices[f[2]]) / 3.0f;
      order_[i] = static_cast<uint32_t>(i);
    }
    nodes_.reserve(2 * n);
    root_ = build(0, static_cast<int>(n));
  }

  // Does segment (origin -> origin + dir*t_max) hit any triangle except skip?
  bool occluded(const Vec3 &origin, const Vec3 &dir, float t_max,
                int skip_tri) const {
    return occluded(root_, origin, dir, t_max, skip_tri);
  }

 private:
  struct Node {
    Vec3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
    int left = -1, right = -1, begin = 0, end = 0;
    bool leaf = false;
  };

  void grow(Node &node, const Vec3 &p) {
    for (int a = 0; a < 3; ++a) {
      node.lo[a] = std::min(node.lo[a], p[a]);
      node.hi[a] = std::max(node.hi[a], p[a]);
    }
  }

  int build(int begin, int end) {
    Node node;
    for (int i = begin; i < end; ++i) {
      const auto &f = mesh_.faces[order_[i]];
      grow(node, mesh_.vertices[f[0]]);
      grow(node, mesh_.vertices[f[1]]);
      grow(node, mesh_.vertices[f[2]]);
    }
    if (end - begin <= 4) {
      node.leaf = true;
      node.begin = begin;
      node.end = end;
      nodes_.push_back(node);
      return static_cast<int>(nodes_.size()) - 1;
    }
    Vec3 extent = node.hi - node.lo;
    int axis = extent.x > extent.y ? (extent.x > extent.z ? 0 : 2)
                                   : (extent.y > extent.z ? 1 : 2);
    int mid = (begin + end) / 2;
    std::nth_element(order_.begin() + begin, order_.begin() + mid,
                     order_.begin() + end, [&](uint32_t a, uint32_t b) {
                       return centroids_[a][axis] < centroids_[b][axis];
                     });
    int self = static_cast<int>(nodes_.size());
    nodes_.push_back(node);
    int l = build(begin, mid);
    int r = build(mid, end);
    nodes_[self].left = l;
    nodes_[self].right = r;
    return self;
  }

  bool hit_box(const Node &n, const Vec3 &o, const Vec3 &inv_dir,
               float t_max) const {
    float t0 = 0, t1 = t_max;
    for (int a = 0; a < 3; ++a) {
      float ta = (n.lo[a] - o[a]) * inv_dir[a];
      float tb = (n.hi[a] - o[a]) * inv_dir[a];
      if (ta > tb) std::swap(ta, tb);
      t0 = std::max(t0, ta);
      t1 = std::min(t1, tb);
      if (t0 > t1) return false;
    }
    return true;
  }

  bool occluded(int ni, const Vec3 &o, const Vec3 &d, float t_max,
                int skip_tri) const {
    const Node &node = nodes_[ni];
    Vec3 inv{1.0f / (d.x == 0 ? 1e-30f : d.x),
             1.0f / (d.y == 0 ? 1e-30f : d.y),
             1.0f / (d.z == 0 ? 1e-30f : d.z)};
    if (!hit_box(node, o, inv, t_max)) return false;
    if (node.leaf) {
      for (int i = node.begin; i < node.end; ++i) {
        int tri = static_cast<int>(order_[i]);
        if (tri == skip_tri) continue;
        if (ray_tri(o, d, tri, t_max)) return true;
      }
      return false;
    }
    return occluded(node.left, o, d, t_max, skip_tri) ||
           occluded(node.right, o, d, t_max, skip_tri);
  }

  bool ray_tri(const Vec3 &o, const Vec3 &d, int tri, float t_max) const {
    const auto &f = mesh_.faces[tri];
    const Vec3 &a = mesh_.vertices[f[0]];
    const Vec3 e1 = mesh_.vertices[f[1]] - a;
    const Vec3 e2 = mesh_.vertices[f[2]] - a;
    const Vec3 p = d.cross(e2);
    float det = e1.dot(p);
    if (std::fabs(det) < 1e-12f) return false;
    float inv_det = 1.0f / det;
    const Vec3 s = o - a;
    float u = s.dot(p) * inv_det;
    if (u < 0 || u > 1) return false;
    const Vec3 q = s.cross(e1);
    float v = d.dot(q) * inv_det;
    if (v < 0 || u + v > 1) return false;
    float t = e2.dot(q) * inv_det;
    return t > 1e-5f && t < t_max - 1e-5f;
  }

  const Mesh &mesh_;
  std::vector<Vec3> centroids_;
  std::vector<uint32_t> order_;
  std::vector<Node> nodes_;
  int root_;
};

// -------------------------------------------------------- sphere viewpoints

// Fibonacci-spiral equidistributed points on a sphere
// (reference src/Utils.cpp:7-28 EquiDistPointsOnSphere).
inline std::vector<Vec3> equidist_sphere_points(int n, float radius) {
  std::vector<Vec3> pts(n);
  double inc = M_PI * (3.0 - std::sqrt(5.0));
  double off = 2.0 / n;
  for (int k = 0; k < n; ++k) {
    double y = k * off - 1.0 + off / 2.0;
    double r = std::sqrt(1.0 - y * y);
    double phi = k * inc;
    pts[k] = Vec3(static_cast<float>(std::cos(phi) * r * radius),
                  static_cast<float>(y * radius),
                  static_cast<float>(std::sin(phi) * r * radius));
  }
  return pts;
}

}  // namespace geo
