// Shared sampling/validation helpers for the preprocessing tools.
#pragma once

#include <algorithm>
#include <cmath>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "geometry.h"
#include "npz.h"

using geo::Vec3;

struct OrientedPoints {
  std::vector<Vec3> points;
  std::vector<Vec3> normals;
  std::vector<size_t> tri_ids;
};

static Vec3 face_normal(const geo::Mesh &m, size_t tri) {
  const auto &f = m.faces[tri];
  const Vec3 e1 = m.vertices[f[1]] - m.vertices[f[0]];
  const Vec3 e2 = m.vertices[f[2]] - m.vertices[f[0]];
  return e1.cross(e2).normalized();
}

static std::vector<float> face_area_cdf(const geo::Mesh &m, float *total_out) {
  std::vector<float> cdf;
  cdf.reserve(m.faces.size());
  float total = 0.f;
  for (size_t i = 0; i < m.faces.size(); ++i) {
    const auto &f = m.faces[i];
    const Vec3 e1 = m.vertices[f[1]] - m.vertices[f[0]];
    const Vec3 e2 = m.vertices[f[2]] - m.vertices[f[0]];
    float area = 0.5f * e1.cross(e2).norm();
    if (std::isnan(area)) area = 0.f;
    total += area;
    cdf.push_back(total);
  }
  *total_out = total;
  return cdf;
}

static Vec3 sample_in_triangle(const geo::Mesh &m, size_t tri, std::mt19937 &rng) {
  std::uniform_real_distribution<float> uf(0.f, 1.f);
  float r1 = std::sqrt(uf(rng));
  float r2 = uf(rng);
  const auto &f = m.faces[tri];
  return m.vertices[f[0]] * (1 - r1) + m.vertices[f[1]] * (r1 * (1 - r2)) +
         m.vertices[f[2]] * (r1 * r2);
}

// Area-weighted surface samples with per-sample face id.
static void sample_surface(const geo::Mesh &m, int count, std::mt19937 &rng,
                           std::vector<Vec3> *pts, std::vector<int> *tris) {
  float total;
  std::vector<float> cdf = face_area_cdf(m, &total);
  std::uniform_real_distribution<float> uf(0.f, total);
  while (static_cast<int>(pts->size()) < count) {
    float u = uf(rng);
    size_t tri = std::lower_bound(cdf.begin(), cdf.end(), u) - cdf.begin();
    if (tri >= m.faces.size()) tri = m.faces.size() - 1;
    pts->push_back(sample_in_triangle(m, tri, rng));
    tris->push_back(static_cast<int>(tri));
  }
}

// Oriented surface point set + mesh validity via ray-cast visibility votes.
// Returns false when the mesh fails the rejection thresholds (reference
// :548-559: wrong-observation fraction and bad-triangle fraction).
static bool validate_and_extract(const geo::Mesh &m, int dense_count,
                                 float view_radius, float reject_obs,
                                 float reject_tri, std::mt19937 &rng,
                                 OrientedPoints *out) {
  std::vector<Vec3> pts;
  std::vector<int> tris;
  sample_surface(m, dense_count, rng, &pts, &tris);

  geo::Bvh bvh(m);
  std::vector<Vec3> views = geo::equidist_sphere_points(20, view_radius);

  size_t n_check = std::min<size_t>(pts.size(), 4000);
  size_t obs = 0, wrong = 0;
  std::vector<int> tri_obs(m.faces.size(), 0), tri_wrong(m.faces.size(), 0);
  for (size_t i = 0; i < n_check; ++i) {
    const Vec3 &p = pts[i];
    const Vec3 n = face_normal(m, tris[i]);
    for (const Vec3 &v : views) {
      Vec3 dir = v - p;
      float dist = dir.norm();
      dir = dir / dist;
      if (bvh.occluded(p + dir * 1e-4f, dir, dist, tris[i])) continue;
      ++obs;
      ++tri_obs[tris[i]];
      if (n.dot(dir) < 0) {
        ++wrong;
        ++tri_wrong[tris[i]];
      }
    }
  }
  if (obs == 0) return false;
  float wrong_frac = static_cast<float>(wrong) / obs;
  size_t bad_tris = 0, seen_tris = 0;
  for (size_t t = 0; t < m.faces.size(); ++t) {
    if (tri_obs[t] == 0) continue;
    ++seen_tris;
    if (tri_wrong[t] > tri_obs[t] / 2) ++bad_tris;
  }
  float bad_frac = seen_tris ? static_cast<float>(bad_tris) / seen_tris : 1.f;
  std::cout << "wrong obs frac: " << wrong_frac << ", bad tri frac: "
            << bad_frac << std::endl;
  if (wrong_frac > reject_obs || bad_frac > reject_tri) return false;

  out->points = std::move(pts);
  out->tri_ids.assign(tris.begin(), tris.end());
  out->normals.resize(out->points.size());
  for (size_t i = 0; i < out->points.size(); ++i)
    out->normals[i] = face_normal(m, out->tri_ids[i]);
  return true;
}

// 11-vote signed-distance sampling (reference :96-198 SampleSDFNearSurface).
static void sample_sdf_near_surface(
    const geo::KdTree &tree, const OrientedPoints &surf, const geo::Mesh &mesh,
    int num_sample, float variance, float second_variance, std::mt19937 &rng,
    std::vector<Vec3> *xyz_out, std::vector<float> *sdf_out,
    std::vector<int> *tri_out) {
  const int num_votes = 11;
  const float stdv = std::sqrt(variance);
  int num_near = 47 * num_sample / 50;
  int num_rand = num_sample - num_near;

  std::vector<Vec3> seed_pts;
  std::vector<int> seed_tris;
  sample_surface(mesh, num_near / 2, rng, &seed_pts, &seed_tris);

  std::normal_distribution<float> n1(0.f, stdv);
  std::normal_distribution<float> n2(0.f, std::sqrt(second_variance));
  std::uniform_real_distribution<float> uf(0.f, 1.f);

  std::vector<Vec3> xyz;
  std::vector<int> tri_ids;
  for (size_t i = 0; i < seed_pts.size(); ++i) {
    Vec3 a = seed_pts[i], b = seed_pts[i];
    for (int j = 0; j < 3; ++j) {
      a[j] += n1(rng);
      b[j] += n2(rng);
    }
    xyz.push_back(a);
    xyz.push_back(b);
    tri_ids.push_back(seed_tris[i]);
    tri_ids.push_back(seed_tris[i]);
  }
  for (int s = 0; s < num_rand; ++s) {
    xyz.push_back(Vec3(uf(rng) * 2 - 1, uf(rng) * 2 - 1, uf(rng) * 2 - 1));
    tri_ids.push_back(-1);
  }

  std::vector<int> nn(num_votes);
  std::vector<float> d2(num_votes);
  for (size_t s = 0; s < xyz.size(); ++s) {
    const Vec3 &p = xyz[s];
    tree.knn(p, num_votes, nn.data(), d2.data());
    int num_pos = 0;
    float sdf = 0.f;
    int first_ind = nn[0];
    for (int k = 0; k < num_votes; ++k) {
      int ci = nn[k];
      if (ci < 0) continue;
      const Vec3 ray = p - surf.points[ci];
      const float len = ray.norm();
      if (k == 0) {
        sdf = (len < stdv) ? std::fabs(surf.normals[ci].dot(ray)) : len;
      }
      if (surf.normals[ci].dot(ray / len) > 0) ++num_pos;
    }
    // all-or-nothing vote (reference :183-195)
    if (num_pos == 0 || num_pos == num_votes) {
      if (num_pos <= num_votes / 2) sdf = -sdf;
      xyz_out->push_back(p);
      sdf_out->push_back(sdf);
      tri_out->push_back(tri_ids[s] == -1
                             ? static_cast<int>(surf.tri_ids[first_ind])
                             : tri_ids[s]);
    }
  }
}

// Closest-point signed distance to the *other* mesh (reference :649-708).
static void dist_to_other(const std::vector<Vec3> &xyz, const geo::KdTree &tree,
                          const OrientedPoints &surf, float variance,
                          std::vector<float> *sdf_out,
                          std::vector<int> *tri_out) {
  const float stdv = std::sqrt(variance);
  int nn[10];
  float d2[10];
  for (const Vec3 &p : xyz) {
    tree.knn(p, 10, nn, d2);
    int ci = nn[0];
    const Vec3 ray = p - surf.points[ci];
    float len = ray.norm();
    float sdf = (len < stdv) ? std::fabs(surf.normals[ci].dot(ray)) : len;
    if (surf.normals[ci].dot(ray / len) <= 0) sdf = -sdf;
    sdf_out->push_back(sdf);
    tri_out->push_back(static_cast<int>(surf.tri_ids[ci]));
  }
}

static void write_sdf_npz(const std::string &path, const std::vector<Vec3> &xyz,
                          const std::vector<float> &sdf,
                          const std::vector<int> &labels,
                          const std::vector<float> &sdf_other,
                          const std::vector<int> &labels_other) {
  std::vector<float> pos, neg, pos_other, neg_other;
  std::vector<int32_t> lab_pos, lab_neg, lab_pos_other, lab_neg_other;
  for (size_t i = 0; i < xyz.size(); ++i) {
    bool is_pos = sdf[i] > 0;
    auto &vals = is_pos ? pos : neg;
    auto &other = is_pos ? pos_other : neg_other;
    auto &lab = is_pos ? lab_pos : lab_neg;
    auto &lab_o = is_pos ? lab_pos_other : lab_neg_other;
    vals.push_back(xyz[i].x);
    vals.push_back(xyz[i].y);
    vals.push_back(xyz[i].z);
    vals.push_back(sdf[i]);
    other.push_back(sdf_other[i]);
    for (int j = 0; j < 4; ++j) {
      lab.push_back(labels[i * 4 + j]);
      lab_o.push_back(labels_other[i * 4 + j]);
    }
  }
  npz::NpzWriter w(path);
  w.add("pos", pos.data(), {pos.size() / 4, 4}, "<f4");
  w.add("neg", neg.data(), {neg.size() / 4, 4}, "<f4");
  w.add("lab_pos", lab_pos.data(), {lab_pos.size() / 4, 4}, "<i4");
  w.add("lab_neg", lab_neg.data(), {lab_neg.size() / 4, 4}, "<i4");
  w.add("pos_other", pos_other.data(), {pos_other.size(), 1}, "<f4");
  w.add("neg_other", neg_other.data(), {neg_other.size(), 1}, "<f4");
  w.add("lab_pos_other", lab_pos_other.data(), {lab_pos_other.size() / 4, 4}, "<i4");
  w.add("lab_neg_other", lab_neg_other.data(), {lab_neg_other.size() / 4, 4}, "<i4");
  w.close();
  std::cout << "pos num: " << pos.size() / 4 << "\nneg num: " << neg.size() / 4
            << std::endl;
}

static std::vector<int> face_labels_for(const std::vector<int> &tri_ids,
                                        const std::vector<int8_t> &table,
                                        bool is_object) {
  std::vector<int> out;
  out.reserve(tri_ids.size() * 4);
  for (int tri : tri_ids) {
    for (int j = 0; j < 4; ++j) {
      if (is_object || table.empty())
        out.push_back(0);
      else
        out.push_back(table[static_cast<size_t>(tri) * 4 + j]);
    }
  }
  return out;
}

