// PreprocessMesh — offline SDF sample generation for hand+object mesh pairs.
//
// Functional equivalent of the reference tool (reference
// scripts/sample_points/src/PreprocessMesh.cpp:711-925), producing the same
// npz schema (pos/neg (N,4), lab_pos/lab_neg (N,4) int32, pos_other/neg_other
// (N,1), lab_*_other, plus the norm npz {offset, scale}).  Differences by
// design (documented):
//   * visible-surface extraction + orientation votes use BVH ray casting to
//     Fibonacci-sphere viewpoints instead of OpenGL FBO renders (no GL/EGL
//     dependency; same rejection thresholds: 2% wrong observations, 5% bad
//     triangles — reference :727-728);
//   * the oriented surface point set is dense area-weighted sampling with
//     face normals instead of per-pixel render hits.
//
// CLI matches the reference:
//   preprocess_mesh --hand hand.obj --obj obj.obj --outhand h.npz
//       --outobj o.npz --normalize norm.npz [-s 20000] [--var 0.005]
//       [--face2label face2label_sealed.npy]

#include <chrono>
#include <cstring>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "sampling.h"

int main(int argc, char **argv) {
  std::string hand_file, obj_file, out_hand, out_obj, norm_file, face2label_file;
  int num_sample = 20000;
  float variance = 0.005f;
  float reject_obs = 0.02f, reject_tri = 0.05f;
  uint32_t seed = std::random_device{}();

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string { return argv[++i]; };
    if (a == "--hand") hand_file = next();
    else if (a == "--obj") obj_file = next();
    else if (a == "--outhand") out_hand = next();
    else if (a == "--outobj") out_obj = next();
    else if (a == "--normalize") norm_file = next();
    else if (a == "--face2label") face2label_file = next();
    else if (a == "-s") num_sample = std::stoi(next());
    else if (a == "--var") variance = std::stof(next());
    else if (a == "--seed") seed = std::stoul(next());
    else if (a == "--help") {
      std::cout << "usage: preprocess_mesh --hand h.obj --obj o.obj "
                   "--outhand h.npz --outobj o.npz --normalize n.npz "
                   "[-s N] [--var V] [--face2label f.npy] [--seed S]\n";
      return 0;
    }
  }
  if (hand_file.empty() || obj_file.empty() || out_hand.empty() ||
      out_obj.empty()) {
    std::cerr << "missing required arguments (--help)\n";
    return 1;
  }
  float second_variance = variance / 10.f;
  std::mt19937 rng(seed);

  geo::Mesh hand = geo::load_mesh(hand_file);
  geo::Mesh obj = geo::load_mesh(obj_file);

  std::vector<int8_t> face2label;
  if (!face2label_file.empty()) {
    std::vector<size_t> shape;
    face2label = npz::load_npy<int8_t>(face2label_file, &shape);
  }

  // joint normalization to the unit sphere (reference :794-832)
  Vec3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  for (const geo::Mesh *m : {&hand, &obj})
    for (const Vec3 &v : m->vertices)
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], v[a]);
        hi[a] = std::max(hi[a], v[a]);
      }
  Vec3 center = (lo + hi) / 2.f;
  float max_dist = 0.f;
  for (const geo::Mesh *m : {&hand, &obj})
    for (const Vec3 &v : m->vertices)
      max_dist = std::max(max_dist, (v - center).norm());
  max_dist *= 1.03f;

  if (!norm_file.empty()) {
    npz::NpzWriter w(norm_file);
    float offset[3] = {-center.x, -center.y, -center.z};
    float scale = 1.f / max_dist;
    w.add("offset", offset, {3}, "<f4");
    w.add("scale", &scale, {1}, "<f4");
    w.close();
  }
  for (geo::Mesh *m : {&hand, &obj})
    for (Vec3 &v : m->vertices) v = (v - center) / max_dist;

  auto process = [&](const geo::Mesh &mesh, bool is_object,
                     const std::string &out_path, OrientedPoints *surf,
                     std::vector<Vec3> *xyz, std::vector<float> *sdf,
                     std::vector<int> *labels) -> bool {
    if (!validate_and_extract(mesh, 150000, 1.5f, reject_obs, reject_tri, rng,
                              surf)) {
      std::cerr << "mesh failed validation: "
                << (is_object ? obj_file : hand_file) << std::endl;
      return false;
    }
    geo::KdTree tree(surf->points);
    std::vector<int> tri_ids;
    sample_sdf_near_surface(tree, *surf, mesh, num_sample, variance,
                            second_variance, rng, xyz, sdf, &tri_ids);
    *labels = face_labels_for(tri_ids, face2label, is_object);
    std::cout << (is_object ? "success object" : "success hand") << std::endl;
    return true;
  };

  OrientedPoints surf_hand, surf_obj;
  std::vector<Vec3> xyz_hand, xyz_obj;
  std::vector<float> sdf_hand, sdf_obj;
  std::vector<int> lab_hand, lab_obj;

  if (!process(hand, false, out_hand, &surf_hand, &xyz_hand, &sdf_hand, &lab_hand))
    return 0;  // reference exits 0 on invalid meshes (:676-678)
  if (!process(obj, true, out_obj, &surf_obj, &xyz_obj, &sdf_obj, &lab_obj))
    return 0;

  geo::KdTree tree_hand(surf_hand.points);
  geo::KdTree tree_obj(surf_obj.points);

  std::vector<float> hand_to_obj, obj_to_hand;
  std::vector<int> tri_h2o, tri_o2h;
  dist_to_other(xyz_hand, tree_obj, surf_obj, variance, &hand_to_obj, &tri_h2o);
  dist_to_other(xyz_obj, tree_hand, surf_hand, variance, &obj_to_hand, &tri_o2h);
  std::vector<int> lab_h2o = face_labels_for(tri_h2o, face2label, true);
  std::vector<int> lab_o2h = face_labels_for(tri_o2h, face2label, false);

  write_sdf_npz(out_obj, xyz_obj, sdf_obj, lab_obj, obj_to_hand, lab_o2h);
  write_sdf_npz(out_hand, xyz_hand, sdf_hand, lab_hand, hand_to_obj, lab_h2o);
  return 0;
}
