// SampleVisibleMeshSurface — visible-surface point sampling (reference
// scripts/sample_points/src/SampleVisibleMeshSurface.cpp:60-341): samples
// oriented points on the mesh surface that are visible from at least one
// enclosing-sphere viewpoint, writing an npz point cloud (+ optional PLY).
//
//   sample_visible_surface --mesh m.obj --out pts.npz [--ply pts.ply]
//       [-s 30000] [--normalize n.npz]

#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "sampling.h"

int main(int argc, char **argv) {
  std::string mesh_file, out_file, ply_file, norm_file;
  int num_sample = 30000;
  uint32_t seed = std::random_device{}();
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--mesh") mesh_file = argv[++i];
    else if (a == "--out") out_file = argv[++i];
    else if (a == "--ply") ply_file = argv[++i];
    else if (a == "--normalize") norm_file = argv[++i];
    else if (a == "-s") num_sample = std::stoi(argv[++i]);
    else if (a == "--seed") seed = std::stoul(argv[++i]);
  }
  if (mesh_file.empty() || out_file.empty()) {
    std::cerr << "usage: sample_visible_surface --mesh m.obj --out pts.npz "
                 "[--ply pts.ply] [-s N] [--normalize n.npz]\n";
    return 1;
  }
  std::mt19937 rng(seed);
  geo::Mesh mesh = geo::load_mesh(mesh_file);

  Vec3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  for (const Vec3 &v : mesh.vertices)
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], v[a]);
      hi[a] = std::max(hi[a], v[a]);
    }
  Vec3 center = (lo + hi) / 2.f;
  float max_dist = 1e-9f;
  for (const Vec3 &v : mesh.vertices)
    max_dist = std::max(max_dist, (v - center).norm());
  max_dist *= 1.03f;
  for (Vec3 &v : mesh.vertices) v = (v - center) / max_dist;
  if (!norm_file.empty()) {
    npz::NpzWriter w(norm_file);
    float offset[3] = {-center.x, -center.y, -center.z};
    float scale = 1.f / max_dist;
    w.add("offset", offset, {3}, "<f4");
    w.add("scale", &scale, {1}, "<f4");
    w.close();
  }

  // oversample, then keep points visible from >=1 viewpoint
  std::vector<Vec3> pts;
  std::vector<int> tris;
  sample_surface(mesh, num_sample * 2, rng, &pts, &tris);
  geo::Bvh bvh(mesh);
  std::vector<Vec3> views = geo::equidist_sphere_points(20, 1.5f);

  std::vector<float> out;  // rows [x, y, z, nx, ny, nz]
  out.reserve(num_sample * 6);
  int kept = 0;
  for (size_t i = 0; i < pts.size() && kept < num_sample; ++i) {
    const Vec3 &p = pts[i];
    const Vec3 n = face_normal(mesh, tris[i]);
    bool visible = false;
    for (const Vec3 &v : views) {
      Vec3 dir = v - p;
      float dist = dir.norm();
      dir = dir / dist;
      if (n.dot(dir) <= 0) continue;  // back-facing to this viewpoint
      if (!bvh.occluded(p + dir * 1e-4f, dir, dist, tris[i])) {
        visible = true;
        break;
      }
    }
    if (!visible) continue;
    ++kept;
    out.push_back(p.x); out.push_back(p.y); out.push_back(p.z);
    out.push_back(n.x); out.push_back(n.y); out.push_back(n.z);
  }

  npz::NpzWriter w(out_file);
  w.add("points", out.data(), {out.size() / 6, 6}, "<f4");
  w.close();
  std::cout << "kept " << kept << " visible surface points -> " << out_file
            << std::endl;

  if (!ply_file.empty()) {
    std::ofstream f(ply_file);
    f << "ply\nformat ascii 1.0\nelement vertex " << kept
      << "\nproperty float x\nproperty float y\nproperty float z\nend_header\n";
    for (int i = 0; i < kept; ++i)
      f << out[i * 6] << " " << out[i * 6 + 1] << " " << out[i * 6 + 2] << "\n";
  }
  return 0;
}
