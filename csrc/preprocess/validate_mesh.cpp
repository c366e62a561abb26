// ValidateMesh — standalone mesh validity check (reference
// scripts/sample_points/src/ValidateMesh.cpp:249): runs the orientation/
// visibility vote machinery and reports pass/fail per mesh.
//
//   validate_mesh mesh1.obj [mesh2.obj ...] [--reject_obs 0.02]
//       [--reject_tri 0.05] [--log out.txt]

#include <fstream>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "sampling.h"

int main(int argc, char **argv) {
  std::vector<std::string> meshes;
  float reject_obs = 0.02f, reject_tri = 0.05f;
  std::string log_path;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--reject_obs") reject_obs = std::stof(argv[++i]);
    else if (a == "--reject_tri") reject_tri = std::stof(argv[++i]);
    else if (a == "--log") log_path = argv[++i];
    else meshes.push_back(a);
  }
  if (meshes.empty()) {
    std::cerr << "usage: validate_mesh mesh.obj [...] [--reject_obs F] "
                 "[--reject_tri F] [--log out.txt]\n";
    return 1;
  }

  std::ofstream log;
  if (!log_path.empty()) log.open(log_path, std::ios::app);
  std::mt19937 rng(0);
  int failures = 0;
  for (const std::string &path : meshes) {
    geo::Mesh mesh = geo::load_mesh(path);
    // normalize to the unit sphere so viewpoints enclose the mesh
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
    for (Vec3 &v : mesh.vertices) v = (v - center) / (max_dist * 1.03f);

    OrientedPoints surf;
    bool ok = validate_and_extract(mesh, 60000, 1.5f, reject_obs, reject_tri,
                                   rng, &surf);
    std::cout << path << ": " << (ok ? "VALID" : "INVALID") << std::endl;
    if (log) log << path << " " << (ok ? 1 : 0) << "\n";
    if (!ok) ++failures;
  }
  return failures > 0 ? 2 : 0;
}
