// Standalone profiling driver for the native SSP decimation engine
// (VERDICT round-3 item 10: profile the 124.5 s ico9 hierarchy build).
//
// Generates an icosphere at a given subdivision level (same topology as
// utils/meshes.icosphere), runs run_decimate to ratio*nF, and reports
// wall time.  Build with -pg for gprof attribution:
//   g++ -O3 -march=native -std=c++17 -fopenmp -pg -g \
//       benchmarks/probes/ssp_profile_main.cpp -o /tmp/ssp_prof
//   /tmp/ssp_prof 8 0.25 && gprof /tmp/ssp_prof gmon.out | head -60
//
// The engine source is #included so internal (static) functions are
// compiled into this binary and visible to gprof.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <utility>
#include <vector>

#include "../../surface_multigrid_code_tpu/native/ssp.cpp"

using ssp::i64;

static void icosphere(int level, std::vector<double>& V, std::vector<i64>& F) {
  const double t = (1.0 + std::sqrt(5.0)) / 2.0;
  double v0[12][3] = {{-1, t, 0}, {1, t, 0},  {-1, -t, 0}, {1, -t, 0},
                      {0, -1, t}, {0, 1, t},  {0, -1, -t}, {0, 1, -t},
                      {t, 0, -1}, {t, 0, 1},  {-t, 0, -1}, {-t, 0, 1}};
  i64 f0[20][3] = {{0, 11, 5}, {0, 5, 1},   {0, 1, 7},   {0, 7, 10},
                   {0, 10, 11}, {1, 5, 9},  {5, 11, 4},  {11, 10, 2},
                   {10, 7, 6},  {7, 1, 8},  {3, 9, 4},   {3, 4, 2},
                   {3, 2, 6},   {3, 6, 8},  {3, 8, 9},   {4, 9, 5},
                   {2, 4, 11},  {6, 2, 10}, {8, 6, 7},   {9, 8, 1}};
  V.clear();
  F.clear();
  for (auto& p : v0) {
    double n = std::sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2]);
    V.push_back(p[0] / n);
    V.push_back(p[1] / n);
    V.push_back(p[2] / n);
  }
  for (auto& f : f0) {
    F.push_back(f[0]);
    F.push_back(f[1]);
    F.push_back(f[2]);
  }
  for (int l = 0; l < level; ++l) {
    std::map<std::pair<i64, i64>, i64> mid;
    auto midpoint = [&](i64 a, i64 b) {
      auto key = std::minmax(a, b);
      auto it = mid.find(key);
      if (it != mid.end()) return it->second;
      double x = 0.5 * (V[3 * a] + V[3 * b]);
      double y = 0.5 * (V[3 * a + 1] + V[3 * b + 1]);
      double z = 0.5 * (V[3 * a + 2] + V[3 * b + 2]);
      double n = std::sqrt(x * x + y * y + z * z);
      i64 id = (i64)V.size() / 3;
      V.push_back(x / n);
      V.push_back(y / n);
      V.push_back(z / n);
      mid[key] = id;
      return id;
    };
    std::vector<i64> F2;
    F2.reserve(F.size() * 4);
    for (size_t k = 0; k < F.size(); k += 3) {
      i64 a = F[k], b = F[k + 1], c = F[k + 2];
      i64 ab = midpoint(a, b), bc = midpoint(b, c), ca = midpoint(c, a);
      i64 nf[12] = {a, ab, ca, b, bc, ab, c, ca, bc, ab, bc, ca};
      F2.insert(F2.end(), nf, nf + 12);
    }
    F.swap(F2);
  }
}

int main(int argc, char** argv) {
  int level = argc > 1 ? atoi(argv[1]) : 7;
  double ratio = argc > 2 ? atof(argv[2]) : 0.25;
  int dec_type = argc > 3 ? atoi(argv[3]) : 1;  // midpoint (hierarchy default)
  std::vector<double> V;
  std::vector<i64> F;
  icosphere(level, V, F);
  i64 nV = (i64)V.size() / 3, nF = (i64)F.size() / 3;
  i64 tarF = (i64)(ratio * (double)nF);
  std::printf("icosphere level %d: nV=%lld nF=%lld -> tarF=%lld\n", level,
              (long long)nV, (long long)nF, (long long)tarF);
  auto t0 = std::chrono::steady_clock::now();
  ssp::Result* R =
      ssp::run_decimate(V.data(), nV, F.data(), nF, tarF, dec_type, 0, 0, 1);
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  std::printf("decimate: %.2f s  ok=%d collapses=%lld\n", dt, (int)R->ok,
              (long long)R->log.n);
  delete R;
  return 0;
}
