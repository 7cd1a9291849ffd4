// Native CPU reference of the voxel-grid neighbor query.
//
// Re-implementation (not a translation) of the semantics of the
// reference's only native component — the six CUDA kernels + host
// orchestration in
// reference: pointnerf/models/neural_points/cuda/query_worldcoords.cu
//   claim_occ (:18-78), map_coor2occ (:80-115), fill_occ2pnts
//   (:117-162), mask_raypos (:165-189), get_shadingloc (:192-214),
//   query_neigh_along_ray_layered (:217-302), host fn (:305-433) —
// with the TPU framework's deterministic, fixed-shape contract instead
// of atomics + reservoir sampling + dynamic ray compaction:
//   * voxel slots are assigned in ascending flat-voxel-id order and
//     voxels beyond max_o are dropped (not reservoir-replaced);
//   * each voxel keeps its first P points by point index;
//   * every ray keeps SR padded shading slots + validity masks;
//   * K-NN searches Chebyshev shells in scan order, skipping a shell
//     when inner shells already yielded >= K candidates, and breaks
//     distance ties by scan position.
// This is the oracle the jitted XLA pipeline (ops/grid.py, ops/query.py)
// is tested against (tests/test_native_parity.py); it is also a usable
// host-side fallback querier.
//
// Build: g++ -O2 -shared -fPIC -o libquery_ref.so query_ref.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

namespace {

struct Vox {
  int64_t flat;
  int32_t pid;
};

inline int64_t flat_id(int x, int y, int z, int gy, int gz) {
  return (int64_t)x * gy * gz + (int64_t)y * gz + z;
}

}  // namespace

extern "C" {

// Builds the grid and answers the query in one call.
// Outputs:
//   sample_pidx  [R*SR*K] int32, -1 padded
//   sample_loc   [R*SR*3] float
//   sample_mask  [R*SR]   uint8
//   ray_mask     [R]      uint8
// Returns number of occupied voxels kept (= min(n_occ, max_o)).
int query_ref(
    const float* xyz, int n_points, const uint8_t* alive,
    const float* ranges_min, const float* scaled_vsize,
    int gx, int gy, int gz, int max_o, int P,
    int qsx, int qsy, int qsz,
    int ksx, int ksy, int ksz,
    const float* raypos, int R, int D,
    int SR, int K, float radius2, int layered,
    int32_t* sample_pidx, float* sample_loc,
    uint8_t* sample_mask, uint8_t* ray_mask) {
  const int64_t nvox = (int64_t)gx * gy * gz;

  // ---- stage 1-3: grid build (claim_occ / fill_occ2pnts semantics,
  // deterministic ordering) ----
  std::vector<Vox> entries;
  entries.reserve(n_points);
  for (int i = 0; i < n_points; ++i) {
    if (alive && !alive[i]) continue;
    int c[3];
    bool inb = true;
    for (int a = 0; a < 3; ++a) {
      c[a] = (int)std::floor((xyz[i * 3 + a] - ranges_min[a]) /
                             scaled_vsize[a]);
      int dim = a == 0 ? gx : (a == 1 ? gy : gz);
      if (c[a] < 0 || c[a] >= dim) inb = false;
    }
    if (!inb) continue;
    entries.push_back({flat_id(c[0], c[1], c[2], gy, gz), i});
  }
  std::stable_sort(entries.begin(), entries.end(),
                   [](const Vox& a, const Vox& b) { return a.flat < b.flat; });

  std::vector<int32_t> coor_2_occ(nvox, -1);
  std::vector<int32_t> occ_pnts((size_t)max_o * P, -1);
  std::vector<int32_t> occ_num(max_o, 0);
  int slot = -1;
  int64_t prev = -1;
  for (const Vox& e : entries) {
    if (e.flat != prev) {
      ++slot;
      prev = e.flat;
      if (slot < max_o) coor_2_occ[e.flat] = slot;
    }
    if (slot >= max_o) continue;
    if (occ_num[slot] < P) occ_pnts[(size_t)slot * P + occ_num[slot]] = e.pid;
    occ_num[slot]++;
  }
  const int n_occ = std::min(slot + 1, max_o);

  // ---- stage 2: occupancy dilation (map_coor2occ semantics; scatter
  // window [c - q/2, c + (q+1)/2 - 1] per axis) ----
  std::vector<uint8_t> coor_occ(nvox, 0);
  for (int64_t f = 0; f < nvox; ++f) {
    if (coor_2_occ[f] < 0) continue;
    int x = (int)(f / ((int64_t)gy * gz));
    int y = (int)((f / gz) % gy);
    int z = (int)(f % gz);
    for (int dx = -qsx / 2; dx <= (qsx + 1) / 2 - 1; ++dx)
      for (int dy = -qsy / 2; dy <= (qsy + 1) / 2 - 1; ++dy)
        for (int dz = -qsz / 2; dz <= (qsz + 1) / 2 - 1; ++dz) {
          int nx = x + dx, ny = y + dy, nz = z + dz;
          if (nx < 0 || nx >= gx || ny < 0 || ny >= gy || nz < 0 || nz >= gz)
            continue;
          coor_occ[flat_id(nx, ny, nz, gy, gz)] = 1;
        }
  }

  // ---- K-NN scan order: Chebyshev shells, x/y/z-major within a shell
  // (neighbor_offsets in ops/query.py; reference loop nest
  // query_worldcoords.cu:256-263) ----
  const int num_shells = (ksx + 1) / 2;
  std::vector<int> off;   // x, y, z, shell
  for (int layer = 0; layer < num_shells; ++layer)
    for (int x = -layer; x <= layer; ++x)
      for (int y = -layer; y <= layer; ++y)
        for (int z = -layer; z <= layer; ++z) {
          if (std::max(std::abs(x), std::max(std::abs(y), std::abs(z))) !=
              layer)
            continue;
          off.push_back(x);
          off.push_back(y);
          off.push_back(z);
          off.push_back(layer);
        }
  const int V = (int)(off.size() / 4);

  std::memset(sample_mask, 0, (size_t)R * SR);
  std::memset(ray_mask, 0, R);
  std::memset(sample_loc, 0, (size_t)R * SR * 3 * sizeof(float));
  std::fill(sample_pidx, sample_pidx + (size_t)R * SR * K, -1);

  struct Cand {
    float d2;
    int scan;   // v * P + p, the tie-break key
    int32_t pid;
  };
  std::vector<Cand> cands;
  std::vector<int> shell_count(num_shells);

  for (int r = 0; r < R; ++r) {
    bool hit = false;
    int filled = 0;
    bool found_any = false;
    for (int d = 0; d < D && filled < SR; ++d) {
      const float* p = raypos + ((size_t)r * D + d) * 3;
      int c[3];
      bool inb = true;
      for (int a = 0; a < 3; ++a) {
        c[a] = (int)std::floor((p[a] - ranges_min[a]) / scaled_vsize[a]);
        int dim = a == 0 ? gx : (a == 1 ? gy : gz);
        if (c[a] < 0 || c[a] >= dim) inb = false;
      }
      if (!inb || !coor_occ[flat_id(c[0], c[1], c[2], gy, gz)]) continue;
      hit = true;
      const int s = filled++;
      std::memcpy(sample_loc + ((size_t)r * SR + s) * 3, p,
                  3 * sizeof(float));
      sample_mask[(size_t)r * SR + s] = 1;

      // ---- stage 6: layered K-NN at this shading location ----
      cands.clear();
      std::fill(shell_count.begin(), shell_count.end(), 0);
      for (int v = 0; v < V; ++v) {
        int nx = c[0] + off[v * 4], ny = c[1] + off[v * 4 + 1],
            nz = c[2] + off[v * 4 + 2], sh = off[v * 4 + 3];
        if (nx < 0 || nx >= gx || ny < 0 || ny >= gy || nz < 0 || nz >= gz)
          continue;
        int os = coor_2_occ[flat_id(nx, ny, nz, gy, gz)];
        if (os < 0) continue;
        for (int pp = 0; pp < P; ++pp) {
          int32_t pid = occ_pnts[(size_t)os * P + pp];
          if (pid < 0) break;
          float dx = xyz[pid * 3] - p[0];
          float dy = xyz[pid * 3 + 1] - p[1];
          float dz = xyz[pid * 3 + 2] - p[2];
          float d2 = dx * dx + dy * dy + dz * dz;
          if (radius2 > 0 && d2 > radius2) continue;
          cands.push_back({d2, v * P + pp, pid});
          shell_count[sh]++;
        }
      }
      if (layered) {
        // drop candidates in shells whose inner shells already had >= K
        std::vector<int> before(num_shells, 0);
        for (int sh = 1; sh < num_shells; ++sh)
          before[sh] = before[sh - 1] + shell_count[sh - 1];
        cands.erase(
            std::remove_if(cands.begin(), cands.end(),
                           [&](const Cand& cd) {
                             return before[off[(cd.scan / P) * 4 + 3]] >= K;
                           }),
            cands.end());
      }
      std::stable_sort(cands.begin(), cands.end(),
                       [](const Cand& a, const Cand& b) {
                         if (a.d2 != b.d2) return a.d2 < b.d2;
                         return a.scan < b.scan;
                       });
      const int kk = std::min((int)cands.size(), K);
      for (int k = 0; k < kk; ++k)
        sample_pidx[((size_t)r * SR + s) * K + k] = cands[k].pid;
      if (kk > 0) found_any = true;
    }
    ray_mask[r] = (hit && found_any) ? 1 : 0;
  }
  return n_occ;
}

}  // extern "C"
