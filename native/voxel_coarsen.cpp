// voxel_coarsen: majority-vote coarsening of voxelized grain data.
//
// C++ replacement (C ABI, consumed from Python via ctypes) for the
// reference's Rust/PyO3 `voxel_coarsen` workflow extension
// (workflows/Stage3/pre_main_post_script/voxel_coarsen/src/coarsen/mod.rs):
// rearranges ExaCA y-fastest voxel data into chunk-blocked x-fastest
// order, sorts each chunk, and majority-votes the grain id (ties broken
// pseudo-randomly).
//
// Build: g++ -O2 -shared -fPIC -o libvoxel_coarsen.so voxel_coarsen.cpp

#include <algorithm>
#include <cstdint>
#include <random>
#include <vector>

extern "C" {

// data: ExaCA ordering (y fastest, then x, then z), size bx*by*bz
// out:  coarse grid, x fastest, size (bx/cs)*(by/cs)*(bz/cs)
// returns 0 on success, nonzero on bad sizes
int voxel_coarsen(const int32_t* data, int64_t bx, int64_t by, int64_t bz,
                  int64_t cs, uint64_t seed, int32_t* out) {
  if (cs <= 0 || bx % cs || by % cs || bz % cs) return 1;
  const int64_t n = bx * by * bz;
  const int64_t c3 = cs * cs * cs;

  // rearrange into chunk-blocked layout (coarsen/mod.rs rearrange_data)
  std::vector<int32_t> blocked(n);
  for (int64_t index = 0; index < n; ++index) {
    const int64_t j = index % bx;          // CA: y fastest -> j over bx?
    const int64_t i = (index / bx) % by;   // matches the Rust indexing
    const int64_t k = index / (bx * by);
    const int64_t block = (i / cs) + ((j / cs) * (bx / cs)) +
                          ((k / cs) * ((bx * by) / (cs * cs)));
    const int64_t offset = block * c3 + (i % cs) + (j % cs) * cs +
                           (k % cs) * cs * cs;
    blocked[offset] = data[index];
  }

  // sort each chunk then majority vote with random tie break
  std::mt19937_64 rng(seed);
  const int64_t nchunks = n / c3;
  for (int64_t c = 0; c < nchunks; ++c) {
    int32_t* chunk = blocked.data() + c * c3;
    std::sort(chunk, chunk + c3);
    int32_t prev = INT32_MIN;
    int64_t count = 0, max_count = 0;
    std::vector<int32_t> ties;
    for (int64_t t = 0; t < c3; ++t) {
      const int32_t val = chunk[t];
      count = (val == prev) ? count + 1 : 1;
      prev = val;
      if (count > max_count) {
        max_count = count;
        ties.clear();
        ties.push_back(val);
      } else if (count == max_count) {
        ties.push_back(val);
      }
    }
    std::uniform_int_distribution<size_t> pick(0, ties.size() - 1);
    out[c] = ties[pick(rng)];
  }
  return 0;
}

}  // extern "C"
