// bhxcore — native geometry preprocessing for the bhx TPU renderer.
//
// Implements the same BVH construction the reference performs in Rust
// (reference: src/renderer/triangle.rs:143-259): binary tree, midpoint split
// of the node AABB's longest axis on triangle centroids, vertex-bound node
// AABBs, leaves of at most `leaf_size` triangles, children contiguous, and a
// stable index-indirection array partitioned per node.  Output layout matches
// bhx.geometry.bvh.BvhArrays exactly (the numpy fallback is the executable
// specification; tests assert bit-identical results).
//
// Exposed via a minimal C ABI consumed with ctypes (no pybind11 available).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <stack>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float get(const Vec3& v, int axis) {
  return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
}

}  // namespace

extern "C" {

// Returns the number of nodes written.  Output buffers must hold at least
// 2*T nodes / T lookup entries.
int64_t bhx_build_bvh(const float* points, int64_t npoints,
                      const int32_t* tris, int64_t ntris, int32_t leaf_size,
                      float* out_node_min, float* out_node_max,
                      int32_t* out_node_left, int32_t* out_node_count,
                      int32_t* out_lookup) {
  (void)npoints;
  if (ntris == 0) {
    out_node_min[0] = out_node_min[1] = out_node_min[2] = 0.f;
    out_node_max[0] = out_node_max[1] = out_node_max[2] = 0.f;
    out_node_left[0] = 0;
    out_node_count[0] = 0;
    return 1;
  }

  // Precompute per-triangle bounds and centroids.
  std::vector<Vec3> tmin(ntris), tmax(ntris), cent(ntris);
  for (int64_t t = 0; t < ntris; ++t) {
    Vec3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
    Vec3 c = {0.f, 0.f, 0.f};
    for (int k = 0; k < 3; ++k) {
      const float* p = points + 3 * static_cast<int64_t>(tris[3 * t + k]);
      Vec3 v = {p[0], p[1], p[2]};
      lo = vmin(lo, v);
      hi = vmax(hi, v);
      c.x += v.x;
      c.y += v.y;
      c.z += v.z;
    }
    tmin[t] = lo;
    tmax[t] = hi;
    cent[t] = {c.x / 3.f, c.y / 3.f, c.z / 3.f};
  }

  for (int64_t t = 0; t < ntris; ++t) out_lookup[t] = static_cast<int32_t>(t);

  out_node_left[0] = 0;
  out_node_count[0] = static_cast<int32_t>(ntris);
  int64_t nodes_used = 1;

  std::vector<int32_t> scratch(ntris);
  std::stack<int64_t> stack;
  stack.push(0);
  while (!stack.empty()) {
    const int64_t ni = stack.top();
    stack.pop();
    const int32_t start = out_node_left[ni];
    const int32_t count = out_node_count[ni];

    Vec3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = 0; i < count; ++i) {
      const int32_t t = out_lookup[start + i];
      lo = vmin(lo, tmin[t]);
      hi = vmax(hi, tmax[t]);
    }
    out_node_min[3 * ni + 0] = lo.x;
    out_node_min[3 * ni + 1] = lo.y;
    out_node_min[3 * ni + 2] = lo.z;
    out_node_max[3 * ni + 0] = hi.x;
    out_node_max[3 * ni + 1] = hi.y;
    out_node_max[3 * ni + 2] = hi.z;

    if (count <= leaf_size) continue;

    const Vec3 extent = {hi.x - lo.x, hi.y - lo.y, hi.z - lo.z};
    int axis = 0;
    if (extent.y > get(extent, axis)) axis = 1;
    if (extent.z > get(extent, axis)) axis = 2;
    const float split = get(lo, axis) + get(extent, axis) * 0.5f;

    // Stable partition (matches the numpy implementation: order of left and
    // right groups preserved).
    int32_t nleft = 0, nright = 0;
    for (int32_t i = 0; i < count; ++i) {
      const int32_t t = out_lookup[start + i];
      if (get(cent[t], axis) < split)
        out_lookup[start + nleft++] = t;  // safe: nleft <= i
      else
        scratch[nright++] = t;
    }
    if (nleft == 0 || nleft == count) continue;  // degenerate -> leaf
    std::memcpy(out_lookup + start + nleft, scratch.data(),
                sizeof(int32_t) * nright);

    const int64_t li = nodes_used;
    const int64_t ri = nodes_used + 1;
    nodes_used += 2;
    out_node_left[li] = start;
    out_node_count[li] = nleft;
    out_node_left[ri] = start + nleft;
    out_node_count[ri] = count - nleft;
    out_node_left[ni] = static_cast<int32_t>(li);
    out_node_count[ni] = 0;
    stack.push(ri);
    stack.push(li);
  }

  return nodes_used;
}

}  // extern "C"
