"""BVH construction: flat, stackless-traversal-friendly arrays.

Host-side preprocessing equivalent of the reference's Rust builder
(src/renderer/triangle.rs:143-259): a binary BVH built by midpoint split of
the node AABB's longest axis on triangle centroids, leaves holding at most
``leaf_size`` triangles, children stored contiguously, and an index
indirection array (``lookup``) partitioned in place.

Two implementations with identical output:
  * a numpy reference (this file), always available;
  * a C++ builder (csrc/bhxcore.cpp via ctypes, see bhx.geometry.native)
    for large meshes — the reference builds lucy (~500k triangles)
    recursively in Rust; our C++ path is the equivalent native component.

Output layout (consumed by bhx.geometry.traverse and Mesh pytrees):
  node_min/node_max : (B, 3) float32 AABB corners
  node_left         : (B,)  int32 — first-child index for inner nodes,
                      first-lookup index for leaves
  node_count        : (B,)  int32 — 0 for inner nodes, #triangles for leaves
  lookup            : (T,)  int32 — triangle indices, leaf-contiguous
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BvhArrays(NamedTuple):
    node_min: np.ndarray
    node_max: np.ndarray
    node_left: np.ndarray
    node_count: np.ndarray
    lookup: np.ndarray

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    def max_depth(self) -> int:
        """Depth of the tree (root = 1) — bounds traversal stack size."""
        depth = np.zeros(self.num_nodes, dtype=np.int64)
        depth[0] = 1
        out = 1
        # Children always have larger indices than parents, so one forward
        # pass suffices.
        for i in range(self.num_nodes):
            if self.node_count[i] == 0:
                c = self.node_left[i]
                depth[c] = depth[c + 1] = depth[i] + 1
                out = max(out, int(depth[i] + 1))
        return out


def build_bvh(
    points: np.ndarray,
    tri_points: np.ndarray,
    leaf_size: int = 2,
    use_native: bool = True,
) -> BvhArrays:
    """Build a BVH over triangles ``tri_points`` (T, 3) indexing ``points``.

    Node bounds are vertex bounds (not centroid bounds), the split point is
    the midpoint of the node AABB's longest axis, and a degenerate partition
    (all centroids on one side) produces a leaf — all matching the
    reference builder (triangle.rs:159-259).
    """
    points = np.asarray(points, dtype=np.float32)
    tri_points = np.asarray(tri_points, dtype=np.int32)
    ntris = tri_points.shape[0]
    if ntris == 0:
        z3 = np.zeros((1, 3), np.float32)
        return BvhArrays(z3, z3, np.zeros(1, np.int32), np.zeros(1, np.int32),
                         np.zeros(0, np.int32))

    if use_native:
        from bhx.geometry import native

        if native.available():
            return native.build_bvh(points, tri_points, leaf_size)

    return _build_bvh_numpy(points, tri_points, leaf_size)


def _build_bvh_numpy(points, tri_points, leaf_size=2) -> BvhArrays:
    ntris = tri_points.shape[0]
    tri_verts = points[tri_points]  # (T, 3, 3)
    tri_min = tri_verts.min(axis=1)  # (T, 3)
    tri_max = tri_verts.max(axis=1)
    centroids = tri_verts.mean(axis=1)  # (T, 3)

    lookup = np.arange(ntris, dtype=np.int32)
    max_nodes = 2 * ntris  # binary tree with >=1 tri per leaf
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_left = np.zeros(max_nodes, np.int32)
    node_count = np.zeros(max_nodes, np.int32)

    node_left[0] = 0
    node_count[0] = ntris
    nodes_used = 1

    # Explicit stack instead of recursion (the reference recurses in Rust
    # under a 1 GiB stack; triangle.rs:196-259 / main.rs:2).
    stack = [0]
    while stack:
        ni = stack.pop()
        start, count = node_left[ni], node_count[ni]
        idx = lookup[start : start + count]
        node_min[ni] = tri_min[idx].min(axis=0)
        node_max[ni] = tri_max[idx].max(axis=0)
        if count <= leaf_size:
            continue
        extent = node_max[ni] - node_min[ni]
        axis = int(np.argmax(extent))
        split = node_min[ni][axis] + extent[axis] * 0.5
        left_mask = centroids[idx, axis] < split
        left_count = int(left_mask.sum())
        if left_count == 0 or left_count == count:
            continue  # degenerate split -> leave as (oversized) leaf
        # Stable partition: left triangles first.  (The reference's in-place
        # swap partition is unstable; ordering within a leaf is irrelevant.)
        lookup[start : start + count] = np.concatenate(
            [idx[left_mask], idx[~left_mask]]
        )
        li = nodes_used
        ri = nodes_used + 1
        nodes_used += 2
        node_left[li] = start
        node_count[li] = left_count
        node_left[ri] = start + left_count
        node_count[ri] = count - left_count
        node_left[ni] = li
        node_count[ni] = 0
        stack.append(ri)
        stack.append(li)

    return BvhArrays(
        node_min=node_min[:nodes_used].copy(),
        node_max=node_max[:nodes_used].copy(),
        node_left=node_left[:nodes_used].copy(),
        node_count=node_count[:nodes_used].copy(),
        lookup=lookup,
    )


def validate_bvh(bvh: BvhArrays, points, tri_points, atol=1e-5) -> None:
    """Assert structural invariants (used by tests, SURVEY.md §4.1):
    every triangle appears exactly once across leaves, parent boxes contain
    child boxes, and leaf boxes contain their triangles."""
    seen = []
    for i in range(bvh.num_nodes):
        if bvh.node_count[i] > 0:
            seen.extend(
                bvh.lookup[bvh.node_left[i] : bvh.node_left[i] + bvh.node_count[i]]
            )
        else:
            c = int(bvh.node_left[i])
            for ch in (c, c + 1):
                assert np.all(bvh.node_min[i] <= bvh.node_min[ch] + atol)
                assert np.all(bvh.node_max[i] >= bvh.node_max[ch] - atol)
    assert sorted(seen) == list(range(tri_points.shape[0]))
    verts = np.asarray(points)[np.asarray(tri_points)]
    tmin, tmax = verts.min(axis=1), verts.max(axis=1)
    for i in range(bvh.num_nodes):
        if bvh.node_count[i] > 0:
            idx = bvh.lookup[bvh.node_left[i] : bvh.node_left[i] + bvh.node_count[i]]
            assert np.all(bvh.node_min[i] <= tmin[idx] + atol)
            assert np.all(bvh.node_max[i] >= tmax[idx] - atol)
