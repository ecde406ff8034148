"""Wavefront OBJ loading with the reference's import conventions.

Mirrors src/renderer/model.rs:7-87: vertex positions are scaled by 0.5 with
the y axis negated (the reference's flipped-y world), normal indices from
the file are used when present, otherwise flat face normals are synthesized,
and multi-object files are merged into one triangle soup with per-object
index offsets.

The parser itself is numpy-based (fast enough for multi-100k-triangle
files); a C++ parser lives in the same native extension as the BVH builder
for very large assets (bhx.geometry.native).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from bhx.geometry.bvh import build_bvh
from bhx.scene import Mesh


def load_obj(path: str, scale: float = 0.5, flip_y: bool = True):
    """Parse an OBJ file.

    Returns (points (P,3) f32, normals (Nn,3) f32, tri_points (T,3) i32,
    tri_normals (T,3) i32).  Faces with >3 vertices are fan-triangulated.
    """
    from bhx.geometry import native

    if native.available():
        parsed = native.load_obj(path)
        if parsed is not None:
            points, normals, tri_p, tri_n, has_n = parsed
            return _postprocess(
                points, normals, tri_p, tri_n, has_n, scale, flip_y
            )

    points_l, normals_l, faces = [], [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                points_l.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vn "):
                parts = line.split()
                normals_l.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                verts = line.split()[1:]
                refs = []
                for v in verts:
                    comps = v.split("/")
                    pi = int(comps[0])
                    ni = int(comps[2]) if len(comps) >= 3 and comps[2] else 0
                    refs.append((pi, ni))
                for k in range(1, len(refs) - 1):  # fan triangulation
                    faces.append((refs[0], refs[k], refs[k + 1]))

    points = np.asarray(points_l, dtype=np.float32).reshape(-1, 3)
    normals = np.asarray(normals_l, dtype=np.float32).reshape(-1, 3)
    npoints = points.shape[0]
    nnormals = normals.shape[0]

    tri_p = np.empty((len(faces), 3), np.int32)
    tri_n = np.empty((len(faces), 3), np.int32)
    has_n = np.empty(len(faces), bool)
    for t, face in enumerate(faces):
        for c in range(3):
            pi, ni = face[c]
            # OBJ indices are 1-based; negative = relative to end.
            tri_p[t, c] = pi - 1 if pi > 0 else npoints + pi
            tri_n[t, c] = ni - 1 if ni > 0 else (nnormals + ni if ni < 0 else -1)
        has_n[t] = all(face[c][1] != 0 for c in range(3))

    return _postprocess(points, normals, tri_p, tri_n, has_n, scale, flip_y)


def _postprocess(points, normals, tri_p, tri_n, has_n, scale, flip_y):
    """Shared post-parse pass: conventions + missing-normal synthesis.

    Synthesizes flat normals for faces without normal indices
    (reference model.rs:54-67 — note it computes them from the already
    scaled/flipped points; cross-product normals only change sign/scale
    under that transform, so order is immaterial after normalization
    except for the y-flip handedness, which we apply below).
    """
    points_t, normals, tri_p, tri_n = _apply_conventions(
        points, normals, tri_p, tri_n, scale, flip_y
    )
    missing = ~has_n
    if missing.any():
        miss_idx = np.nonzero(missing)[0]
        a = points_t[tri_p[miss_idx, 0]]
        b = points_t[tri_p[miss_idx, 1]]
        c = points_t[tri_p[miss_idx, 2]]
        fn = np.cross(b - a, c - a)
        fn /= np.linalg.norm(fn, axis=-1, keepdims=True) + 1e-20
        base = normals.shape[0]
        normals = np.concatenate([normals, fn.astype(np.float32)], axis=0)
        new_idx = base + np.arange(len(miss_idx), dtype=np.int32)
        tri_n[miss_idx] = new_idx[:, None]
    if normals.shape[0] == 0:
        normals = np.zeros((1, 3), np.float32)
        tri_n = np.zeros_like(tri_p)
    return points_t, normals, tri_p, tri_n


def _apply_conventions(points, normals, tri_p, tri_n, scale, flip_y):
    points = np.asarray(points, np.float32) * scale
    if flip_y:
        points = points * np.asarray([1.0, -1.0, 1.0], np.float32)
    return points, np.asarray(normals, np.float32), tri_p, tri_n


def make_mesh(
    path_or_arrays,
    position=(0.0, 0.0, 0.0),
    name: str = "mesh",
    scale: float = 0.5,
    flip_y: bool = True,
    leaf_size: int = 2,
) -> Mesh:
    """Load an OBJ (or take (points, normals, tri_p, tri_n) arrays), build
    its BVH, and wrap everything as a device-resident Mesh pytree.

    Equivalent of Scene::new's load_model + build_bvh + insert
    (src/scene/mod.rs:23-26) — but arrays are exact-size and uploaded once,
    not 48 MB fixed-capacity re-uploaded per frame (array_buffer.rs:71-79).
    """
    if isinstance(path_or_arrays, (str,)):
        points, normals, tri_p, tri_n = load_obj(path_or_arrays, scale, flip_y)
    else:
        points, normals, tri_p, tri_n = path_or_arrays
        points = np.asarray(points, np.float32)
        normals = np.asarray(normals, np.float32)
        tri_p = np.asarray(tri_p, np.int32)
        tri_n = np.asarray(tri_n, np.int32)

    bvh = build_bvh(points, tri_p, leaf_size=leaf_size)
    return Mesh(
        points=jnp.asarray(points),
        normals=jnp.asarray(normals),
        tri_points=jnp.asarray(tri_p),
        tri_normals=jnp.asarray(tri_n),
        node_min=jnp.asarray(bvh.node_min),
        node_max=jnp.asarray(bvh.node_max),
        node_left=jnp.asarray(bvh.node_left),
        node_count=jnp.asarray(bvh.node_count),
        lookup=jnp.asarray(bvh.lookup),
        position=jnp.asarray(position, jnp.float32),
        visible=jnp.asarray(True),
        name=name,
    )
