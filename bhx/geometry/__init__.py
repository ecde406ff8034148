"""Geometry: analytic intersections, OBJ loading, BVH build & traversal."""

from bhx.geometry.intersect import (
    hit_sphere,
    hit_sphere_both,
    hit_annulus,
    hit_aabb,
    hit_triangles,
    MISS_T,
)
from bhx.geometry.bvh import build_bvh, BvhArrays
from bhx.geometry.obj import load_obj, make_mesh

__all__ = [
    "hit_sphere",
    "hit_sphere_both",
    "hit_annulus",
    "hit_aabb",
    "hit_triangles",
    "MISS_T",
    "build_bvh",
    "BvhArrays",
    "load_obj",
    "make_mesh",
]
