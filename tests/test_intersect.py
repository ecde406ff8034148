"""Analytic intersection tests vs closed forms (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bhx.geometry.intersect import (
    MISS_T,
    hit_aabb,
    hit_annulus,
    hit_sphere,
    hit_sphere_both,
    hit_triangles,
)


def test_sphere_head_on():
    o = jnp.array([[0.0, 0.0, -10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit = hit_sphere(o, d, jnp.zeros(3), 2.0)
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(8.0, abs=1e-4)


def test_sphere_miss():
    o = jnp.array([[0.0, 5.0, -10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit = hit_sphere(o, d, jnp.zeros(3), 2.0)
    assert not bool(hit[0])
    assert float(t[0]) == MISS_T


def test_sphere_from_inside_hits_far_root():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit = hit_sphere(o, d, jnp.zeros(3), 3.0)
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(3.0, abs=1e-4)


def test_sphere_behind_is_miss():
    o = jnp.array([[0.0, 0.0, 10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit = hit_sphere(o, d, jnp.zeros(3), 2.0)
    assert not bool(hit[0])


def test_sphere_both_roots():
    o = jnp.array([[0.0, 0.0, -10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t1, t2, real = hit_sphere_both(o, d, jnp.zeros(3), 2.0)
    assert bool(real[0])
    assert float(t1[0]) == pytest.approx(8.0, abs=1e-4)
    assert float(t2[0]) == pytest.approx(12.0, abs=1e-4)


def test_annulus_hit_and_radial_window():
    o = jnp.array([[0.0, 5.0, 0.0], [0.0, 5.0, 0.0], [0.0, 5.0, 0.0]])
    # Straight down onto the y=0 plane at r = 3 (hit), r = 0.5 (inside inner
    # -> miss), r = 11 (outside outer -> miss).
    d = jnp.stack(
        [
            jnp.array([3.0, -5.0, 0.0]) / jnp.linalg.norm(jnp.array([3.0, -5.0, 0.0])),
            jnp.array([0.5, -5.0, 0.0]) / jnp.linalg.norm(jnp.array([0.5, -5.0, 0.0])),
            jnp.array([11.0, -5.0, 0.0]) / jnp.linalg.norm(jnp.array([11.0, -5.0, 0.0])),
        ]
    )
    normal = jnp.array([0.0, 1.0, 0.0])
    t, hit, point, facing = hit_annulus(o, d, jnp.zeros(3), normal, 2.0, 10.0)
    assert list(np.asarray(hit)) == [True, False, False]
    np.testing.assert_allclose(np.asarray(point[0]), [3.0, 0.0, 0.0], atol=1e-4)
    # Reference convention (ray.wgsl:682-686): denom < 0 -> normal flipped to
    # -normal, i.e. the returned normal points *along* the ray.
    np.testing.assert_allclose(np.asarray(facing[0]), [0.0, -1.0, 0.0], atol=1e-6)


def test_aabb_entry_distance():
    o = jnp.array([[0.0, 0.0, -5.0]])
    inv_d = 1.0 / jnp.array([[1e-12, 1e-12, 1.0]])
    t = hit_aabb(o, inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    assert float(t[0]) == pytest.approx(4.0, abs=1e-3)


def test_aabb_miss_and_behind():
    o = jnp.array([[5.0, 0.0, -5.0], [0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t = hit_aabb(o, inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    assert float(t[0]) == MISS_T  # sideways miss
    assert float(t[1]) == MISS_T  # box behind origin


def test_triangle_hit_barycentrics_and_color():
    p1 = jnp.array([[-1.0, -1.0, 0.0]])
    p2 = jnp.array([[1.0, -1.0, 0.0]])
    p3 = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 0.0, -1.0]])
    o = jnp.array([[0.0, -0.2, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit, color, geom_n = hit_triangles(o, d, p1, p2, p3, n, n, n)
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(5.0, abs=1e-4)
    # color = -n_smooth * 0.5 + 0.5 with n_smooth = (0,0,-1) -> (0.5, 0.5, 1)
    np.testing.assert_allclose(np.asarray(color[0]), [0.5, 0.5, 1.0], atol=1e-5)
    # geometric normal flipped toward the ray (ray goes +z -> normal -z)
    assert float(geom_n[0, 2]) < 0.0


def test_triangle_miss_outside():
    p1 = jnp.array([[-1.0, -1.0, 0.0]])
    p2 = jnp.array([[1.0, -1.0, 0.0]])
    p3 = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 0.0, -1.0]])
    o = jnp.array([[2.0, 2.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit, _, _ = hit_triangles(o, d, p1, p2, p3, n, n, n)
    assert not bool(hit[0])


def test_triangle_parallel_ray_misses():
    p1 = jnp.array([[-1.0, -1.0, 0.0]])
    p2 = jnp.array([[1.0, -1.0, 0.0]])
    p3 = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 0.0, -1.0]])
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])  # parallel to the triangle plane
    t, hit, _, _ = hit_triangles(o, d, p1, p2, p3, n, n, n)
    assert not bool(hit[0])
