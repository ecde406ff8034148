"""BVH build + traversal tests (SURVEY.md §4.1): structural invariants,
native/numpy builder equivalence, and traversal vs brute force."""

import numpy as np
import pytest

from bhx.geometry.bvh import BvhArrays, _build_bvh_numpy, build_bvh, validate_bvh
from bhx.geometry import native


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    offsets = rng.uniform(-0.5, 0.5, (n, 2, 3)).astype(np.float32)
    points = np.concatenate(
        [centers, centers + offsets[:, 0], centers + offsets[:, 1]], axis=0
    ).astype(np.float32)
    tris = np.stack(
        [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], axis=1
    ).astype(np.int32)
    return points, tris


def test_bvh_invariants_small():
    points, tris = _random_tris(50)
    bvh = _build_bvh_numpy(points, tris)
    validate_bvh(bvh, points, tris)


def test_bvh_invariants_larger():
    points, tris = _random_tris(2000, seed=3)
    bvh = _build_bvh_numpy(points, tris)
    validate_bvh(bvh, points, tris)
    assert bvh.max_depth() < 48  # traversal stack headroom


def test_bvh_single_triangle():
    points = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    bvh = _build_bvh_numpy(points, tris)
    assert bvh.num_nodes == 1
    assert bvh.node_count[0] == 1


def test_native_matches_numpy():
    if not native.available():
        pytest.skip("native bhxcore not built (g++ unavailable?)")
    points, tris = _random_tris(777, seed=11)
    a = _build_bvh_numpy(points, tris)
    b = native.build_bvh(points, tris, 2)
    np.testing.assert_array_equal(a.node_left, b.node_left)
    np.testing.assert_array_equal(a.node_count, b.node_count)
    np.testing.assert_array_equal(a.lookup, b.lookup)
    np.testing.assert_allclose(a.node_min, b.node_min, atol=1e-6)
    np.testing.assert_allclose(a.node_max, b.node_max, atol=1e-6)


def test_bvh_traversal_matches_brute_force():
    """BVH traversal and brute force agree on hit distances for random rays."""
    import jax.numpy as jnp

    from bhx.geometry.traverse import _intersect_brute, _intersect_bvh
    from bhx.geometry.obj import make_mesh

    points, tris = _random_tris(600, seed=5)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (len(points), 1))
    tri_n = tris.copy()
    mesh = make_mesh((points, normals, tris, tri_n), position=(0, 0, 0))

    rng = np.random.default_rng(9)
    n_rays = 64
    o = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(-5, 5, (n_rays, 3)), jnp.float32)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t_lim = jnp.full((n_rays,), 1e8)
    brute = _intersect_brute(o, d, mesh, t_lim)
    bvh = _intersect_bvh(o, d, mesh, t_lim, stack_depth=48)

    np.testing.assert_array_equal(np.asarray(brute["hit"]), np.asarray(bvh["hit"]))
    hits = np.asarray(brute["hit"])
    np.testing.assert_allclose(
        np.asarray(brute["t"])[hits], np.asarray(bvh["t"])[hits], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(brute["color"])[hits], np.asarray(bvh["color"])[hits], atol=1e-4
    )


def test_native_obj_parser_matches_numpy(tmp_path):
    """The C++ OBJ parser (csrc/bhxcore.cpp bhx_obj_parse, reference
    model.rs:7-87) and the numpy parser produce identical meshes across
    every vertex-reference form, fan triangulation, and negative indices."""
    if not native.available():
        pytest.skip("native bhxcore not built (g++ unavailable?)")
    from bhx.geometry import obj as objmod

    src = "\n".join(
        [
            "# comment line",
            "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0", "v 0.5 0.5 1",
            "vn 0 0 1", "vn 0 0 -1", "vn 1 0 0",
            "f 1 2 3",                      # plain, normal synthesized
            "f 1/1/1 2/2/1 3/3/2 4/4/2",    # p/t/n quad -> fan
            "f -5//-3 -4//-1 -3//-2",       # p//n, negative indices
            "f 1/2 2/3 5/1",                # p/t (no normal)
            "",
        ]
    )
    path = tmp_path / "parse.obj"
    path.write_text(src)

    raw = native.load_obj(str(path))
    assert raw is not None
    full_native = objmod.load_obj(str(path))

    # Force the numpy fallback and reparse.
    saved = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        full_numpy = objmod.load_obj(str(path))
    finally:
        native._lib, native._tried = saved

    names = ["points", "normals", "tri_p", "tri_n"]
    for a, b, name in zip(full_native, full_numpy, names):
        assert a.shape == b.shape, name
        np.testing.assert_array_equal(a, b, err_msg=name)
