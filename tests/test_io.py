"""I/O round-trip tests: PNG, scene checkpoints."""

import os
import tempfile

import numpy as np

from bhx.io import load_image, load_scene, save_png, save_scene, to_uint8
from tests.common import cube_mesh, small_scene


def test_png_roundtrip():
    img = np.random.default_rng(0).random((16, 24, 3)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.png")
        save_png(p, img)
        back = load_image(p)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_uint8_conversion_rounds():
    assert to_uint8(np.array([[[1.0, 0.0, 0.5]]])).tolist() == [[[255, 0, 128]]]


def test_scene_roundtrip_with_mesh():
    import dataclasses

    scene = small_scene()
    scene = dataclasses.replace(scene, meshes=(cube_mesh(),))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "scene.npz")
        save_scene(p, scene)
        back = load_scene(p)
    np.testing.assert_allclose(
        np.asarray(back.black_hole.mass), np.asarray(scene.black_hole.mass)
    )
    np.testing.assert_allclose(
        np.asarray(back.camera.position), np.asarray(scene.camera.position)
    )
    np.testing.assert_allclose(
        np.asarray(back.disk_texture), np.asarray(scene.disk_texture)
    )
    assert len(back.meshes) == 1
    np.testing.assert_allclose(
        np.asarray(back.meshes[0].points), np.asarray(scene.meshes[0].points)
    )
    np.testing.assert_array_equal(
        np.asarray(back.meshes[0].lookup), np.asarray(scene.meshes[0].lookup)
    )


def test_cli_assets_smoke(capsys):
    from bhx.cli import main

    assert main(["assets"]) == 0
    out = capsys.readouterr().out
    assert "disk" in out
