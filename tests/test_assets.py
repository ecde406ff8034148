"""Procedural asset tests: determinism, shapes, physical sanity."""

import numpy as np

from bhx import assets


def test_perlin_deterministic_and_bounded():
    xs, ys = np.meshgrid(np.linspace(0, 7, 64), np.linspace(0, 7, 64))
    a = assets.perlin(xs, ys)
    b = assets.perlin(xs, ys)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.std() > 0.05  # actually varies


def test_disk_texture_shape_and_determinism():
    a = assets.disk_texture(64)
    b = assets.disk_texture(64)
    assert a.shape == (64, 64, 4)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_blackbody_lut_physical_ordering():
    lut = assets.blackbody_lut(64, 16)
    assert lut.shape == (16, 64, 3)
    # At full shift (x=1): hot blackbody -> bluish white: b >= r.
    hot = lut[0, -1]
    assert hot[2] >= hot[0] - 0.05
    # Strongly redshifted (bottom row y=1 -> T=1e4; x=4/64 -> ~700 K):
    # dim and red-dominant.
    cold = lut[-1, 4]
    hot_row = lut[-1, -1]
    assert cold[0] >= cold[2]
    assert cold.sum() < hot_row.sum()


def test_sky_texture_stars_present():
    sky = assets.sky_texture(128, 64, num_stars=200)
    assert sky.shape == (64, 128, 3)
    assert sky.max() <= 1.0 and sky.min() >= 0.0
    # The texture is stored ^(1/4)-compensated; the *rendered* sky is
    # sky^4 (sky.wgsl:25).  After the transfer, only a small fraction of
    # pixels (stars) stays bright.
    rendered = sky ** 4
    bright = (rendered.max(-1) > 0.5).mean()
    assert 0.0005 < bright < 0.1
    assert rendered.mean() < 0.2
