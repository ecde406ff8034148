"""Post-chain unit tests on synthetic images (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bhx.config import BloomConfig, FxaaConfig
from bhx.post import bloom_chain, bloom_downsample, bloom_upsample, fxaa_pass, mix_pass
from bhx.shading import aces_tonemap, sample_bilinear


def test_bilinear_sample_exact_at_texel_centers():
    tex = jnp.arange(12.0).reshape(3, 4, 1)
    u = (jnp.arange(4) + 0.5) / 4.0
    v = jnp.full((4,), (1 + 0.5) / 3.0)
    out = sample_bilinear(tex, u, v)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [4.0, 5.0, 6.0, 7.0], atol=1e-5)


def test_bilinear_sample_interpolates():
    tex = jnp.array([[[0.0], [1.0]]])  # 1x2
    out = sample_bilinear(tex, jnp.array([0.5]), jnp.array([0.5]))
    assert float(out[0, 0]) == pytest.approx(0.5, abs=1e-6)


def test_aces_maps_zero_to_zero_and_saturates():
    out = aces_tonemap(jnp.zeros((2, 2, 3)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)
    big = aces_tonemap(jnp.full((1, 1, 3), 100.0))
    assert np.all(np.asarray(big) > 0.95) and np.all(np.asarray(big) <= 1.0)


def test_aces_monotone_midtones():
    lo = float(aces_tonemap(jnp.full((1, 1, 3), 0.2))[0, 0, 0])
    hi = float(aces_tonemap(jnp.full((1, 1, 3), 0.8))[0, 0, 0])
    assert 0.0 < lo < hi < 1.0


def test_bloom_downsample_preserves_flat_field():
    img = jnp.full((3, 32, 64), 0.7)  # channel-major (C, H, W)
    out = bloom_downsample(img, (32, 16))
    assert out.shape == (3, 16, 32)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)


def test_bloom_upsample_preserves_flat_field():
    img = jnp.full((3, 16, 32), 0.4)  # channel-major (C, H, W)
    out = bloom_upsample(img, (64, 32))
    assert out.shape == (3, 32, 64)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-5)


def test_bloom_spreads_bright_point():
    img = jnp.zeros((64, 64, 3)).at[32, 32].set(10.0)
    out = bloom_chain(img, BloomConfig())
    a = np.asarray(out)
    assert a[32, 32, 0] > 0  # energy at center
    assert a[40, 40, 0] > 1e-5  # spread into the neighborhood
    assert a.max() < 10.0  # smeared down


def test_bloom_tiny_image_does_not_crash():
    img = jnp.full((8, 8, 3), 0.5)
    out = bloom_chain(img, BloomConfig())
    assert out.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_mix_pass_ratio():
    a = jnp.ones((4, 4, 3))
    b = jnp.zeros((4, 4, 3))
    out = mix_pass(a, b, 0.7)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_fxaa_flat_image_unchanged():
    img = jnp.full((24, 24, 3), 0.5)
    out = fxaa_pass(img, FxaaConfig())
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_fxaa_softens_hard_edge():
    img = jnp.zeros((32, 32, 3)).at[:, 16:].set(1.0)
    out = np.asarray(fxaa_pass(img, FxaaConfig()))
    col = out[16, :, 0]
    # Some intermediate values appear near the edge.
    assert ((col > 0.05) & (col < 0.95)).any()
    assert np.isfinite(out).all()


def test_fxaa_backward_finite_with_black_region():
    """Regression for the 1080p GRAD_CONFIG4 NaN: exact-black pixels (the
    shadow interior) hit sqrt'(0) = inf inside the luma, and the inf * 0
    of the no-edge mask NaN-poisoned the whole backward image.  The blend
    weight is now frozen under differentiation (filter decisions don't
    differentiate) and the luma sqrt is epsilon-guarded; gradients must be
    finite, bounded like a 2-tap resample, and flow through the colors."""
    import jax

    rng = np.random.default_rng(0)
    img = rng.random((16, 24, 3)).astype(np.float32)
    img[4:10, 5:15] = 0.0  # exact black block with hard edges
    img = jnp.asarray(img)

    g = jax.grad(lambda x: jnp.mean(fxaa_pass(x, FxaaConfig())))(img)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # out = (1-t)*c + t*neighbor with t frozen in [0, 1): each input pixel
    # feeds at most itself + 4 neighbors, so |dmean/dpixel| <= 5/N.
    assert np.abs(g).max() <= 5.0 / (16 * 24 * 3) + 1e-6
    assert np.abs(g).sum() > 0.0
