"""Procedural assets: accretion-disk texture, star sky, blackbody LUT.

The reference ships pre-baked images (src/renderer/textures/: disk.png from
the perlin/ cargo tool, colourtemp.jpg, sky.png — the latter stripped from
the mount), so all assets here are regenerated procedurally and
deterministically:

* disk_texture(): the reference perlin tool's algorithm re-implemented in
  numpy (hash-gradient Perlin -> polar spiral warp -> 4-octave 50/50 merge
  cascade; perlin/src/main.rs:6-148) with our own integer hash.
* blackbody_lut(): the colour-temperature LUT computed analytically
  (Planck spectrum x CIE observer -> sRGB) instead of a baked JPG.
* sky_texture(): a deterministic star field + nebula equirect map
  (values are compensated for the renderer's ^4 sky transfer,
  sky.wgsl:25).

Generated arrays are cached as .npz next to this file.
"""

from __future__ import annotations

import os

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_cache")


def _cached(name: str, fn):
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(_CACHE_DIR, name + ".npz")
    if os.path.exists(path):
        try:
            return np.load(path)["data"]
        except Exception:
            pass
    data = fn()
    np.savez_compressed(path, data=data)
    return data


# ---------------------------------------------------------------------------
# Perlin noise — shared sampler (bhx.procedural, evaluated with xp=numpy)
# ---------------------------------------------------------------------------


def perlin(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Perlin noise in [0, 1] (the same hash-gradient sampler the renderer
    evaluates per-sample in procedural mode)."""
    from bhx import procedural

    return procedural.perlin(np.asarray(x, np.float32), np.asarray(y, np.float32), xp=np)


def disk_texture(size: int = 512) -> np.ndarray:
    """Accretion disk RGBA texture in [0,1], shape (size, size, 4).

    Baked by evaluating bhx.procedural.disk_sample at texel centers, so
    texture_mode="array" agrees with the gather-free "procedural" path up
    to bilinear resampling.  (Pipeline provenance: perlin tool
    perlin/src/main.rs:133-148 — 4 spiral-warped octaves, 50/50 cascade.)
    """

    def gen():
        from bhx import procedural

        c = (np.arange(size, dtype=np.float32) + 0.5) / size
        u, v = np.meshgrid(c, c, indexing="xy")
        return procedural.disk_sample(u, v, xp=np).astype(np.float32)

    return _cached(f"disk_v2_{size}", gen)


# ---------------------------------------------------------------------------
# Blackbody LUT (analytic Planck -> CIE -> sRGB)
# ---------------------------------------------------------------------------

# Wyman/Sloan/Shirley multi-lobe Gaussian fits of the CIE 1931 observer.
def _cie_xyz_bar(lam_nm: np.ndarray):
    def g(x, mu, s1, s2):
        s = np.where(x < mu, s1, s2)
        return np.exp(-0.5 * ((x - mu) / s) ** 2)

    x = (
        1.056 * g(lam_nm, 599.8, 37.9, 31.0)
        + 0.362 * g(lam_nm, 442.0, 16.0, 26.7)
        - 0.065 * g(lam_nm, 501.1, 20.4, 26.2)
    )
    y = 0.821 * g(lam_nm, 568.8, 46.9, 40.5) + 0.286 * g(lam_nm, 530.9, 16.3, 31.1)
    z = 1.217 * g(lam_nm, 437.0, 11.8, 36.0) + 0.681 * g(lam_nm, 459.0, 26.0, 13.8)
    return x, y, z


def planck_rgb(temps: np.ndarray) -> np.ndarray:
    """Linear-sRGB chromaticity (max-normalized) of a blackbody at ``temps`` K."""
    lam = np.linspace(380.0, 780.0, 81)  # nm
    lam_m = lam * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    t = np.asarray(temps, np.float64)[..., None]
    # Spectral radiance (arbitrary scale).
    expo = np.clip(h * c / (lam_m * kb * np.maximum(t, 1.0)), 1e-6, 700.0)
    rad = 1.0 / (lam_m ** 5 * np.expm1(expo))
    xb, yb, zb = _cie_xyz_bar(lam)
    X = np.trapezoid(rad * xb, lam, axis=-1)
    Y = np.trapezoid(rad * yb, lam, axis=-1)
    Z = np.trapezoid(rad * zb, lam, axis=-1)
    xyz = np.stack([X, Y, Z], axis=-1)
    xyz /= np.maximum(xyz.sum(axis=-1, keepdims=True), 1e-12)
    m = np.array(
        [
            [3.2406, -1.5372, -0.4986],
            [-0.9689, 1.8758, 0.0415],
            [0.0557, -0.2040, 1.0570],
        ]
    )
    rgb = xyz @ m.T
    rgb = np.clip(rgb, 0.0, None)
    rgb /= np.maximum(rgb.max(axis=-1, keepdims=True), 1e-12)
    return rgb


def blackbody_lut(width: int = 256, height: int = 64) -> np.ndarray:
    """Colour-temperature LUT, shape (height, width, 3).

    x in [0,1] is the total red/blue shift factor (1 = unshifted); y picks
    the emitter temperature T in [1e4, 1e5] K with y=0 -> T_max (matching
    the reference's ``y = 1 - (T - Tmin)/(Tmax - Tmin)`` addressing,
    ray.wgsl:644-647).  The observed spectrum of a shifted blackbody is a
    blackbody at T * shift, dimmed by shift^4; we bake the chromaticity at
    T*shift and fold the dimming in linearly so the tint darkens toward
    shift -> 0 as the baked reference image does.
    """

    def gen():
        xs = (np.arange(width) + 0.5) / width
        ys = (np.arange(height) + 0.5) / height
        temp = 1e5 - ys * (1e5 - 1e4)  # y=0 -> Tmax
        t_eff = temp[:, None] * np.maximum(xs[None, :], 1e-3)
        rgb = planck_rgb(t_eff.reshape(-1)).reshape(height, width, 3)
        dim = np.clip(xs[None, :, None] ** 0.5, 0.0, 1.0)
        return (rgb * dim).astype(np.float32)

    return _cached(f"blackbody_{width}x{height}", gen)


# ---------------------------------------------------------------------------
# Star sky
# ---------------------------------------------------------------------------


def sky_texture(width: int = 2048, height: int = 1024, num_stars: int = 6000,
                seed: int = 7) -> np.ndarray:
    """Equirect star-field + nebula texture, shape (height, width, 3).

    Baked from bhx.procedural.sky_radiance (cell-hash star grid + perlin
    nebula) at texel centers; values store radiance^(1/4) because the
    renderer applies the reference's ``sky^4`` transfer (sky.wgsl:25).
    ``num_stars``/``seed`` are legacy knobs kept for cache-key stability of
    small test textures; the star layout is fully determined by the grid
    hash.
    """

    def gen():
        from bhx import procedural

        us = (np.arange(width, dtype=np.float32) + 0.5) / width
        vs = (np.arange(height, dtype=np.float32) + 0.5) / height
        u, v = np.meshgrid(us, vs, indexing="xy")
        rad = procedural.sky_radiance(u, v, xp=np)
        img = np.clip(rad, 0.0, 4.0) ** 0.25
        return np.clip(img, 0.0, 1.0).astype(np.float32)

    return _cached(f"sky_v2_{width}x{height}", gen)


def clear_cache() -> None:
    import shutil

    if os.path.isdir(_CACHE_DIR):
        shutil.rmtree(_CACHE_DIR)
