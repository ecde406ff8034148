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
# Perlin noise (vectorized hash-gradient, quintic fade)
# ---------------------------------------------------------------------------


def _hash_gradient(ix: np.ndarray, iy: np.ndarray):
    """Deterministic lattice gradients from a 2x32-bit integer mix.

    Same *style* as the reference's rotate-multiply hash
    (perlin/src/main.rs:6-27) but an independent constant set; output is a
    unit 2-vector per lattice point.
    """
    a = ix.astype(np.uint32)
    b = iy.astype(np.uint32)
    a = a * np.uint32(0x9E3779B1)
    b ^= (a << np.uint32(16)) | (a >> np.uint32(16))
    b = b * np.uint32(0x85EBCA77)
    a ^= (b << np.uint32(16)) | (b >> np.uint32(16))
    a = a * np.uint32(0xC2B2AE3D)
    angle = a.astype(np.float64) * (2.0 * np.pi / 4294967296.0)
    return np.cos(angle), np.sin(angle)


def _fade(t):
    return ((t * 6.0 - 15.0) * t + 10.0) * t * t * t


def perlin(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Perlin noise in [0, 1] at coordinates (x, y) (vectorized)."""
    x0 = np.floor(x)
    y0 = np.floor(y)
    sx = x - x0
    sy = y - y0
    x0i = x0.astype(np.int64)
    y0i = y0.astype(np.int64)

    def grad_dot(ix, iy):
        gx, gy = _hash_gradient(ix, iy)
        return (x - ix) * gx + (y - iy) * gy

    n00 = grad_dot(x0i, y0i)
    n10 = grad_dot(x0i + 1, y0i)
    n01 = grad_dot(x0i, y0i + 1)
    n11 = grad_dot(x0i + 1, y0i + 1)
    u = _fade(sx)
    v = _fade(sy)
    nx0 = n00 + (n10 - n00) * u
    nx1 = n01 + (n11 - n01) * u
    val = nx0 + (nx1 - nx0) * v
    return val * 0.5 + 0.5


def _spiral_warp(img: np.ndarray, amount: float = 2.0, power: float = 0.5):
    """Polar spiral warp theta += r^power * pi * amount
    (reference perlin/src/main.rs:78-107)."""
    h, w = img.shape[:2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rx = (xs / w) * 2.0 - 1.0
    ry = (ys / h) * 2.0 - 1.0
    r = np.sqrt(rx * rx + ry * ry)
    theta = np.arctan2(ry, rx)
    theta = np.mod(theta + np.pi + (r ** power) * np.pi * amount, 2.0 * np.pi) - np.pi
    sx = ((r * np.cos(theta) * 0.5 + 0.5) * w).astype(np.int64) % w
    sy = ((r * np.sin(theta) * 0.5 + 0.5) * h).astype(np.int64) % h
    return img[sy, sx]


def disk_texture(size: int = 512) -> np.ndarray:
    """Accretion disk RGBA texture in [0,1], shape (size, size, 4).

    Pipeline mirrors perlin/src/main.rs:133-148: octaves at densities
    4/20/50/100 (relative to a 1000px canvas), each spiral-warped
    (amount=2, power=0.5), merged 50/50 cascade from fine to coarse.
    """

    def gen():
        ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        octaves = []
        for density in (4, 20, 50, 100):
            d = density / size
            layer = perlin(xs * d, ys * d)
            octaves.append(_spiral_warp(layer, 2.0, 0.5))
        m = octaves[3]
        m = 0.5 * m + 0.5 * octaves[2]
        m = 0.5 * m + 0.5 * octaves[1]
        m = 0.5 * m + 0.5 * octaves[0]
        rgba = np.repeat(m[..., None], 4, axis=-1)
        return rgba.astype(np.float32)

    return _cached(f"disk_{size}", gen)


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

    Values are pre-compensated for the renderer's ``sky^4`` transfer
    (sky.wgsl:25): a pixel stored at s renders as s^4, so stars are stored
    at brightness^(1/4) to survive the curve.
    """

    def gen():
        rng = np.random.default_rng(seed)
        img = np.zeros((height, width, 3), np.float32)

        # Nebula: low-frequency perlin tinted blue/purple.
        ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        neb = (
            perlin(xs * (6.0 / width), ys * (3.0 / height)) * 0.6
            + perlin(xs * (24.0 / width) + 91.0, ys * (12.0 / height) + 17.0) * 0.4
        )
        neb = np.clip(neb - 0.35, 0.0, None) * 0.9
        img += neb[..., None] * np.array([0.45, 0.35, 0.65], np.float32)

        # Stars: uniform directions (area-correct in equirect), blackbody
        # colors, power-law brightness, splatted with a tiny Gaussian.
        u = rng.random(num_stars)
        v = rng.random(num_stars)
        px = (u * width).astype(np.int64)
        # Uniform on the sphere: v = (cos(theta)+1)/2 -> row weight sin(theta)
        py = ((np.arccos(2 * v - 1) / np.pi) * height).astype(np.int64) % height
        brightness = (rng.random(num_stars) ** 8.0) * 1.4 + 0.05
        temps = rng.uniform(3000.0, 12000.0, num_stars)
        colors = planck_rgb(temps).astype(np.float32)

        offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        for dy, dx in offsets:
            w_k = np.exp(-0.5 * (dx * dx + dy * dy) / 0.45)
            rows = (py + dy) % height
            cols = (px + dx) % width
            np.add.at(img, (rows, cols), (brightness * w_k)[:, None] * colors)

        # Compensate the ^4 transfer and clamp.
        img = np.clip(img, 0.0, 4.0) ** 0.25
        return np.clip(img, 0.0, 1.0).astype(np.float32)

    return _cached(f"sky_{width}x{height}_{num_stars}_{seed}", gen)


def clear_cache() -> None:
    import shutil

    if os.path.isdir(_CACHE_DIR):
        shutil.rmtree(_CACHE_DIR)
