"""Post-processing chain: bloom pyramid, mix, ACES tonemap, FXAA.

jnp re-implementations of the reference's raster post passes — the texture
DAG (renderer/mod.rs:219-321) collapses into function composition inside one
jitted graph, and every "textureSample" becomes a vectorized bilinear
gather.  Tap positions/weights match the WGSL shaders exactly:
bloom_down.wgsl (CoD 13-tap), bloom_up.wgsl (9-tap tent at fixed 0.005 uv
radius), mix.wgsl, hdr.wgsl (ACES), fxaa.wgsl (FXAA 3.11 quality).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from bhx.config import BloomConfig, FxaaConfig
from bhx.shading import aces_tonemap, sample_bilinear


def _sample_uv(img, u, v):
    """Clamp-addressed bilinear sample of (H, W, C) at uv arrays."""
    return sample_bilinear(img, u, v, wrap=False)


def _uv_grid(width: int, height: int):
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return uu, vv


def bloom_downsample(img, out_wh: Tuple[int, int]):
    """13-tap downsample (bloom_down.wgsl:40-59) to (out_w, out_h)."""
    out_w, out_h = out_wh
    src_h, src_w = img.shape[0], img.shape[1]
    x = 1.0 / src_w
    y = 1.0 / src_h
    uu, vv = _uv_grid(out_w, out_h)

    def s(du, dv):
        return _sample_uv(img, uu + du, vv + dv)

    a = s(-2 * x, +2 * y); b = s(0.0, +2 * y); c = s(+2 * x, +2 * y)
    d = s(-2 * x, 0.0);    e = s(0.0, 0.0);    f = s(+2 * x, 0.0)
    g = s(-2 * x, -2 * y); h = s(0.0, -2 * y); i = s(+2 * x, -2 * y)
    j = s(-x, +y); k = s(+x, +y); l = s(-x, -y); m = s(+x, -y)

    out = e * 0.125
    out += (a + c + g + i) * 0.03125
    out += (b + d + f + h) * 0.0625
    out += (j + k + l + m) * 0.125
    return out


def bloom_upsample(img, out_wh: Tuple[int, int], radius_uv: float = 0.005):
    """9-tap tent upsample at fixed uv radius (bloom_up.wgsl:35-53)."""
    out_w, out_h = out_wh
    x = radius_uv
    y = radius_uv
    uu, vv = _uv_grid(out_w, out_h)

    def s(du, dv):
        return _sample_uv(img, uu + du, vv + dv)

    a = s(-x, +y); b = s(0.0, +y); c = s(+x, +y)
    d = s(-x, 0.0); e = s(0.0, 0.0); f = s(+x, 0.0)
    g = s(-x, -y); h = s(0.0, -y); i = s(+x, -y)

    out = e * 4.0
    out += (b + d + f + h) * 2.0
    out += a + c + g + i
    return out / 16.0


def bloom_chain(img, cfg: BloomConfig):
    """5-down / 5-up pyramid with the reference's float-tracked resolutions
    (renderer/mod.rs:219-256: res /= 2 five times then *= 2 five times,
    truncating to integers at each pass)."""
    h, w = img.shape[0], img.shape[1]
    # Cap the pyramid depth so no level degenerates below 1x1 (tiny debug
    # renders; the reference always runs at >= 59x33 bottom level).
    levels = max(0, min(cfg.levels, min(w, h).bit_length() - 1))
    fres = (float(w), float(h))
    cur = img
    for _ in range(levels):
        fres = (fres[0] / 2.0, fres[1] / 2.0)
        cur = bloom_downsample(cur, (max(int(fres[0]), 1), max(int(fres[1]), 1)))
    for _ in range(levels):
        fres = (fres[0] * 2.0, fres[1] * 2.0)
        cur = bloom_upsample(
            cur, (max(int(fres[0]), 1), max(int(fres[1]), 1)), cfg.up_radius_uv
        )
    return cur


def mix_pass(scene_img, bloom_img, mix_ratio: float):
    """final = ratio * scene + (1 - ratio) * bloom (mix.wgsl:32-35)."""
    return mix_ratio * scene_img + (1.0 - mix_ratio) * bloom_img


def tonemap_pass(img):
    return aces_tonemap(img)


# ---------------------------------------------------------------------------
# FXAA 3.11 (quality) — vectorized port of fxaa.wgsl
# ---------------------------------------------------------------------------

_QUALITY = [1.0, 1.0, 1.0, 1.0, 1.0, 1.5, 2.0, 2.0, 2.0, 2.0, 4.0, 8.0]


def _quality(i: int) -> float:
    return _QUALITY[i] if i < len(_QUALITY) else 8.0


def _luma(rgb):
    return jnp.sqrt(jnp.clip(rgb @ jnp.array([0.299, 0.587, 0.114]), 0.0, None))


def _shift(a, dy: int, dx: int):
    """Clamp-to-edge neighbor fetch for a (H, W) array."""
    if dy > 0:
        a = jnp.concatenate([a[dy:], jnp.repeat(a[-1:], dy, axis=0)], axis=0)
    elif dy < 0:
        a = jnp.concatenate([jnp.repeat(a[:1], -dy, axis=0), a[:dy]], axis=0)
    if dx > 0:
        a = jnp.concatenate([a[:, dx:], jnp.repeat(a[:, -1:], dx, axis=1)], axis=1)
    elif dx < 0:
        a = jnp.concatenate([jnp.repeat(a[:, :1], -dx, axis=1), a[:, :dx]], axis=1)
    return a


def fxaa_pass(img, cfg: FxaaConfig):
    """FXAA 3.11 quality AA (fxaa.wgsl:40-200), fully vectorized.

    The WGSL offset convention has +1 row = "up": its `lumaUp` samples
    offset (0, +1) in texel space.  We keep that naming — "up" here means
    +row; the algorithm is symmetric so orientation is immaterial.
    """
    hgt, wdt = img.shape[0], img.shape[1]
    inv_w, inv_h = 1.0 / wdt, 1.0 / hgt
    luma_img = _luma(img)

    l_c = luma_img
    l_down = _shift(luma_img, -1, 0)
    l_up = _shift(luma_img, +1, 0)
    l_left = _shift(luma_img, 0, -1)
    l_right = _shift(luma_img, 0, +1)

    l_min = jnp.minimum(l_c, jnp.minimum(jnp.minimum(l_down, l_up), jnp.minimum(l_left, l_right)))
    l_max = jnp.maximum(l_c, jnp.maximum(jnp.maximum(l_down, l_up), jnp.maximum(l_left, l_right)))
    l_range = l_max - l_min
    no_edge = l_range < jnp.maximum(cfg.edge_threshold_min, l_max * cfg.edge_threshold_max)

    l_dl = _shift(luma_img, -1, -1)
    l_ur = _shift(luma_img, +1, +1)
    l_ul = _shift(luma_img, +1, -1)
    l_dr = _shift(luma_img, -1, +1)

    l_du = l_down + l_up
    l_lr = l_left + l_right
    l_lc = l_dl + l_ul
    l_dc = l_dl + l_dr
    l_rc = l_dr + l_ur
    l_uc = l_ur + l_ul

    edge_h = (
        jnp.abs(-2.0 * l_left + l_lc)
        + jnp.abs(-2.0 * l_c + l_du) * 2.0
        + jnp.abs(-2.0 * l_right + l_rc)
    )
    edge_v = (
        jnp.abs(-2.0 * l_up + l_uc)
        + jnp.abs(-2.0 * l_c + l_lr) * 2.0
        + jnp.abs(-2.0 * l_down + l_dc)
    )
    is_horizontal = edge_h >= edge_v

    step_len = jnp.where(is_horizontal, inv_h, inv_w)
    luma1 = jnp.where(is_horizontal, l_down, l_left)
    luma2 = jnp.where(is_horizontal, l_up, l_right)
    grad1 = luma1 - l_c
    grad2 = luma2 - l_c
    is1 = jnp.abs(grad1) >= jnp.abs(grad2)
    grad_scaled = 0.25 * jnp.maximum(jnp.abs(grad1), jnp.abs(grad2))
    step_len = jnp.where(is1, -step_len, step_len)
    l_avg = jnp.where(is1, 0.5 * (luma1 + l_c), 0.5 * (luma2 + l_c))

    uu, vv = _uv_grid(wdt, hgt)
    cur_u = jnp.where(is_horizontal, uu, uu + step_len * 0.5)
    cur_v = jnp.where(is_horizontal, vv + step_len * 0.5, vv)
    off_u = jnp.where(is_horizontal, inv_w, 0.0)
    off_v = jnp.where(is_horizontal, 0.0, inv_h)

    def sample_luma(u, v):
        return _luma(_sample_uv(img, u, v))

    u1 = cur_u - off_u
    v1 = cur_v - off_v
    u2 = cur_u + off_u
    v2 = cur_v + off_v

    le1 = sample_luma(u1, v1) - l_avg
    le2 = sample_luma(u2, v2) - l_avg
    reached1 = jnp.abs(le1) >= grad_scaled
    reached2 = jnp.abs(le2) >= grad_scaled

    u1 = jnp.where(reached1, u1, u1 - off_u)
    v1 = jnp.where(reached1, v1, v1 - off_v)
    u2 = jnp.where(reached2, u2, u2 + off_u)
    v2 = jnp.where(reached2, v2, v2 + off_v)

    # Edge walk as a fori_loop (smaller graph than unrolling 10 sample-heavy
    # iterations; compile time matters on big post graphs).
    quality_tab = jnp.array(
        [_quality(i) for i in range(max(cfg.iterations, 2))], jnp.float32
    )

    def walk(i, carry):
        u1, v1, u2, v2, le1, le2, reached1, reached2 = carry
        both = reached1 & reached2
        q = quality_tab[i]
        le1 = jnp.where(reached1, le1, sample_luma(u1, v1) - l_avg)
        le2 = jnp.where(reached2, le2, sample_luma(u2, v2) - l_avg)
        new_r1 = jnp.abs(le1) >= grad_scaled
        new_r2 = jnp.abs(le2) >= grad_scaled
        adv1 = ~both & ~new_r1
        adv2 = ~both & ~new_r2
        u1 = jnp.where(adv1, u1 - off_u * q, u1)
        v1 = jnp.where(adv1, v1 - off_v * q, v1)
        u2 = jnp.where(adv2, u2 + off_u * q, u2)
        v2 = jnp.where(adv2, v2 + off_v * q, v2)
        return (u1, v1, u2, v2, le1, le2, reached1 | new_r1, reached2 | new_r2)

    (u1, v1, u2, v2, le1, le2, reached1, reached2) = jax.lax.fori_loop(
        2, cfg.iterations,
        walk,
        (u1, v1, u2, v2, le1, le2, reached1, reached2),
    )

    dist1 = jnp.where(is_horizontal, vv - v1, uu - u1)
    dist2 = jnp.where(is_horizontal, v2 - vv, u2 - uu)
    is_dir1 = dist1 < dist2
    dist_final = jnp.minimum(dist1, dist2)
    edge_thickness = dist1 + dist2
    center_smaller = l_c < l_avg
    good1 = (le1 < 0.0) != center_smaller
    good2 = (le2 < 0.0) != center_smaller
    good = jnp.where(is_dir1, good1, good2)
    pixel_offset = -dist_final / jnp.where(edge_thickness == 0.0, 1e-12, edge_thickness) + 0.5
    final_offset = jnp.where(good, pixel_offset, 0.0)

    l_full_avg = (1.0 / 12.0) * (2.0 * (l_du + l_lr) + l_lc + l_rc)
    sub1 = jnp.clip(jnp.abs(l_full_avg - l_c) / jnp.where(l_range == 0.0, 1e-12, l_range), 0.0, 1.0)
    sub2 = (-2.0 * sub1 + 3.0) * sub1 * sub1
    sub_final = sub2 * sub2 * cfg.subpixel_quality
    final_offset = jnp.maximum(final_offset, sub_final)

    fin_u = jnp.where(is_horizontal, uu, uu + final_offset * step_len)
    fin_v = jnp.where(is_horizontal, vv + final_offset * step_len, vv)
    out = _sample_uv(img, fin_u, fin_v)
    return jnp.where(no_edge[..., None], img, out)
