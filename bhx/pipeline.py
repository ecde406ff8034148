"""The jitted render pipeline: adaptive ray ladder + sky + post chain.

Replaces the reference's static texture DAG (renderer/mod.rs:170-321, one
wgpu pipeline per pass) with a single jitted function:

    ladder trace -> sky pass -> bloom pyramid -> mix -> ACES -> FXAA

The reference's coarse-to-fine "adaptive grid" (ray.wgsl:167-243) decides
per fine pixel whether to copy a coarse pixel, interpolate escape
directions, or re-trace.  Its per-pixel branch becomes the TPU-shaped
gather -> compact -> dense-retrace -> scatter (SURVEY.md §7 hard part 4):
the needs-trace set is compacted to the front with a stable argsort and
traced in fixed-size dense chunks inside a while_loop, so the cost is
proportional to the number of rays actually traced while every chunk is a
fully dense, static-shape batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bhx.config import RenderConfig
from bhx.post import bloom_chain, fxaa_pass, mix_pass, tonemap_pass
from bhx.scene import Scene
from bhx.shading import sample_sky
from bhx.tracer import camera_rays, trace_image, trace_rays

# Dense retrace chunk: a multiple of the 8x128 VPU tile.  Large chunks
# amortize per-dispatch overheads and give the Pallas march kernel enough
# tiles to fill; the waste in the final partial chunk is bounded by one
# chunk of rays.
_CHUNK = 32768


def sky_pass(img4, sky_tex):
    """Convert escape-encoded pixels (alpha 0, rgb = direction) to sky
    color; pass hit pixels through (reference sky.wgsl:17-29)."""
    alpha = img4[..., 3]
    sky = sample_sky(sky_tex, img4[..., :3])
    rgb = jnp.where(alpha[..., None] == 0.0, sky, img4[..., :3])
    return rgb


def _angle_between(a, b):
    dot = jnp.sum(a * b, axis=-1)
    denom = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return jnp.arccos(jnp.clip(dot / jnp.maximum(denom, 1e-12), -1.0, 1.0))


def _refine_level(prev_img, scene: Scene, cfg: RenderConfig, width: int, height: int):
    """One ladder refinement step (reference ray.wgsl:183-241).

    Every multiplier-th pixel copies the coarse value; in-between pixels
    whose 4 coarse neighbours are all escapes (alpha 0) with mutually
    aligned directions get a bilinearly interpolated direction; the rest
    are re-traced in compacted dense chunks.
    """
    m = cfg.ladder.multiplier
    ph, pw = prev_img.shape[0], prev_img.shape[1]
    o, d = camera_rays(scene.camera, width, height)

    xs = jnp.arange(width)
    ys = jnp.arange(height)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)

    tx = gx // m
    ty = gy // m
    exact = ((gx % m) == 0) & ((gy % m) == 0)

    tx1 = jnp.minimum(tx + 1, pw - 1)
    ty1 = jnp.minimum(ty + 1, ph - 1)
    c_tl = prev_img[ty, tx]
    c_tr = prev_img[ty, tx1]
    c_bl = prev_img[ty1, tx]
    c_br = prev_img[ty1, tx1]

    angles = jnp.stack(
        [
            _angle_between(c_bl[..., :3], c_tl[..., :3]),
            _angle_between(c_br[..., :3], c_tr[..., :3]),
            _angle_between(c_tl[..., :3], c_tr[..., :3]),
            _angle_between(c_bl[..., :3], c_br[..., :3]),
        ],
        axis=-1,
    )
    alphas = jnp.stack(
        [c_tl[..., 3], c_tr[..., 3], c_bl[..., 3], c_br[..., 3]], axis=-1
    )
    can_interp = jnp.all(alphas == 0.0, axis=-1) & jnp.all(
        angles < cfg.angle_division_threshold, axis=-1
    )

    fx = (gx / m - tx)[..., None]
    fy = (gy / m - ty)[..., None]
    dir_top = c_tl[..., :3] * (1 - fx) + c_tr[..., :3] * fx
    dir_bot = c_bl[..., :3] * (1 - fx) + c_br[..., :3] * fx
    dir_interp = dir_top * (1 - fy) + dir_bot * fy
    interp_rgba = jnp.concatenate([dir_interp, jnp.zeros_like(fx)], axis=-1)

    known = jnp.where(exact[..., None], c_tl, interp_rgba)
    needs = ~exact & ~can_interp

    # --- compact + dense retrace ---
    n = width * height
    chunk = min(_CHUNK, n)
    needs_flat = needs.reshape(-1)
    img_flat = known.reshape(-1, 4)
    o_flat = o.reshape(-1, 3)
    d_flat = d.reshape(-1, 3)
    order = jnp.argsort(~needs_flat, stable=True).astype(jnp.int32)
    count = jnp.sum(needs_flat.astype(jnp.int32))

    def cond(carry):
        _, start = carry
        return start < count

    def body(carry):
        img, start = carry
        astart = jnp.minimum(start, n - chunk)
        idx = jax.lax.dynamic_slice(order, (astart,), (chunk,))
        res = trace_rays(o_flat[idx], d_flat[idx], scene, cfg)
        valid = (astart + jnp.arange(chunk)) < count
        merged = jnp.where(valid[:, None], res, img[idx])
        img = img.at[idx].set(merged)
        return img, start + chunk

    img_flat, _ = jax.lax.while_loop(cond, body, (img_flat, jnp.int32(0)))
    return img_flat.reshape(height, width, 4)


def ladder_trace(scene: Scene, cfg: RenderConfig):
    """Full coarse-to-fine trace at the ladder's final resolution."""
    lad = cfg.ladder_for_output()
    w0, h0 = lad.resolution(0)
    img = trace_image(scene, cfg, w0, h0)
    for lvl in range(1, lad.levels):
        w, h = lad.resolution(lvl)
        img = _refine_level(img, scene, cfg, w, h)
    return img


def render(scene: Scene, cfg: RenderConfig = RenderConfig()):
    """Render the scene to a (height, width, 3) float image in [0, 1].

    The whole frame — ladder, sky, bloom, mix, tonemap, FXAA — is one
    traceable function: jit it (or take its grad in dense mode) directly.
    """
    if cfg.use_ladder and cfg.march_mode != "diff":
        img4 = ladder_trace(scene, cfg)
        lw, lh = cfg.ladder_for_output().final_resolution
        # Center-crop the ladder overshoot down to the requested output.
        x0 = (lw - cfg.width) // 2
        y0 = (lh - cfg.height) // 2
        img4 = jax.lax.dynamic_slice(
            img4, (y0, x0, 0), (cfg.height, cfg.width, 4)
        )
    else:
        img4 = trace_image(scene, cfg, cfg.width, cfg.height)

    rgb = sky_pass(img4, scene.sky_texture) if cfg.show_sky else jnp.where(
        img4[..., 3:] == 0.0, 0.0, img4[..., :3]
    )

    if cfg.bloom.enabled:
        bloom = bloom_chain(rgb, cfg.bloom)
        rgb = mix_pass(rgb, bloom, cfg.bloom.mix_ratio)
    if cfg.tonemap:
        rgb = tonemap_pass(rgb)
    if cfg.fxaa.enabled:
        rgb = fxaa_pass(rgb, cfg.fxaa)
    return rgb


@partial(jax.jit, static_argnames=("cfg",))
def render_jit(scene: Scene, cfg: RenderConfig):
    return render(scene, cfg)


def render_image(scene: Scene, cfg: RenderConfig = RenderConfig()):
    """Render and convert to uint8 (host-side helper)."""
    import numpy as np

    rgb = np.asarray(render_jit(scene, cfg))
    return (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype("uint8")


def render_tiled(
    scene: Scene,
    cfg: RenderConfig,
    band_rows: int = 256,
    checkpoint_path: str | None = None,
    verbose: bool = False,
):
    """Giant-frame render in row bands with resumable checkpoints.

    For frames too large (or too long-running) for one device invocation:
    the dense trace runs band by band; after each band the accumulated
    alpha-encoded image is written to ``checkpoint_path`` (.npz) so an
    interrupted render resumes where it stopped (SURVEY.md §5
    "Checkpoint / resume" — the reference has none).  The post chain runs
    once at the end on the assembled frame.
    """
    import os

    import numpy as np

    from bhx.post import bloom_chain, fxaa_pass, mix_pass, tonemap_pass
    from bhx.tracer import camera_rays, trace_rays

    h, w = cfg.height, cfg.width
    img4 = np.zeros((h, w, 4), np.float32)
    start_band = 0
    n_bands = -(-h // band_rows)
    if checkpoint_path and os.path.exists(checkpoint_path):
        z = np.load(checkpoint_path)
        if tuple(z["shape"]) == (h, w) and int(z["band_rows"]) == band_rows:
            img4 = z["img4"]
            start_band = int(z["next_band"])

    o, d = camera_rays(scene.camera, w, h)

    @partial(jax.jit, static_argnames=("cfg",))
    def trace_band(o, d, scene, cfg):
        return trace_rays(o.reshape(-1, 3), d.reshape(-1, 3), scene, cfg)

    for band in range(start_band, n_bands):
        y0 = band * band_rows
        y1 = min(y0 + band_rows, h)
        rows = y1 - y0
        # Anchor the last band so every trace has one compiled shape.
        s0 = min(y0, max(h - band_rows, 0))
        ob = o[s0:s0 + band_rows]
        db = d[s0:s0 + band_rows]
        out = np.asarray(trace_band(ob, db, scene, cfg)).reshape(band_rows, w, 4)
        img4[y0:y1] = out[band_rows - rows:]
        if checkpoint_path:
            np.savez_compressed(
                checkpoint_path + ".tmp.npz", img4=img4,
                next_band=band + 1, shape=(h, w), band_rows=band_rows,
            )
            os.replace(checkpoint_path + ".tmp.npz", checkpoint_path)
        if verbose:
            print(f"band {band + 1}/{n_bands} done")

    img4_j = jnp.asarray(img4)
    rgb = sky_pass(img4_j, scene.sky_texture) if cfg.show_sky else jnp.where(
        img4_j[..., 3:] == 0.0, 0.0, img4_j[..., :3]
    )
    if cfg.bloom.enabled:
        rgb = mix_pass(rgb, bloom_chain(rgb, cfg.bloom), cfg.bloom.mix_ratio)
    if cfg.tonemap:
        rgb = tonemap_pass(rgb)
    if cfg.fxaa.enabled:
        rgb = fxaa_pass(rgb, cfg.fxaa)
    return rgb
