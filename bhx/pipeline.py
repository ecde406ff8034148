"""The jitted render pipeline: adaptive ray ladder + sky + post chain.

Replaces the reference's static texture DAG (renderer/mod.rs:170-321, one
wgpu pipeline per pass) with a single jitted function:

    ladder trace -> sky pass -> bloom pyramid -> mix -> ACES -> FXAA

The reference's coarse-to-fine "adaptive grid" (ray.wgsl:167-243) decides
per fine pixel whether to copy a coarse pixel, interpolate escape
directions, or re-trace.  Its per-pixel branch becomes a masked dense
retrace (SURVEY.md §7 hard part 4): the whole level is traced with the
needs-trace set as the initial active mask, and the march kernel's O(n)
stable-partition compaction packs live rays into dense tiles each round —
so traced work is proportional to the needs count while every shape stays
static and the level is a single pipeline invocation.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from bhx.config import RenderConfig
from bhx.post import bloom_chain, fxaa_pass, mix_pass, tonemap_pass
from bhx.scene import Scene
from bhx.shading import sample_sky
from bhx.tracer import (
    REC_ALPHA,
    REC_DIR,
    camera_rays,
    finalize_image,
    trace_image,
    trace_image_record,
    trace_rays,
    trace_rays_record,
)


def sky_pass(img4, sky_tex, texture_mode: str = "array"):
    """Convert escape-encoded pixels (alpha 0, rgb = direction) to sky
    color; pass hit pixels through (reference sky.wgsl:17-29)."""
    alpha = img4[..., 3]
    sky = sample_sky(sky_tex, img4[..., :3], texture_mode)
    rgb = jnp.where(alpha[..., None] == 0.0, sky, img4[..., :3])
    return rgb


def _dirs_aligned(a, b, cos_thresh: float):
    """angle(a, b) < acos(cos_thresh), evaluated as a dot-product compare —
    cos is strictly decreasing on [0, pi], so no arccos (which costs a
    transcendental per pair per pixel at full frame resolution)."""
    dot = jnp.sum(a * b, axis=-1)
    n2 = jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1)
    return dot > cos_thresh * jnp.sqrt(jnp.maximum(n2, 1e-24))


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

    # The 4 coarse neighbours as nearest-upsamples of (shifted) prev_img:
    # c_tl[yf, xf] = prev[yf//m, xf//m] is a repeat, and the +1 neighbours
    # are repeats of edge-clamped shifts — pure stencil ops instead of 4
    # full-frame gathers (TPU gathers cost ~per row).
    def up(img):
        r = jnp.repeat(jnp.repeat(img, m, axis=0), m, axis=1)
        return r[:height, :width]

    sh_x = jnp.concatenate([prev_img[:, 1:], prev_img[:, -1:]], axis=1)
    sh_y = jnp.concatenate([prev_img[1:], prev_img[-1:]], axis=0)
    sh_xy = jnp.concatenate([sh_y[:, 1:], sh_y[:, -1:]], axis=1)
    c_tl = up(prev_img)
    c_tr = up(sh_x)
    c_bl = up(sh_y)
    c_br = up(sh_xy)

    ct = math.cos(cfg.angle_division_threshold)
    aligned = (
        _dirs_aligned(c_bl[..., REC_DIR], c_tl[..., REC_DIR], ct)
        & _dirs_aligned(c_br[..., REC_DIR], c_tr[..., REC_DIR], ct)
        & _dirs_aligned(c_tl[..., REC_DIR], c_tr[..., REC_DIR], ct)
        & _dirs_aligned(c_bl[..., REC_DIR], c_br[..., REC_DIR], ct)
    )
    all_escape = (
        (c_tl[..., REC_ALPHA] == 0.0)
        & (c_tr[..., REC_ALPHA] == 0.0)
        & (c_bl[..., REC_ALPHA] == 0.0)
        & (c_br[..., REC_ALPHA] == 0.0)
    )
    can_interp = all_escape & aligned

    fx = (gx / m - tx)[..., None]
    fy = (gy / m - ty)[..., None]
    dir_top = c_tl[..., REC_DIR] * (1 - fx) + c_tr[..., REC_DIR] * fx
    dir_bot = c_bl[..., REC_DIR] * (1 - fx) + c_br[..., REC_DIR] * fx
    dir_interp = dir_top * (1 - fy) + dir_bot * fy
    # Interpolated-escape record: no color, alpha 0, full transmission.
    zero3 = jnp.zeros_like(dir_interp)
    interp_rec = jnp.concatenate(
        [zero3, jnp.zeros_like(fx), jnp.ones_like(fx), dir_interp], axis=-1
    )

    known = jnp.where(exact[..., None], c_tl, interp_rec)
    needs = ~exact & ~can_interp

    # --- masked dense retrace ---
    # Trace the whole level with the needs mask as the initial active set:
    # the march's compaction packs live rays into dense tiles, so traced
    # work tracks the needs count while every shape stays static.  This
    # replaces the old serialized chunk loop (gather/trace/scatter per
    # chunk), which cost a full pipeline round-trip per 32k rays.
    needs_flat = needs.reshape(-1)
    res = trace_rays_record(
        o.reshape(-1, 3), d.reshape(-1, 3), scene, cfg, active=needs_flat
    )
    rec_flat = jnp.where(needs_flat[:, None], res, known.reshape(-1, 8))
    return rec_flat.reshape(height, width, 8)


def ladder_trace(scene: Scene, cfg: RenderConfig):
    """Full coarse-to-fine trace at the ladder's final resolution.

    Operates on sky-free records ((H, W, 8)); the caller finalizes sky
    exactly once on the last level.
    """
    lad = cfg.ladder_for_output()
    w0, h0 = lad.resolution(0)
    rec = trace_image_record(scene, cfg, w0, h0)
    for lvl in range(1, lad.levels):
        w, h = lad.resolution(lvl)
        rec = _refine_level(rec, scene, cfg, w, h)
    return rec


def render(scene: Scene, cfg: RenderConfig = RenderConfig()):
    """Render the scene to a (height, width, 3) float image in [0, 1].

    The whole frame — ladder, sky, bloom, mix, tonemap, FXAA — is one
    traceable function: jit it (or take its grad in dense mode) directly.
    """
    if cfg.use_ladder and cfg.march_mode != "diff":
        rec = ladder_trace(scene, cfg)
        lw, lh = cfg.ladder_for_output().final_resolution
        # Center-crop the ladder overshoot down to the requested output.
        x0 = (lw - cfg.width) // 2
        y0 = (lh - cfg.height) // 2
        rec = jax.lax.dynamic_slice(
            rec, (y0, x0, 0), (cfg.height, cfg.width, 8)
        )
    else:
        rec = trace_image_record(scene, cfg, cfg.width, cfg.height)

    # ONE sky pass for the whole frame (hit pixels' residual transmission
    # and escapes' full sky in the same formula).  In pallas+procedural
    # mode the star-grid radiance runs as a Pallas kernel — XLA evaluates
    # the same math ~10x off roofline (239 ms/frame measured at 1080p).
    if (
        cfg.texture_mode == "procedural"
        and cfg.march_mode in ("pallas", "pallas_interpret")
    ):
        from bhx.kernels.shade_pallas import SkyKernelConfig, sky_finalize

        rgb = sky_finalize(
            rec,
            SkyKernelConfig(
                show_sky=cfg.show_sky,
                sublanes=cfg.pallas_shade_sublanes,
                interpret=cfg.march_mode == "pallas_interpret",
            ),
        )
    else:
        rgb = finalize_image(rec, scene.sky_texture, cfg.show_sky, cfg.texture_mode)

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
    from bhx.tracer import camera_rays, trace_rays_record

    h, w = cfg.height, cfg.width
    rec_np = np.zeros((h, w, 8), np.float32)
    start_band = 0
    n_bands = -(-h // band_rows)
    if checkpoint_path and os.path.exists(checkpoint_path):
        z = np.load(checkpoint_path)
        if tuple(z["shape"]) == (h, w) and int(z["band_rows"]) == band_rows:
            rec_np = z["rec"]
            start_band = int(z["next_band"])

    o, d = camera_rays(scene.camera, w, h)

    @partial(jax.jit, static_argnames=("cfg",))
    def trace_band(o, d, scene, cfg):
        return trace_rays_record(o.reshape(-1, 3), d.reshape(-1, 3), scene, cfg)

    for band in range(start_band, n_bands):
        y0 = band * band_rows
        y1 = min(y0 + band_rows, h)
        rows = y1 - y0
        # Anchor the last band so every trace has one compiled shape.
        s0 = min(y0, max(h - band_rows, 0))
        ob = o[s0:s0 + band_rows]
        db = d[s0:s0 + band_rows]
        out = np.asarray(trace_band(ob, db, scene, cfg)).reshape(band_rows, w, 8)
        rec_np[y0:y1] = out[band_rows - rows:]
        if checkpoint_path:
            np.savez_compressed(
                checkpoint_path + ".tmp.npz", rec=rec_np,
                next_band=band + 1, shape=(h, w), band_rows=band_rows,
            )
            os.replace(checkpoint_path + ".tmp.npz", checkpoint_path)
        if verbose:
            print(f"band {band + 1}/{n_bands} done")

    rec = jnp.asarray(rec_np)
    rgb = finalize_image(rec, scene.sky_texture, cfg.show_sky, cfg.texture_mode)
    if cfg.bloom.enabled:
        rgb = mix_pass(rgb, bloom_chain(rgb, cfg.bloom), cfg.bloom.mix_ratio)
    if cfg.tonemap:
        rgb = tonemap_pass(rgb)
    if cfg.fxaa.enabled:
        rgb = fxaa_pass(rgb, cfg.fxaa)
    return rgb
