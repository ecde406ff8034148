#!/usr/bin/env python
"""Decompose the final-level refine cost after the round-5 pre-pad.

PROFILE_STAGES puts L3 at ~25 ms of a ~39 ms frame; BISECT_L3 put the
march kernel at ~8 ms at the real mask.  This times the remaining
parts with the production inputs: the refine stencil masks, the full
masked trace (march + straight phases + deferred shade), and the
known/traced merge — writes scripts/out/BISECT_L3_PARTS.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bhx

bhx.enable_compile_cache()  # persistent XLA/Mosaic cache (explicit opt-in)

import jax
import jax.numpy as jnp
import numpy as np

_cks = jax.jit(lambda x: jnp.sum(x))


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(_cks(leaves[0].reshape(-1)))


def timed(fn, *args, iters=6):
    sync(fn(*args))
    t0 = time.perf_counter()
    sync(fn(*args))
    lat = time.perf_counter() - t0  # includes one sync round trip
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from functools import partial

    from bhx.config import LadderConfig, RenderConfig
    from bhx.pipeline import _refine_level, _refine_masks, ladder_trace_rows
    from bhx.scene import Scene
    from bhx.tracer import camera_rays, trace_rays_record_rows

    W, H = 1918, 1081
    scene = Scene.default()
    cfg = RenderConfig(
        width=W, height=H, use_ladder=True,
        ladder=LadderConfig.for_resolution(W, H, 4), march_mode="pallas",
    )
    lad = cfg.ladder_for_output()
    lw, lh = lad.final_resolution
    w2, h2 = lad.resolution(lad.levels - 2)

    # Produce the real L2 record (prev_rows) once.
    @jax.jit
    def up_to_l2(scene):
        rows = None
        from bhx.pipeline import trace_image_record_rows

        w0, h0 = lad.resolution(0)
        rows = trace_image_record_rows(scene, cfg, w0, h0)
        for lvl in range(1, lad.levels - 1):
            w, h = lad.resolution(lvl)
            rows = _refine_level(rows, scene, cfg, w, h)
        return rows

    prev_rows = up_to_l2(scene)
    prev_rows = jax.tree_util.tree_map(jnp.asarray, prev_rows)

    masks_fn = jax.jit(
        lambda pr: _refine_masks(pr, cfg, lw, lh)
    )
    needs, known = masks_fn(prev_rows)
    needs_frac = float(jnp.mean(needs.astype(jnp.float32)))

    o, d = camera_rays(scene.camera, lw, lh)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    needs_flat = needs.reshape(-1)

    trace_fn = jax.jit(
        lambda o, d, s, act: trace_rays_record_rows(o, d, s, cfg, active=act)
    )
    level_fn = jax.jit(
        lambda pr, s: _refine_level(pr, s, cfg, lw, lh)
    )
    ladder_fn = jax.jit(lambda s: ladder_trace_rows(s, cfg))

    out = dict(
        needs_frac=round(needs_frac, 4),
        refine_masks_ms=round(timed(masks_fn, prev_rows) * 1000, 2),
        masked_trace_ms=round(
            timed(trace_fn, o, d, scene, needs_flat) * 1000, 2
        ),
        full_level_ms=round(timed(level_fn, prev_rows, scene) * 1000, 2),
        full_ladder_ms=round(timed(ladder_fn, scene) * 1000, 2),
        device=jax.devices()[0].device_kind,
        note=(
            "masked_trace = march kernel + straight phases + deferred "
            "shade + record assembly at the real L3 needs mask; "
            "full_level - masked_trace - refine_masks ~= known/traced "
            "merge wheres"
        ),
    )
    odir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(odir, exist_ok=True)
    with open(os.path.join(odir, "BISECT_L3_PARTS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
