#!/usr/bin/env python
"""Bisect trace_rays_record glue at the real 1080p final ladder level.

BISECT_L3.json showed the raw kernel at 13.5 ms while the full record
call costs ~50 ms; this times each phase of trace_rays_record in
isolation on the real needs mask to find the glue.
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(_cks(leaf.reshape(-1)[:1] if leaf.ndim else leaf))


def timed(fn, *args, iters=4):
    sync(fn(*args))
    sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from bhx.config import LadderConfig, RenderConfig
    from bhx.pipeline import (
        _refine_level, _refine_masks, trace_image_record_rows,
    )
    from bhx.scene import Scene
    from bhx.tracer import (
        _init_state, _march_phase, _shade_deferred, _straight_phase,
        camera_rays, trace_rays_record,
    )

    W, H = 1918, 1081
    scene = Scene.default()
    cfg = RenderConfig(
        width=W, height=H, use_ladder=True,
        ladder=LadderConfig.for_resolution(W, H, 4), march_mode="pallas",
    )
    lad = cfg.ladder_for_output()
    lat = timed(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(f"sync latency {lat*1e3:.1f} ms (subtracted)")
    results = {}

    def report(label, t):
        ms = max(t - lat, 0.0) * 1e3
        results[label] = round(ms, 1)
        print(f"{label:36s}: {ms:8.1f} ms")

    # Build the real L2 record planes; the pipeline's own mask logic
    # yields the L3 needs mask exactly as _refine_level computes it.
    w0, h0 = lad.resolution(0)
    rows = trace_image_record_rows(scene, cfg, w0, h0)
    for lvl in range(1, lad.levels - 1):
        w, h = lad.resolution(lvl)
        rows = _refine_level(rows, scene, cfg, w, h)
    w3, h3 = lad.resolution(lad.levels - 1)
    o, d = camera_rays(scene.camera, w3, h3)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    needs, _ = _refine_masks(rows, cfg, w3, h3)
    needs = needs.reshape(-1)
    print(f"needs: {int(needs.sum())} / {needs.shape[0]}")

    bh = scene.black_hole
    cam_dist = jnp.linalg.norm(o - bh.position, axis=-1)

    # Whole record call (reference).
    f = jax.jit(lambda s, a: trace_rays_record(o, d, s, cfg, active=a))
    report("record total", timed(f, scene, needs))

    # init_state alone.
    f = jax.jit(lambda: _init_state(o, d, deferred=True))
    report("init_state", timed(f))
    state0 = f()
    state0["status"] = jnp.where(needs, state0["status"], jnp.int32(2))

    # straight phase r0.
    f = jax.jit(lambda st: _straight_phase(st, scene, cfg, cam_dist))
    report("straight r0", timed(f, state0))
    state1 = f(state0)

    # march phase r0 (kernel + wrapper glue).
    f = jax.jit(
        lambda st: _march_phase(
            st, scene, cfg, cam_dist, sparse=True, first_phase=True
        )
    )
    report("march r0 total", timed(f, state1))
    state2 = f(state1)

    # straight r1 + gated march r1.
    f = jax.jit(lambda st: _straight_phase(st, scene, cfg, cam_dist))
    report("straight r1", timed(f, state2))
    state3 = f(state2)

    def gated(st):
        march = lambda s: _march_phase(
            s, scene, cfg, cam_dist, sparse=True, first_phase=False
        )
        return jax.lax.cond(
            jnp.any(st["status"] == 1), march, lambda s: s, st
        )

    f = jax.jit(gated)
    report("gated march r1", timed(f, state3))
    state4 = f(state3)
    print("  r1 actives:", int(jnp.sum(state3["status"] == 1)))

    # final straight + shade + concat.
    f = jax.jit(lambda st: _straight_phase(st, scene, cfg, cam_dist))
    report("straight final", timed(f, state4))
    state5 = f(state4)

    f = jax.jit(lambda st: _shade_deferred(st, scene, cfg, cam_dist))
    report("shade_deferred", timed(f, state5))

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out", "BISECT_RECORD.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
