#!/usr/bin/env python
"""Find the gap between the raw march kernel (~8 ms at the real L3 mask)
and the in-trace march phase (~25 ms): time _march_phase_pallas piecewise
with the exact state the L3 trace produces."""

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
    from bhx.kernels.march_pallas import (
        MarchKernelConfig, march_pallas, pack_params,
    )
    from bhx.kernels.march_grad import march_pallas_diff
    from bhx.pipeline import _refine_masks, _refine_level, trace_image_record_rows
    from bhx.scene import Scene
    from bhx.tracer import _init_state, _march_phase, _straight_phase, camera_rays

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
        print(f"{label:42s}: {ms:8.1f} ms")

    # Real L3 state after the first straight phase.
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
    bh = scene.black_hole
    cam_dist = jnp.linalg.norm(o - bh.position, axis=-1)

    st0 = _init_state(o, d, deferred=True)
    st0["status"] = jnp.where(needs, st0["status"], jnp.int32(2))
    f = jax.jit(lambda s: _straight_phase(s, scene, cfg, cam_dist))
    st1 = jax.tree_util.tree_map(jnp.asarray, f(st0))
    print("marching:", int(jnp.sum(st1["status"] == 1)))

    # (a) full march phase, exactly as the trace runs it.
    f = jax.jit(lambda s: _march_phase(s, scene, cfg, cam_dist, sparse=True,
                                       first_phase=True))
    report("march phase (full)", timed(f, st1))

    # (b) kernel alone on the same prepped rows.
    from bhx.config import Integrator

    kcfg = MarchKernelConfig(
        integrator="euler", max_iterations=min(cfg.pallas_round_steps,
                                               cfg.max_iterations),
        tex_opacity_min=0.7, show_disk=True,
        vote_every=cfg.pallas_vote_every, sublanes=cfg.pallas_sublanes,
        unroll=cfg.pallas_unroll,
    )
    n = st1["px"].shape[0]
    pad = (-n) % kcfg.lanes
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, cfg)

    def prep(s):
        was = (s["status"] == 1).astype(jnp.float32)

        def p(r, fill=0.0):
            if pad == 0:
                return r
            return jnp.concatenate([r, jnp.full((pad,), fill, r.dtype)])

        return tuple(
            p(r) for r in (
                s["px"], s["py"], s["pz"], s["dx"], s["dy"], s["dz"],
                s["h"], was, s["amount_ub"], jnp.zeros_like(s["px"]),
            )
        )

    rays = jax.tree_util.tree_map(jnp.asarray, jax.jit(prep)(st1))
    f = jax.jit(lambda r: march_pallas(r, params, kcfg))
    report("kernel alone (prepped rows)", timed(f, rays))
    f = jax.jit(lambda r: march_pallas_diff(r, params, kcfg))
    report("kernel via custom_vjp wrapper", timed(f, rays))

    # (c) prep alone.
    f = jax.jit(prep)
    report("row prep (pad concats)", timed(f, st1))

    # (d) kernel + post-glue = full phase with prep hoisted out? Not
    # separable without refactor; instead: kernel + the trims.
    def kernel_and_trim(r):
        out = march_pallas(r, params, kcfg)
        return tuple(x[:n] for x in out)

    f = jax.jit(kernel_and_trim)
    report("kernel + output trims", timed(f, rays))

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out", "BISECT_MARCH_GLUE.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
