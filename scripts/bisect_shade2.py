#!/usr/bin/env python
"""Bisect _shade_deferred at the real 1080p record state (round-4 dev tool).

BISECT_RECORD.json pinned shade_deferred at 17.9 ms; this decomposes it:
the ingredients kernel, the jnp composite, and the disk_gain
sample_grid_mxu inside it (suspected dominant: its einsum materializes an
(n, 16, 4) intermediate = 530 MB per slot).
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
    import dataclasses

    from bhx.config import LadderConfig, RenderConfig
    from bhx.kernels.march_pallas import CROSS_FIELDS
    from bhx.kernels.shade_pallas import (
        ShadeKernelConfig, composite_ingredients, pack_shade_params,
        shade_ingredients,
    )
    from bhx.scene import Scene
    from bhx.shading import sample_grid_mxu
    from bhx.tracer import (
        _init_state, _march_phase, _shade_deferred, _straight_phase,
        camera_rays,
    )

    W, H = 1918, 1081
    scene = Scene.default()
    cfg = RenderConfig(
        width=W, height=H, use_ladder=True,
        ladder=LadderConfig.for_resolution(W, H, 4), march_mode="pallas",
    )
    o, d = camera_rays(scene.camera, W, H)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    n = o.shape[0]
    bh = scene.black_hole
    cam_dist = jnp.linalg.norm(o - bh.position, axis=-1)

    lat = timed(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(f"sync latency {lat*1e3:.1f} ms (subtracted)")
    results = {}

    def report(label, t):
        ms = max(t - lat, 0.0) * 1e3
        results[label] = round(ms, 1)
        print(f"{label:40s}: {ms:8.1f} ms")

    # Build a dense post-march state (all rays traced; representative slot
    # occupancy of a dense frame -- slightly denser than the ladder's).
    state = _init_state(o, d, deferred=True)
    state = _straight_phase(state, scene, cfg, cam_dist)
    state = _march_phase(state, scene, cfg, cam_dist, first_phase=True)
    state = jax.tree_util.tree_map(jax.block_until_ready, state)
    K = len(state["slots"]) // CROSS_FIELDS
    counts = np.asarray(state["count"])
    print(f"crossing rays: {(counts>0).mean()*100:.1f}%  mean count {counts.mean():.2f}")

    f = jax.jit(lambda st: _shade_deferred(st, scene, cfg, cam_dist))
    report("shade_deferred total", timed(f, state))

    rot_mat, _ = bh.disk_frame()
    kcfg = ShadeKernelConfig(
        max_crossings=K, show_texture=cfg.show_disk_texture,
        show_redshift=cfg.show_redshift, sublanes=cfg.pallas_shade_sublanes,
    )
    params = pack_shade_params(bh, rot_mat, scene.time)
    slots = state["slots"]
    valid_k = [slots[k * CROSS_FIELDS + 6] > 0.5 for k in range(K)]

    f = jax.jit(lambda s: shade_ingredients(s, cam_dist, params, kcfg))
    report("ingredients kernel", timed(f, slots))
    ing = f(slots)

    f = jax.jit(
        lambda i, g: composite_ingredients(i, valid_k, g, kcfg)
    )
    report("composite (with gain)", timed(f, ing, scene.disk_gain))

    f = jax.jit(lambda i: composite_ingredients(i, valid_k, None, kcfg))
    report("composite (gain=None)", timed(f, ing))

    u = ing[5]
    v = ing[6]

    def gain4(g):
        outs = []
        for k in range(K):
            outs.append(sample_grid_mxu(g, ing[k * 7 + 5], ing[k * 7 + 6]))
        return outs

    f = jax.jit(gain4)
    report("sample_grid_mxu x4 alone", timed(f, scene.disk_gain))

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out", "BISECT_SHADE2.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
