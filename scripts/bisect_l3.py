#!/usr/bin/env python
"""Bisect the L3 (final ladder level) sparse retrace — the whole frame
cost (PROFILE_STAGES.json: 280 of 299 ms).

Measures the real needs count at L3 and times each retrace strategy at
that active set: capped gather tiers, full partition+permute, and a plain
uncompacted kernel run (dead tiles exit at the first vote).
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
    from bhx.kernels.march_pallas import MarchKernelConfig, march_pallas, pack_params
    from bhx.pipeline import (
        _refine_level, _refine_masks, trace_image_record_rows,
    )
    from bhx.scene import Scene
    from bhx.tracer import camera_rays, trace_rays_record

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
        print(f"{label:44s}: {ms:8.1f} ms")

    # Build the REAL L2 record planes and L3 needs mask (via the
    # pipeline's own mask logic — no duplicated stencil code).
    w0, h0 = lad.resolution(0)
    rows = trace_image_record_rows(scene, cfg, w0, h0)
    for lvl in range(1, lad.levels - 1):
        w, h = lad.resolution(lvl)
        rows = _refine_level(rows, scene, cfg, w, h)
    w3, h3 = lad.resolution(lad.levels - 1)
    o, d = camera_rays(scene.camera, w3, h3)
    needs, _ = _refine_masks(rows, cfg, w3, h3)
    needs = needs.reshape(-1)
    needs_np = np.asarray(needs)
    n = w3 * h3
    kcfg = MarchKernelConfig(
        integrator="euler", max_iterations=cfg.max_iterations,
        vote_every=cfg.pallas_vote_every, sublanes=cfg.pallas_sublanes,
        unroll=cfg.pallas_unroll,
    )
    lanes = kcfg.lanes
    npad = ((n + lanes - 1) // lanes) * lanes
    na = int(needs_np.sum())
    results["needs_count"] = na
    results["needs_frac"] = round(na / n, 4)
    print(f"L3 {w3}x{h3}: needs {na} / {n} rays ({na/n:.1%}), "
          f"npad={npad}, tiles={npad//lanes}, "
          f"tiers at {npad//64//lanes*lanes} / {npad//8//lanes*lanes}")
    # How clustered: fraction of TILES with any active ray.
    pad = npad - n
    act_t = np.pad(needs_np, (0, pad)).reshape(-1, lanes).any(axis=1)
    results["active_tiles_frac"] = round(float(act_t.mean()), 4)
    print(f"tiles with any active ray: {act_t.mean():.1%}")

    # The current full L3 refine, for reference.
    f = jax.jit(lambda prev, s: _refine_level(prev, s, cfg, w3, h3))
    report("L3 refine (current code)", timed(f, rows, scene))

    # Strategy A: trace_rays_record with active mask (what refine calls).
    o_f, d_f = o.reshape(-1, 3), d.reshape(-1, 3)
    f = jax.jit(
        lambda s, m_: trace_rays_record(o_f, d_f, s, cfg, active=m_)
    )
    report("trace_rays_record sparse (current)", timed(f, scene, needs))

    # Strategy B: same but dense (active=None -> no compaction path).
    f = jax.jit(
        lambda s, m_: trace_rays_record(
            o_f, jnp.where(m_[:, None], d_f, d_f), s, cfg, active=None
        )
    )
    report("trace_rays_record dense all-active", timed(f, scene, needs))

    # Strategy C: raw kernel, uncompacted, realistic active mask, rays
    # already at the sphere boundary (isolates kernel cost from phases).
    bh = scene.black_hole
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, cfg)
    act = jnp.pad(needs.astype(jnp.float32), (0, pad))
    rays = jnp.zeros((10, npad), jnp.float32)
    rays = rays.at[0:3, :n].set((o_f + d_f * 21.0).T)
    rays = rays.at[3:6, :n].set(d_f.T)
    rays = rays.at[6].set(cfg.step_size).at[7].set(act).at[8].set(1.0)
    f = jax.jit(lambda r: march_pallas(r, params, kcfg))
    report("kernel uncompacted, real L3 mask", timed(f, rays))

    # Strategy C at smaller tiles (more tiles, finer early exit).
    for sub in (8, 16, 32):
        k2 = MarchKernelConfig(
            integrator="euler", max_iterations=cfg.max_iterations,
            vote_every=cfg.pallas_vote_every, sublanes=sub,
            unroll=cfg.pallas_unroll,
        )
        np2 = ((n + k2.lanes - 1) // k2.lanes) * k2.lanes
        r2 = rays[:, :np2] if np2 <= npad else jnp.pad(rays, ((0, 0), (0, np2 - npad)))
        f = jax.jit(lambda r, k2=k2: march_pallas(r, params, k2))
        report(f"kernel uncompacted sublanes={sub}", timed(f, r2))

    # Strategy D: all-active dense kernel (upper bound on march cost).
    rays_all = rays.at[7].set(1.0)
    f = jax.jit(lambda r: march_pallas(r, params, kcfg))
    report("kernel all-active dense", timed(f, rays_all))

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out", "BISECT_L3.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
