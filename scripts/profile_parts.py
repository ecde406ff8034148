#!/usr/bin/env python
"""Per-component TPU timing breakdown at 1080p (dev tool).

Times each pipeline stage in isolation with small jitted graphs so compile
stays tractable; prints a table.  Run on the real chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bhx

bhx.enable_compile_cache()  # persistent XLA/Mosaic cache (explicit opt-in)


import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1918)
    ap.add_argument("--height", type=int, default=1081)
    ap.add_argument("--integrator", default="euler")
    args = ap.parse_args()

    from bhx.config import Integrator, LadderConfig, RenderConfig
    from bhx.kernels.march_pallas import (
        LANES, IN_FIELDS, MarchKernelConfig, march_pallas, pack_params,
    )
    from bhx.post import bloom_chain, fxaa_pass, mix_pass, tonemap_pass
    from bhx.scene import Scene
    from bhx.tracer import camera_rays, trace_rays

    W, H = args.width, args.height
    integ = Integrator.EULER if args.integrator == "euler" else Integrator.RK45
    scene = Scene.default()
    cfg = RenderConfig(
        width=W, height=H, integrator=integ,
        ladder=LadderConfig.for_resolution(W, H, 4),
        march_mode="pallas",
    )
    n = W * H
    print(f"device: {jax.devices()[0].device_kind}, n={n}, integ={args.integrator}")

    # --- raw kernel throughput: all rays active, fixed step budget ---
    bh = scene.black_hole
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, cfg)
    npad = ((n + LANES - 1) // LANES) * LANES
    key = jax.random.PRNGKey(0)
    o, d = camera_rays(scene.camera, W, H)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    # place rays on the relativity sphere boundary heading inward-ish
    rays = jnp.zeros((IN_FIELDS, npad), jnp.float32)
    rays = rays.at[0:3, :n].set((o + d * 5.0).T)
    rays = rays.at[3:6, :n].set(d.T)
    rays = rays.at[6].set(cfg.step_size)
    rays = rays.at[7, :n].set(1.0)
    rays = rays.at[8].set(1.0)

    for steps in (256,):
        kcfg = MarchKernelConfig(
            integrator=args.integrator, max_iterations=steps,
            vote_every=cfg.pallas_vote_every)
        f = jax.jit(lambda r: march_pallas(r, params, kcfg))
        t, _ = timed(f, rays)
        print(f"kernel {steps}-step all-active: {t*1e3:8.1f} ms "
              f"({npad*steps/t/1e6:8.0f} Mlane-steps/s)")

    # --- dense full-res trace (no ladder) ---
    cfg_dense = cfg.replace(use_ladder=False)
    f = jax.jit(lambda s: trace_rays(o, d, s, cfg_dense))
    t0 = time.perf_counter()
    t, out4 = timed(f, scene)
    print(f"dense trace {W}x{H}: {t*1e3:8.1f} ms  (compile+3 iters took "
          f"{time.perf_counter()-t0:.0f}s)")
    a = np.asarray(out4[:, 3])
    print(f"  hit fraction: {a.mean():.3f}")

    # --- ladder trace ---
    from bhx.pipeline import ladder_trace
    f = jax.jit(lambda s: ladder_trace(s, cfg))
    t0 = time.perf_counter()
    t, img4 = timed(f, scene)
    print(f"ladder trace: {t*1e3:8.1f} ms (compile+iters {time.perf_counter()-t0:.0f}s)")

    # ladder needs-counts per level (diagnostic, CPU-side)
    from bhx import pipeline as pl_mod
    lad = cfg.ladder_for_output()
    # recompute needs masks by running refine levels and counting
    # (approximate: count via angle threshold on traced imgs)

    # --- post chain on a 1080p image ---
    rgb = jnp.abs(jax.random.normal(key, (H, W, 3), jnp.float32))
    f = jax.jit(lambda x: bloom_chain(x, cfg.bloom))
    t, bl = timed(f, rgb)
    print(f"bloom chain: {t*1e3:8.1f} ms")
    f = jax.jit(lambda x, b: tonemap_pass(mix_pass(x, b, cfg.bloom.mix_ratio)))
    t, mixed = timed(f, rgb, bl)
    print(f"mix+tonemap: {t*1e3:8.1f} ms")
    f = jax.jit(lambda x: fxaa_pass(x, cfg.fxaa))
    t, _ = timed(f, mixed)
    print(f"fxaa:        {t*1e3:8.1f} ms")

    # --- sky pass ---
    from bhx.pipeline import sky_pass
    f = jax.jit(lambda i4, s: sky_pass(i4, s.sky_texture))
    i4 = jnp.concatenate([rgb, jnp.zeros((H, W, 1))], axis=-1)
    t, _ = timed(f, i4, scene)
    print(f"sky pass:    {t*1e3:8.1f} ms")

    # --- argsort vs scatter-compaction at full res ---
    needs = jax.random.bernoulli(key, 0.3, (n,))
    f = jax.jit(lambda m: jnp.argsort(~m, stable=True))
    t, _ = timed(f, needs)
    print(f"argsort {n}: {t*1e3:8.1f} ms")

    def scatter_perm(m):
        mi = m.astype(jnp.int32)
        na = jnp.sum(mi)
        ia = jnp.cumsum(mi) - 1
        ii = na + jnp.cumsum(1 - mi) - 1
        dest = jnp.where(m, ia, ii)
        return jnp.zeros((n,), jnp.int32).at[dest].set(jnp.arange(n, dtype=jnp.int32))
    f = jax.jit(scatter_perm)
    t, _ = timed(f, needs)
    print(f"scatter-perm {n}: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
