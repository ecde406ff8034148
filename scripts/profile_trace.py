#!/usr/bin/env python
"""Bisect the non-kernel overhead of trace_rays on TPU (dev tool)."""

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
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1918)
    ap.add_argument("--height", type=int, default=1081)
    args = ap.parse_args()

    from bhx.config import RenderConfig
    from bhx.kernels.march_pallas import (
        IN_FIELDS, LANES, MarchKernelConfig, march_pallas, pack_params,
    )
    from bhx.scene import Scene
    from bhx.tracer import camera_rays, trace_rays

    W, H = args.width, args.height
    scene = Scene.default()
    base = RenderConfig(width=W, height=H, march_mode="pallas", use_ladder=False)
    o, d = camera_rays(scene.camera, W, H)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = W * H
    npad = ((n + LANES - 1) // LANES) * LANES
    print(f"n={n} device={jax.devices()[0].device_kind}")

    # 1. single kernel call, full 2000-iter budget, real camera rays
    bh = scene.black_hole
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, base)
    rays = jnp.zeros((IN_FIELDS, npad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T).at[3:6, :n].set(d.T)
    rays = rays.at[6].set(base.step_size).at[7, :n].set(1.0).at[8].set(1.0)
    kcfg = MarchKernelConfig(integrator="euler", max_iterations=2000,
                             vote_every=base.pallas_vote_every)
    f = jax.jit(lambda r: march_pallas(r, params, kcfg))
    t, out = timed(f, rays)
    steps = np.asarray(out[6][:n])
    print(f"single-call 2000-budget kernel: {t*1e3:8.1f} ms  "
          f"steps mean={steps.mean():.0f} p50={np.percentile(steps,50):.0f} "
          f"p99={np.percentile(steps,99):.0f} max={steps.max():.0f}")
    print(f"  sum-steps={steps.sum()/1e6:.0f}M -> ideal "
          f"{steps.sum()/3.78e9*1e3:.0f} ms at 3.78G lane-steps/s")

    # 2. trace_rays with varying round structure
    for rs, label in ((2000, "1 round"), (512, "4 rounds"), (256, "8 rounds")):
        cfg = base.replace(pallas_round_steps=rs)
        f = jax.jit(lambda s, c=cfg: trace_rays(o, d, s, c))
        t, _ = timed(f, scene)
        print(f"trace_rays {label:9s}: {t*1e3:8.1f} ms")

    # 3. no disk (slot machinery off)
    cfg = base.replace(pallas_round_steps=2000, show_disk=False)
    f = jax.jit(lambda s: trace_rays(o, d, s, cfg))
    t, _ = timed(f, scene)
    print(f"trace_rays 1rd nodisk:  {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
