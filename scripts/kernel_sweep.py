#!/usr/bin/env python
"""Sweep march-kernel tile shapes on the real chip (dev tool).

Two workloads per variant:
  * raw: all lanes active for a fixed 256-step budget (pure VPU throughput)
  * real: default-scene camera rays at 1080p, full 2000-step budget with
    early exits (what a dense frame actually pays)
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bhx

bhx.enable_compile_cache()  # persistent XLA/Mosaic cache (explicit opt-in)


import jax
import jax.numpy as jnp


def force(x):
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1918)
    ap.add_argument("--height", type=int, default=1081)
    ap.add_argument("--integrator", default="euler")
    ap.add_argument("--sublanes", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--unroll", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--vote", type=int, nargs="*", default=[32])
    ap.add_argument("--raw-steps", type=int, default=256)
    args = ap.parse_args()

    from bhx.config import RenderConfig
    from bhx.kernels.march_pallas import (
        IN_FIELDS, MarchKernelConfig, march_pallas, pack_params,
    )
    from bhx.scene import Scene
    from bhx.tracer import camera_rays

    W, H = args.width, args.height
    n = W * H
    scene = Scene.default()
    cfg = RenderConfig(width=W, height=H)
    bh = scene.black_hole
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, cfg)

    o, d = camera_rays(scene.camera, W, H)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    print(f"device: {jax.devices()[0].device_kind}  n={n}  integ={args.integrator}")
    print(f"{'S':>3} {'unr':>4} {'vote':>5} | {'raw ms':>8} {'Mlstep/s':>9} | "
          f"{'real ms':>8} {'mean steps':>10}")

    for s8, unr, vote in itertools.product(args.sublanes, args.unroll, args.vote):
        lanes = s8 * 128
        npad = ((n + lanes - 1) // lanes) * lanes
        rays = jnp.zeros((IN_FIELDS, npad), jnp.float32)
        rays = rays.at[0:3, :n].set(o.T)
        rays = rays.at[3:6, :n].set(d.T)
        rays = rays.at[6].set(cfg.step_size)
        rays = rays.at[7, :n].set(1.0)
        rays = rays.at[8].set(1.0)

        # raw: fixed budget, no early exit possible (budget in params)
        kraw = MarchKernelConfig(
            integrator=args.integrator, max_iterations=args.raw_steps,
            vote_every=vote, sublanes=s8, unroll=unr)
        # no exits: relativity radius -> inf, budget == raw_steps
        praw = params.at[19].set(float(args.raw_steps)).at[5].set(1e9)
        rraw = rays.at[0:3].set(jnp.array([5.0, 6.0, 7.0])[:, None])
        rraw = rraw.at[3:6].set(jnp.array([0.0, 0.0, 1.0], jnp.float32)[:, None])
        f = jax.jit(lambda r: march_pallas(r, praw, kraw))
        force(f(rraw))
        t0 = time.perf_counter(); force(f(rraw)); t_raw = time.perf_counter() - t0
        mls = npad * args.raw_steps / t_raw / 1e6

        # real: full budget, camera rays
        kreal = MarchKernelConfig(
            integrator=args.integrator, max_iterations=2000,
            vote_every=vote, sublanes=s8, unroll=unr)
        g = jax.jit(lambda r: march_pallas(r, params, kreal))
        out = g(rays); force(out)
        t0 = time.perf_counter(); out = g(rays); force(out)
        t_real = time.perf_counter() - t0
        steps = float(jnp.sum(out[6][:n])) / n

        print(f"{s8:>3} {unr:>4} {vote:>5} | {t_raw*1e3:8.1f} {mls:9.0f} | "
              f"{t_real*1e3:8.1f} {steps:10.1f}")


if __name__ == "__main__":
    main()
