#!/usr/bin/env python
"""Bisect the dense-trace frame cost on TPU with an honest sync (dev tool).

block_until_ready does not block on the tunneled axon platform and a full
device_get drags the frame over the slow tunnel, so every timing here
forces completion with an on-device scalar checksum + scalar transfer and
subtracts the measured sync round-trip latency.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1918)
    ap.add_argument("--height", type=int, default=1081)
    args = ap.parse_args()

    from bhx.config import RenderConfig
    from bhx.kernels.march_pallas import (
        IN_FIELDS, MarchKernelConfig, march_pallas, pack_params,
    )
    from bhx.scene import Scene
    from bhx.tracer import camera_rays, trace_rays_record
    from bhx.pipeline import ladder_trace, render

    W, H = args.width, args.height
    scene = Scene.default()
    base = RenderConfig(width=W, height=H, march_mode="pallas", use_ladder=False)
    o, d = camera_rays(scene.camera, W, H)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = W * H

    # measure sync latency with a no-op
    lat = timed(jax.jit(lambda x: x), jnp.zeros((8, 128)))
    print(f"n={n} device={jax.devices()[0].device_kind} "
          f"sync latency {lat*1e3:.1f} ms (subtracted below)")

    def report(label, t):
        print(f"{label:34s}: {max(t - lat, 0.0)*1e3:8.1f} ms")

    # raw kernel, real camera rays, full budget, swept tile shape
    bh = scene.black_hole
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, base)
    kcfg = MarchKernelConfig(
        integrator="euler", max_iterations=2000,
        vote_every=base.pallas_vote_every, sublanes=base.pallas_sublanes,
        unroll=base.pallas_unroll)
    lanes = kcfg.lanes
    npad = ((n + lanes - 1) // lanes) * lanes
    rays = jnp.zeros((IN_FIELDS, npad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T).at[3:6, :n].set(d.T)
    rays = rays.at[6].set(base.step_size).at[7, :n].set(1.0).at[8].set(1.0)
    f = jax.jit(lambda r: march_pallas(r, params, kcfg))
    report("raw kernel (full budget)", timed(f, rays))

    variants = [
        ("record rounds=2 (default)", base),
        ("record rounds=1", None),  # special-cased below
        ("record no-disk", base.replace(show_disk=False)),
        ("record no-mesh-straight", base.replace(render_meshes=False)),
    ]
    for label, cfg in variants:
        if cfg is None:
            f = jax.jit(
                lambda s: trace_rays_record(o, d, s, base, rounds=1)
            )
        else:
            f = jax.jit(lambda s, c=cfg: trace_rays_record(o, d, s, c))
        report(label, timed(f, scene))

    f = jax.jit(lambda s: ladder_trace(s, base.replace(use_ladder=True)))
    report("ladder trace", timed(f, scene))
    f = jax.jit(lambda s: render(s, base))
    report("full render dense", timed(f, scene))
    f = jax.jit(lambda s: render(s, base.replace(use_ladder=True)))
    report("full render ladder", timed(f, scene))


if __name__ == "__main__":
    main()
