#!/usr/bin/env python
"""BASELINE config 4 artifact: gradients at 1918x1081 through the
full pallas + ladder + post pipeline (VERDICT r2 missing #5).

Produces scripts/out/GRAD_CONFIG4.json with:
  * reverse-mode d(loss)/d(mass, fov, disk_outer) where
    loss = mean(image) + sum of 4 probe pixels, computed at 1918x1081
    through march_mode="pallas" + the 4-level ladder + bloom/ACES/FXAA
    (the Euler custom_vjp replays the jnp mirror in the backward sweep);
  * central finite differences of the SAME loss (2 renders at m +- eps)
    and the AD/FD relative error;
  * wall times for the forward, the grad, and the FD probes;
and a d(image)/d(mass) finite-difference image (normalized PNG) for
visual inspection.

Reference ladder being differentiated: renderer/mod.rs:170-207 (which has
no gradients at all).
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


def main():
    import dataclasses

    from bhx.config import LadderConfig, RenderConfig
    from bhx.pipeline import render
    from bhx.scene import Scene

    import argparse

    ap = argparse.ArgumentParser()
    # The backward replays the march mirror over every ray; at 1080p that
    # peaks near the HBM limit, so the artifact runs ray-chunked by
    # default (sequential chunks, zero approximation — march_grad).
    ap.add_argument("--bwd-chunks", type=int, default=8)
    args = ap.parse_args()

    W, H = 1918, 1081
    scene = Scene.default()
    cfg = RenderConfig(
        width=W, height=H, use_ladder=True,
        ladder=LadderConfig.for_resolution(W, H, 4), march_mode="pallas",
        pallas_bwd_chunks=args.bwd_chunks,
    )
    probes = [(H // 2, W // 2), (H // 2, W // 3), (2 * H // 5, 2 * W // 3),
              (H // 2 + 40, W // 2 + 200)]

    def img_fn(mass, fov, disk_outer):
        bh = dataclasses.replace(
            scene.black_hole, mass=mass, disk_outer=disk_outer
        )
        cam = dataclasses.replace(scene.camera, fov=fov)
        s = dataclasses.replace(scene, black_hole=bh, camera=cam)
        return render(s, cfg)

    def loss_fn(mass, fov, disk_outer):
        img = img_fn(mass, fov, disk_outer)
        probe_sum = sum(img[y, x].sum() for (y, x) in probes)
        return jnp.mean(img) * 100.0 + probe_sum

    theta0 = (jnp.float32(0.5), jnp.float32(1.0), jnp.float32(10.0))

    f = jax.jit(loss_fn)
    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))

    t0 = time.perf_counter()
    l0 = float(f(*theta0))
    fwd_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*theta0))
    fwd_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    grads = [float(v) for v in g(*theta0)]
    grad_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    [float(v) for v in g(*theta0)]
    grad_s = time.perf_counter() - t0

    # Central FD of the same loss per parameter.
    eps = [1e-3, 1e-3, 1e-2]
    fd = []
    t0 = time.perf_counter()
    for i, e in enumerate(eps):
        tp = [jnp.float32(float(t) + (e if j == i else 0.0))
              for j, t in enumerate(theta0)]
        tm = [jnp.float32(float(t) - (e if j == i else 0.0))
              for j, t in enumerate(theta0)]
        fd.append((float(f(*tp)) - float(f(*tm))) / (2.0 * e))
    fd_s = time.perf_counter() - t0

    rel = [
        abs(a - b) / max(abs(a), abs(b), 1e-8) for a, b in zip(grads, fd)
    ]

    # FD gradient IMAGE d(image)/d(mass) for visual inspection.
    e = 1e-3
    img_p = np.asarray(img_fn(jnp.float32(0.5 + e), *theta0[1:]))
    img_m = np.asarray(img_fn(jnp.float32(0.5 - e), *theta0[1:]))
    gimg = (img_p - img_m) / (2.0 * e)

    out = dict(
        resolution=[W, H],
        config="pallas march + 4-level ladder + bloom + ACES + FXAA",
        bwd_chunks=args.bwd_chunks,
        loss="100*mean(image) + sum of 4 probe pixels",
        probes=probes,
        loss_value=l0,
        params=["mass", "fov", "disk_outer"],
        ad_grads=grads,
        fd_grads=fd,
        rel_err=rel,
        ad_fd_agree=[r < 0.05 for r in rel],
        grad_image_stats=dict(
            finite=bool(np.isfinite(gimg).all()),
            abs_max=float(np.abs(gimg).max()),
            abs_mean=float(np.abs(gimg).mean()),
        ),
        timings_s=dict(
            forward=round(fwd_s, 3), grad=round(grad_s, 3),
            fd_6_renders=round(fd_s, 3),
            forward_compile=round(fwd_compile_s, 1),
            grad_compile=round(grad_compile_s, 1),
        ),
        device=jax.devices()[0].device_kind,
    )
    odir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(odir, exist_ok=True)
    with open(os.path.join(odir, "GRAD_CONFIG4.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))

    # Normalized |gradient| image.
    from PIL import Image

    mag = np.abs(gimg).sum(-1)
    mag = mag / max(mag.max(), 1e-8)
    Image.fromarray((np.clip(mag, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(odir, "grad_mass_1080p.png")
    )
    print("wrote", os.path.join(odir, "GRAD_CONFIG4.json"),
          "and grad_mass_1080p.png")


if __name__ == "__main__":
    main()
