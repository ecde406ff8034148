"""Throughput benchmark: Mrays/s at 1080p Schwarzschild + disk.

Matches the BASELINE.md headline metric: effective rays (final-resolution
pixels) per second for the full default pipeline (ladder + disk + redshift
+ sky + bloom + ACES + FXAA) on whatever devices JAX sees.
"""

from __future__ import annotations

import time
from typing import Dict

import jax


def run_bench(width: int = 1918, height: int = 1081, iters: int = 5,
              dense: bool = False, warmup: int = 2,
              march_mode: str = "pallas") -> Dict:
    import dataclasses

    import jax.numpy as jnp

    from bhx.config import LadderConfig, RenderConfig
    from bhx.pipeline import render_jit
    from bhx.scene import Scene

    scene = Scene.default()
    cfg = RenderConfig(
        width=width,
        height=height,
        use_ladder=not dense,
        ladder=LadderConfig.for_resolution(width, height, 4),
        march_mode=march_mode,
    )

    @jax.jit
    def checksum(img):
        return jnp.sum(img)

    times = []
    compile_s = None
    for i in range(warmup + iters):
        s = dataclasses.replace(scene, time=jnp.float32(0.1 * i))
        t0 = time.perf_counter()
        img = render_jit(s, cfg)
        # block_until_ready is not reliable on the tunneled TPU platform —
        # force completion by materializing a scalar checksum on the host.
        float(checksum(img))
        dt = time.perf_counter() - t0
        if i == 0:
            compile_s = dt
        if i >= warmup:
            times.append(dt)

    best = min(times)
    rays = width * height
    mrays = rays / best / 1e6
    return {
        "metric": "Mrays/s 1080p schwarzschild+disk (full pipeline)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "best_s": round(best, 4),
        "mean_s": round(sum(times) / len(times), 4),
        "compile_s": round(compile_s, 1),
        "devices": len(jax.devices()),
        "device_kind": jax.devices()[0].device_kind,
        "dense": dense,
        "resolution": [width, height],
        "vs_baseline": round(mrays / 50.0, 3),
    }
