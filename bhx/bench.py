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
              march_mode: str = "pallas", geodesics: str = "pseudo",
              spin: float = 0.0, adaptive_sublanes: bool = True) -> Dict:
    import dataclasses

    import jax.numpy as jnp

    from bhx.config import LadderConfig, RenderConfig
    from bhx.pipeline import render_jit
    from bhx.scene import Scene

    scene = Scene.default()
    if spin:
        scene = dataclasses.replace(
            scene,
            black_hole=dataclasses.replace(
                scene.black_hole, spin=jnp.float32(spin)
            ),
        )
    cfg = RenderConfig(
        width=width,
        height=height,
        use_ladder=not dense,
        ladder=LadderConfig.for_resolution(width, height, 4),
        march_mode=march_mode,
        geodesics=geodesics,
        pallas_adaptive_sublanes=adaptive_sublanes,
    )

    @jax.jit
    def checksum(img):
        return jnp.sum(img)

    # block_until_ready does not actually block on the tunneled TPU
    # platform; completion is forced by materializing a scalar checksum on
    # the host.  That round trip costs ~25 ms, so frames are timed in one
    # enqueued batch with a single final sync and the measured sync latency
    # is subtracted (scripts/bisect_dense.py documents the methodology).
    def run_batch(count, t_base):
        t0 = time.perf_counter()
        img = None
        for i in range(count):
            s = dataclasses.replace(scene, time=jnp.float32(t_base + 0.1 * i))
            img = render_jit(s, cfg)
        float(checksum(img))
        return time.perf_counter() - t0

    float(checksum(jnp.zeros((8, 128))))  # compile the checksum
    t0 = time.perf_counter()
    float(checksum(jnp.zeros((8, 128))))
    sync_lat = time.perf_counter() - t0

    compile_s = run_batch(1, 0.0)  # first call = compile
    for i in range(warmup):
        run_batch(1, 1.0 + 0.1 * i)
    times = [
        max(run_batch(iters, 2.0 + i) - sync_lat, 1e-9) / iters
        for i in range(3)
    ]

    best = min(times)
    rays = width * height
    mrays = rays / best / 1e6
    label = "schwarzschild" if geodesics == "pseudo" else f"kerr(spin={spin})"
    out = {
        "metric": f"Mrays/s 1080p {label}+disk (full pipeline)",
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
    if march_mode in ("pallas", "pallas_interpret"):
        # K-slot crossing-drop accounting (the silent-loss number the
        # record-don't-shade design depends on) — reported continuously
        # with every bench, not just in tests.  Measured at a coarser
        # resolution: the overflow fraction is a property of the scene
        # geometry (edge-on disk wraps), not of the pixel grid, and the
        # dense full-res variant costs a second full compile.
        from bhx.config import RenderConfig
        from bhx.scene import Scene
        from bhx.tracer import crossing_overflow_stats

        ocfg = RenderConfig(
            width=width, height=height, use_ladder=False,
            march_mode=march_mode, geodesics=geodesics,
        )
        stats = jax.jit(
            lambda s: crossing_overflow_stats(s, ocfg, 640, 361),
            static_argnums=(),
        )(scene)
        out["overflow_frac"] = round(float(stats["overflow_frac"]), 5)
        out["overflow_dropped_total"] = int(stats["dropped_total"])
        out["max_crossing_count"] = int(stats["max_count"])
    return out


def grad_check(width: int = 320, height: int = 180,
               rel_tol: float = 0.1) -> Dict:
    """On-chip gradient gate (VERDICT r4 missing #4): one reverse-mode
    gradient of a weighted-pixel loss through ``march_mode="pallas"`` ON
    THE DEVICE, checked against central finite differences of the same
    loss.  The custom_vjp backward replays a jnp mirror of the kernel
    substep (march_grad); its premise — forward kernel trajectory ==
    mirror trajectory — is exactly what a Mosaic codegen divergence would
    break, and CPU interpret-mode tests can never see that.  Emitted in
    the bench JSON next to parity_check.

    The gate renders WITHOUT the star sky and disk texture: procedural
    content has feature scales (star splat radius 2.4e-3 uv, Perlin
    octave density 100) below any usable FD step for strongly-lensed
    rays, so on the full scene AD measures real local slopes that FD
    cannot resolve (AD/FD disagreed 2000x while both were "correct" —
    see GRAD_CONFIG4.json fd_stability).  Geometry + density shading is
    smooth at eps=1e-3, making AD == FD a meaningful correctness gate
    for the kernel-path adjoint.
    """
    import dataclasses

    import jax.numpy as jnp

    from bhx.config import BloomConfig, FxaaConfig, RenderConfig
    from bhx.pipeline import render
    from bhx.scene import Scene

    scene = Scene.default()
    cfg = RenderConfig(
        width=width, height=height, use_ladder=False, max_iterations=600,
        march_mode="pallas", fxaa=FxaaConfig(enabled=False),
        bloom=BloomConfig(enabled=False), tonemap=False,
        pallas_bwd_chunks=2,
        show_sky=False, show_disk_texture=False,
    )
    import numpy as np

    def img_of(mass):
        bh = dataclasses.replace(scene.black_hole, mass=mass)
        return render(dataclasses.replace(scene, black_hole=bh), cfg)

    img_jit = jax.jit(img_of)

    # FD-stable pixel mask (tests/test_grad.py's discipline, lifted to a
    # scalar gate): hard visibility edges (disk silhouette, shadow rim)
    # move with mass — their FD shows O(1/eps) boundary terms that
    # interior-only AD does not model (stop-gradient'ed masks,
    # march_grad module docs).  Pixels where FD(eps) and FD(eps/2)
    # agree are exactly the piecewise-smooth set; the gate compares AD
    # and FD of the SAME stable-masked weighted loss, so both sides
    # measure the interior derivative the design defines.
    e1, e2 = 1e-3, 5e-4
    fdimg = {}
    for e in (e1, e2):
        p = np.asarray(img_jit(jnp.float32(0.5 + e)))
        m = np.asarray(img_jit(jnp.float32(0.5 - e)))
        fdimg[e] = (p - m) / (2.0 * e)
    scale = np.maximum(np.abs(fdimg[e1]), np.abs(fdimg[e2]))
    stable = np.abs(fdimg[e1] - fdimg[e2]) <= 0.05 * scale + 1e-4
    stable_frac = float(stable.mean())
    # Richardson extrapolation (kills the O(e^2) curvature bias of the
    # central difference near the photon ring).
    fd_ref = (4.0 * fdimg[e2] - fdimg[e1]) / 3.0
    # Fixed pseudo-random weights make the cotangent direction-rich (a
    # mean alone can hide sign errors that cancel).
    w = np.random.default_rng(7).random((height, width, 3)) * stable
    w_j = jnp.asarray(w, jnp.float32)

    def loss(mass):
        return jnp.sum(img_of(mass) * w_j) / (width * height)

    t0 = time.perf_counter()
    ad = float(jax.jit(jax.grad(loss))(jnp.float32(0.5)))
    grad_s = time.perf_counter() - t0
    fd = float(np.sum(fd_ref * w)) / (width * height)
    rel = abs(ad - fd) / max(abs(ad), abs(fd), 1e-8)
    return {
        "grad_ad": round(ad, 6),
        "grad_fd": round(fd, 6),
        "grad_stable_frac": round(stable_frac, 4),
        "grad_rel_err": round(rel, 5),
        "grad_first_call_s": round(grad_s, 1),
        "grad_ok": bool(stable_frac > 0.5 and rel < rel_tol),
    }


def parity_check(width: int = 192, height: int = 108,
                 atol: float = 2e-2, max_bad_frac: float = 0.02) -> Dict:
    """On-chip numerics gate: the pallas kernel pipeline must reproduce the
    jnp reference pipeline (same scene, dense trace) up to tile-exit
    ordering noise.  Complements the CPU interpret-mode parity tests
    (tests/test_pallas.py), which never touch real Mosaic codegen.
    """
    import dataclasses

    import numpy as np

    from bhx.config import BloomConfig, FxaaConfig, RenderConfig
    from bhx.pipeline import render_jit
    from bhx.scene import Scene

    scene = Scene.default()
    base = RenderConfig(
        width=width, height=height, use_ladder=False, max_iterations=600,
        fxaa=FxaaConfig(enabled=False), bloom=BloomConfig(enabled=False),
        tonemap=False,
    )
    img_pl = np.asarray(render_jit(scene, base.replace(march_mode="pallas")))
    img_jnp = np.asarray(render_jit(scene, base.replace(march_mode="fast")))
    bad = float((np.abs(img_pl - img_jnp) > atol).any(-1).mean())
    finite = bool(np.isfinite(img_pl).all())
    return {
        "parity_bad_frac": round(bad, 5),
        "parity_ok": bool(finite and bad <= max_bad_frac),
    }
