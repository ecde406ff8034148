#!/usr/bin/env python
"""Stage-level timing of the real default 1080p frame (dev tool).

Times each stage of the exact bench pipeline (ladder levels, sky, post
chain) with a checksum sync (block_until_ready does not block on the
tunneled axon TPU platform).  Writes scripts/out/PROFILE_STAGES.json so
perf claims have a committed artifact (VERDICT r2 weak #2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
    from bhx.pipeline import (
        _refine_level,
        ladder_trace_rows,
        render,
        trace_image_record_rows,
    )
    from bhx.post import bloom_chain_chw, fxaa_pass_chw, mix_pass, tonemap_pass
    from bhx.kernels.shade_pallas import SkyKernelConfig, sky_finalize_rows
    from bhx.scene import Scene

    W, H = 1918, 1081
    scene = Scene.default()
    cfg = RenderConfig(
        width=W, height=H, use_ladder=True,
        ladder=LadderConfig.for_resolution(W, H, 4), march_mode="pallas",
    )
    lad = cfg.ladder_for_output()

    lat = timed(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    results = {"device": jax.devices()[0].device_kind, "sync_ms": lat * 1e3}
    print(f"sync latency {lat*1e3:.1f} ms (subtracted)")

    def report(label, t):
        ms = max(t - lat, 0.0) * 1e3
        results[label] = ms
        print(f"{label:28s}: {ms:8.1f} ms")

    # Level 0 + each refine level, cumulative (each jitted separately).
    w0, h0 = lad.resolution(0)
    f0 = jax.jit(lambda s: trace_image_record_rows(s, cfg, w0, h0))
    report("L0 trace", timed(f0, scene))
    rec = f0(scene)
    recs = [rec]
    for lvl in range(1, lad.levels):
        w, h = lad.resolution(lvl)
        f = jax.jit(
            lambda prev, s, w=w, h=h: _refine_level(prev, s, cfg, w, h)
        )
        report(f"L{lvl} refine {w}x{h}", timed(f, recs[-1], scene))
        recs.append(f(recs[-1], scene))

    f = jax.jit(lambda s: ladder_trace_rows(s, cfg))
    report("ladder total", timed(f, scene))

    rec_full = recs[-1]
    skk = SkyKernelConfig(show_sky=True, sublanes=cfg.pallas_shade_sublanes)

    def skyf(rows):
        flat = tuple(r.reshape(-1) for r in rows)
        out = sky_finalize_rows(flat, skk)
        h, w = rows[0].shape
        return jnp.stack([o.reshape(h, w) for o in out])

    f = jax.jit(skyf)
    report("sky finalize", timed(f, rec_full))
    rgb = f(rec_full)[:, :H, :W]

    f = jax.jit(lambda x: bloom_chain_chw(x, cfg.bloom))
    report("bloom", timed(f, rgb))
    bl = f(rgb)
    f = jax.jit(lambda x, b: tonemap_pass(
        mix_pass(x, b, cfg.bloom.mix_ratio), channel_major=True))
    report("mix+tonemap", timed(f, rgb, bl))
    mixed = f(rgb, bl)
    f = jax.jit(lambda x: fxaa_pass_chw(x, cfg.fxaa))
    report("fxaa", timed(f, mixed))

    f = jax.jit(lambda s: render(s, cfg))
    report("full frame", timed(f, scene))

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out", "PROFILE_STAGES.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
