#!/usr/bin/env python
"""Bisect _shade_deferred + march-wrapper glue at 1080p scale (dev tool)."""

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
    from bhx.config import RenderConfig
    from bhx.kernels.shade_pallas import (
        ShadeKernelConfig, composite_ingredients, pack_shade_params,
        shade_ingredients, _ingredients_pallas,
    )
    from bhx.kernels.march_pallas import (
        MarchKernelConfig, march_pallas, pack_params,
    )
    from bhx.scene import Scene

    W, H = 1918, 1081
    n = W * H
    scene = Scene.default()
    cfg = RenderConfig(width=W, height=H, march_mode="pallas")
    bh = scene.black_hole
    rot_mat, disk_normal = bh.disk_frame()
    lat = timed(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(f"sync latency {lat*1e3:.1f} ms (subtracted)")

    def report(label, t):
        print(f"{label:40s}: {max(t - lat, 0.0)*1e3:8.1f} ms")

    # Realistic slots: ~15% of rays have 1-2 crossings, clustered.
    rng = np.random.default_rng(0)
    K = 4
    slots = np.zeros((K * 7, n), np.float32)  # field-major
    row = np.arange(n) // W
    band = (row > H // 3) & (row < 2 * H // 3)
    has = band & (rng.uniform(size=n) < 0.45)
    pos = rng.uniform(-9, 9, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    slots[0:3, has] = pos[has].T
    slots[3:6, has] = dirs[has].T
    slots[6, has] = 1.0
    print(f"rays with a crossing: {has.mean():.1%}")
    slots = jnp.asarray(slots)
    cam = jnp.full((n,), 19.0, jnp.float32)
    valid = slots.reshape(K, 7, n)[:, 6] > 0.5

    skk = ShadeKernelConfig(max_crossings=K, sublanes=cfg.pallas_shade_sublanes)
    params = pack_shade_params(bh, rot_mat, scene.time)

    f = jax.jit(lambda s, c: _ingredients_pallas(s, c, params, skk))
    report("shade_ingredients kernel", timed(f, slots, cam))
    ing = f(slots, cam)

    f = jax.jit(lambda i, v: composite_ingredients(i, v, scene.disk_gain, skk))
    report("composite_ingredients (w/ gain)", timed(f, ing, valid))

    f = jax.jit(lambda i, v: composite_ingredients(i, v, None, skk))
    report("composite_ingredients (no gain)", timed(f, ing, valid))

    # Gain sample alone.
    from bhx.shading import sample_grid_mxu
    f = jax.jit(
        lambda i: sample_grid_mxu(
            scene.disk_gain, i.reshape(K, 7, n)[:, 5], i.reshape(K, 7, n)[:, 6]
        )
    )
    report("sample_grid_mxu (n,K)", timed(f, ing))

    # March wrapper glue: transpose/relayout costs at (npad, F) scale.
    kcfg = MarchKernelConfig(
        integrator="euler", max_iterations=cfg.max_iterations,
        vote_every=cfg.pallas_vote_every, sublanes=cfg.pallas_sublanes,
        unroll=cfg.pallas_unroll,
    )
    npad = ((n + kcfg.lanes - 1) // kcfg.lanes) * kcfg.lanes
    tiles = npad // kcfg.lanes
    s8 = kcfg.sublanes
    rays = jnp.zeros((npad, 10), jnp.float32)
    f = jax.jit(
        lambda r: r.reshape(tiles, s8, 128, 10).transpose(0, 3, 1, 2)
    )
    report("rays relayout in (npad,10)", timed(f, rays))
    out_t = jnp.zeros((tiles, 41, s8, 128), jnp.float32)
    f = jax.jit(lambda o: o.transpose(0, 2, 3, 1).reshape(npad, 41))
    report("out relayout (npad,41)", timed(f, out_t))

    # 13-field concat.
    cols = [jnp.zeros((npad, 3), jnp.float32), jnp.zeros((npad, 3), jnp.float32)] + [
        jnp.zeros((npad, 1), jnp.float32) for _ in range(4)
    ]
    f = jax.jit(lambda *c: jnp.concatenate(c, axis=-1))
    report("rays concat (npad,10)", timed(f, *cols))


if __name__ == "__main__":
    main()
