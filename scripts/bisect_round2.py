#!/usr/bin/env python
"""Bisect the cost of the (nearly-empty) second tracer round at 1080p.

bisect_dense.py showed rounds=2 costs ~195 ms over rounds=1 even though
almost every ray finishes in round 1.  This times each candidate
component at full-frame scale to find where that glue time goes.
"""

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
    from bhx.kernels.march_pallas import (
        IN_FIELDS, MarchKernelConfig, OUT_FIXED, CROSS_FIELDS,
        march_pallas, pack_params,
    )
    from bhx.scene import Scene
    from bhx.tracer import _merge_slots, camera_rays, trace_rays_record

    W, H = 1918, 1081
    scene = Scene.default()
    base = RenderConfig(width=W, height=H, march_mode="pallas", use_ladder=False)
    o, d = camera_rays(scene.camera, W, H)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    n = W * H
    bh = scene.black_hole
    _, disk_normal = bh.disk_frame()
    params = pack_params(bh, disk_normal, base)
    kcfg = MarchKernelConfig(
        integrator="euler", max_iterations=2000,
        vote_every=base.pallas_vote_every, sublanes=base.pallas_sublanes,
        unroll=base.pallas_unroll)
    lanes = kcfg.lanes
    npad = ((n + lanes - 1) // lanes) * lanes
    K = kcfg.max_crossings

    lat = timed(jax.jit(lambda x: x), jnp.zeros((8, 128)))
    print(f"npad={npad} sync latency {lat*1e3:.1f} ms (subtracted)")

    def report(label, t):
        print(f"{label:40s}: {max(t - lat, 0.0)*1e3:8.1f} ms")

    # 0.1% active rays (the realistic round-2 re-entry set)
    rng = np.random.default_rng(0)
    act = np.zeros((npad,), np.float32)
    act[rng.choice(npad, size=npad // 1000, replace=False)] = 1.0
    act = jnp.asarray(act)

    rays = jnp.zeros((IN_FIELDS, npad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T).at[3:6, :n].set(d.T)
    rays = rays.at[6].set(base.step_size).at[7].set(act).at[8].set(1.0)

    # --- kernel on mostly-dead tiles (no compaction) ---
    f = jax.jit(lambda r: march_pallas(r, params, kcfg))
    report("kernel 0.1% active, uncompacted", timed(f, rays))

    # --- stable partition + both permute gathers ---
    def partition_and_permute(act_f, rays):
        m = (act_f > 0.5).astype(jnp.int32)
        na = jnp.sum(m)
        pos_a = jnp.cumsum(m) - 1
        pos_i = na + jnp.cumsum(1 - m) - 1
        dest = jnp.where(m == 1, pos_a, pos_i)
        nn = act_f.shape[0]
        order = (
            jnp.zeros((nn,), jnp.int32).at[dest].set(
                jnp.arange(nn, dtype=jnp.int32))
        )
        permuted = rays[:, order]  # permute lanes (axis 1), not fields
        fout = OUT_FIXED + CROSS_FIELDS * K
        fake_out = jnp.tile(
            permuted, ((fout + IN_FIELDS - 1) // IN_FIELDS, 1)
        )[:fout]
        return fake_out[:, dest]

    f = jax.jit(partition_and_permute)
    report("partition + 2 permute gathers", timed(f, act, rays))

    # --- compacted kernel (actives in front) ---
    order = np.argsort(-np.asarray(act), kind="stable").astype(np.int32)
    rays_c = rays[:, jnp.asarray(order)]
    report("kernel 0.1% active, compacted", timed(f2 := jax.jit(
        lambda r: march_pallas(r, params, kcfg)), rays_c))

    # --- slot merge at full scale (tuple-of-rows layout) ---
    slots_a = tuple(
        jnp.zeros((npad,), jnp.float32) for _ in range(K * CROSS_FIELDS)
    )
    count_a = jnp.zeros((npad,), jnp.float32)
    f = jax.jit(lambda sa, ca: _merge_slots(sa, ca, sa, ca, K))
    report("merge_slots full frame", timed(f, slots_a, count_a))

    # --- the dozen masked state updates of do_round (field-row indexing) ---
    def state_updates(rays, out, act_f):
        active = act_f > 0.5
        pos = [jnp.where(active, out[i], rays[i]) for i in range(3)]
        direction = [jnp.where(active, out[3 + i], rays[3 + i]) for i in range(3)]
        h_new = jnp.where(active, out[10], rays[6])
        amount_ub = jnp.where(active, out[11], rays[8])
        steps = rays[9] + jnp.where(active, out[6], 0.0)
        closest = jnp.where(active, jnp.minimum(out[7], out[7]), out[7])
        return pos, direction, h_new, amount_ub, steps, closest

    fout = OUT_FIXED + CROSS_FIELDS * K
    out_fake = jnp.zeros((fout, npad), jnp.float32)
    f = jax.jit(state_updates)
    report("do_round masked state updates", timed(f, rays, out_fake, act))

    # --- straight phase dense (round-2 exits) ---
    from bhx.tracer import _init_state, _straight_phase
    state = _init_state(o, d, deferred=True)
    cam_dist = jnp.linalg.norm(o - bh.position, axis=-1)
    f = jax.jit(lambda st: _straight_phase(st, scene, base, cam_dist))
    report("straight phase dense", timed(f, state))

    # --- full second round, for reference ---
    f = jax.jit(lambda s: trace_rays_record(o, d, s, base, rounds=1))
    t1 = timed(f, scene)
    f = jax.jit(lambda s: trace_rays_record(o, d, s, base, rounds=2))
    t2 = timed(f, scene)
    report("record rounds=1", t1)
    report("record rounds=2", t2)
    report("round-2 delta", t2 - t1 + lat)


if __name__ == "__main__":
    main()
