#!/usr/bin/env python
"""Measure TPU gather throughput for the texture-sampling shapes (dev tool)."""

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


def timed(f, *a):
    force(f(*a))
    t0 = time.perf_counter()
    force(f(*a))
    return time.perf_counter() - t0


def main():
    M = 2 * 1024 * 1024   # table rows (sky-sized quad pack)
    N = 2 * 1024 * 1024   # samples
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, M)
    print(f"device: {jax.devices()[0].device_kind}  M={M}  N={N}")

    # 1D gather (per-channel plan): one element per row
    t1 = jnp.arange(M, dtype=jnp.float32)
    f = jax.jit(lambda i: t1[i])
    print(f"1D (M,)[idx]                 : {timed(f, idx)*1e3:8.1f} ms")

    f12 = jax.jit(lambda i: sum(t1[i] for _ in range(12)))
    print(f"12x 1D gathers               : {timed(f12, idx)*1e3:8.1f} ms")

    # row gathers of increasing width
    for w in (8, 16, 128):
        tw = jnp.ones((M, w), jnp.float32)
        f = jax.jit(lambda i, t=tw: t[i])
        print(f"row (M,{w:3d})[idx]            : {timed(f, idx)*1e3:8.1f} ms")

    # row gather (M,16) chunked with lax.map
    t16 = jnp.ones((M, 16), jnp.float32)

    def chunked(i, chunks):
        ic = i.reshape(chunks, -1)
        return jax.lax.map(lambda ii: t16[ii], ic).reshape(-1, 16)

    for chunks in (4, 16):
        f = jax.jit(lambda i, c=chunks: chunked(i, c))
        print(f"row (M,16) lax.map x{chunks:3d}      : {timed(f, idx)*1e3:8.1f} ms")

    # the old (M,2,2,3) shape
    t223 = jnp.ones((M, 2, 2, 3), jnp.float32)
    f = jax.jit(lambda i: t223[i])
    print(f"row (M,2,2,3)[idx]           : {timed(f, idx)*1e3:8.1f} ms")

    # take_along_axis variant
    f = jax.jit(lambda i: jnp.take(t16, i, axis=0))
    print(f"take (M,16) axis0            : {timed(f, idx)*1e3:8.1f} ms")

    # one-hot matmul through the MXU for a SMALL table (LUT-sized)
    Msmall = 16384
    tsm = jnp.ones((Msmall, 16), jnp.float32)
    ism = idx % Msmall

    def onehot_mm(i):
        oh = jax.nn.one_hot(i, Msmall, dtype=jnp.bfloat16)
        return oh @ tsm.astype(jnp.bfloat16)

    f = jax.jit(onehot_mm)
    print(f"one-hot matmul (16K,16)      : {timed(f, ism)*1e3:8.1f} ms")

    f = jax.jit(lambda i: tsm[i])
    print(f"row (16K,16)[idx]            : {timed(f, ism)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
