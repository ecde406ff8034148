"""Pallas march kernel vs the jnp reference march (interpret mode on CPU).

The kernel's record-crossings design must reproduce the jnp tracer's output
(same physics, same compositing) — allclose over the whole image.
"""

import dataclasses

import numpy as np
import pytest

from bhx.config import Integrator
from bhx.tracer import trace_image

from tests.common import FAST_CFG, small_scene


def _compare(cfg_jnp, atol=3e-3, frac=0.01):
    scene = small_scene()
    # vote_every=4 (= the kernel's unroll) gives exact step budgets so the
    # comparison is not polluted by vote-interval overrun on capped rays.
    # Small tiles: interpret-mode cost scales with padded lane count, and
    # the TPU-swept defaults (64 sublanes) pad 1296 rays to 8192.
    cfg_pl = dataclasses.replace(
        cfg_jnp, march_mode="pallas_interpret", pallas_vote_every=4,
        pallas_sublanes=8, pallas_unroll=4,
    )
    img_jnp = np.asarray(trace_image(scene, cfg_jnp, 48, 27))
    img_pl = np.asarray(trace_image(scene, cfg_pl, 48, 27))
    # Allow a tiny fraction of pixels to differ (the kernel's conservative
    # early-exit bound can run a borderline ray a few extra steps).
    bad = (np.abs(img_jnp - img_pl) > atol).any(-1).mean()
    assert bad <= frac, f"{bad:.2%} pixels differ"


@pytest.mark.slow
def test_pallas_euler_matches_jnp():
    _compare(dataclasses.replace(FAST_CFG, max_iterations=200))


@pytest.mark.slow
def test_pallas_rk45_matches_jnp():
    _compare(
        dataclasses.replace(
            FAST_CFG, integrator=Integrator.RK45, max_iterations=200
        )
    )


@pytest.mark.slow
def test_pallas_kerr_matches_jnp():
    """The in-kernel Kerr march (Hamiltonian RK4, Kerr-Schild coordinates)
    must reproduce the jnp bhx.kerr path — same physics, same deferred
    compositing (the reference has no spin at all; its force is
    ray.wgsl:401-403)."""
    import jax.numpy as jnp

    scene = small_scene()
    bh = dataclasses.replace(scene.black_hole, spin=jnp.float32(0.8))
    scene_k = dataclasses.replace(scene, black_hole=bh)
    cfg_jnp = dataclasses.replace(
        FAST_CFG, geodesics="kerr", max_iterations=200
    )
    cfg_pl = dataclasses.replace(
        cfg_jnp, march_mode="pallas_interpret", pallas_vote_every=4,
        pallas_sublanes=8, pallas_unroll=4,
    )
    img_jnp = np.asarray(trace_image(scene_k, cfg_jnp, 48, 27))
    img_pl = np.asarray(trace_image(scene_k, cfg_pl, 48, 27))
    # Kerr's adaptive step size makes step counts (and hence the few-iters
    # alpha classification) slightly more fragile than Euler's fixed h;
    # allow a slightly larger differing-pixel fraction.
    bad = (np.abs(img_jnp - img_pl) > 3e-3).any(-1).mean()
    assert bad <= 0.03, f"{bad:.2%} pixels differ"


def test_shade_kernel_matches_jnp_reference():
    """shade_ingredients (interpret) == its jnp reference on synthetic
    crossing slots (the kernel's atan2 polynomial is the only divergence,
    ~1e-5)."""
    import jax.numpy as jnp

    from bhx.kernels.shade_pallas import (
        ShadeKernelConfig, _ingredients_jnp, pack_shade_params,
        shade_ingredients,
    )

    scene = small_scene()
    bh = scene.black_hole
    rot, _ = bh.disk_frame()
    params = pack_shade_params(bh, rot, scene.time)
    rng = np.random.default_rng(0)
    n, K = 257, 4
    pos = rng.uniform(-9, 9, (K, 3, n)).astype(np.float32)
    dirs = rng.normal(size=(K, 3, n)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    valid = (rng.uniform(size=(K, n)) < 0.5).astype(np.float32)
    # Tuple-of-rows slots: K*7 (n,) rows [hx hy hz dx dy dz valid] / slot.
    slots = tuple(
        jnp.asarray(
            np.concatenate(
                [pos, dirs, valid[:, None, :]], axis=1
            ).reshape(K * 7, n)[i]
        )
        for i in range(K * 7)
    )
    cam = jnp.asarray(rng.uniform(15, 25, (n,)).astype(np.float32))
    kcfg = ShadeKernelConfig(max_crossings=K, sublanes=8, interpret=True)
    ing_k = np.stack(
        [np.asarray(r) for r in shade_ingredients(slots, cam, params, kcfg)]
    ).reshape(K, 7, n)
    ing_j = np.stack(
        [np.asarray(r) for r in _ingredients_jnp(slots, cam, params, kcfg)]
    ).reshape(K, 7, n)
    # Kernel zeros the ingredients of invalid slots in fully-invalid tiles;
    # compare only valid ones (invalid slots are masked in the composite).
    m = np.broadcast_to((valid > 0.5)[:, None, :], ing_k.shape)
    assert np.isfinite(ing_k).all()
    np.testing.assert_allclose(ing_k[m], ing_j[m], atol=2e-3, rtol=1e-3)


def test_sky_kernel_matches_jnp_reference():
    """sky_finalize (interpret) == its jnp reference on random records."""
    import jax.numpy as jnp

    from bhx.kernels.shade_pallas import (
        SkyKernelConfig, _sky_finalize_jnp, sky_finalize,
    )

    rng = np.random.default_rng(1)
    n = 300
    rec = rng.uniform(0, 1, (n, 8)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rec[:, 5:8] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rec = jnp.asarray(rec)
    kcfg = SkyKernelConfig(sublanes=8, interpret=True)
    out_k = np.asarray(sky_finalize(rec, kcfg))
    out_j = np.asarray(_sky_finalize_jnp(rec, kcfg))
    assert np.isfinite(out_k).all()
    # The kernel's polynomial atan2 shifts star-splat uv by ~1e-5; near a
    # splat edge that can move a sample across the quadratic falloff, so
    # compare with a small absolute tolerance and a tiny outlier allowance.
    err = np.abs(out_k - out_j)
    assert np.quantile(err, 0.995) < 2e-3
    assert err.max() < 0.2


@pytest.mark.slow
def test_crossing_overflow_bounded_edge_on_disk():
    """K=4 crossing slots must suffice even for a near-edge-on disk with
    strong lensing: <0.1% of rays may drop a crossing (VERDICT r1 weak #6;
    reference composites unboundedly, ray.wgsl:571-580)."""
    import jax.numpy as jnp

    from bhx.scene import Camera
    from bhx.tracer import crossing_overflow_stats

    scene = small_scene()
    # Camera nearly in the disk plane, looking at the hole.
    cam = Camera(
        position=jnp.asarray([0.0, 0.35, -30.0], jnp.float32),
        forward=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        fov=jnp.float32(1.2),
    )
    scene = dataclasses.replace(scene, camera=cam)
    cfg = dataclasses.replace(
        FAST_CFG, march_mode="pallas_interpret", max_iterations=400,
        pallas_vote_every=4, pallas_sublanes=8, pallas_unroll=4,
    )
    stats = crossing_overflow_stats(scene, cfg, 64, 36)
    frac = float(stats["overflow_frac"])
    assert frac < 1e-3, f"{frac:.3%} rays dropped a crossing (K too small)"
