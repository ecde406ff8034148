"""Exact-Kerr geodesic tests (bhx.kerr): Schwarzschild limit capture at
3*sqrt(3)*M, Hamiltonian conservation, frame-dragging asymmetry, and a
render smoke test."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from bhx import kerr
from tests.common import FAST_CFG, small_scene


def _march(x0, d0, mass=1.0, spin=0.0, h=0.05, max_steps=60000, r_escape=300.0):
    x = jnp.asarray([x0], jnp.float32)
    p = kerr.null_momentum(x, jnp.asarray([d0], jnp.float32), mass, spin)
    r_hor = float(kerr.horizon_radius(mass, spin))
    for i in range(max_steps):
        hh = kerr.adaptive_h(x, mass, spin, h)
        x, p = kerr.step_rk4(x, p, hh, mass, spin)
        r = float(kerr.bl_radius(x, mass, spin)[0])
        if r <= r_hor * 1.02:
            return "captured", x, p
        if r > r_escape:
            return "escaped", x, p
    return "timeout", x, p


def test_hamiltonian_zero_on_null_init():
    x = jnp.asarray([[10.0, 3.0, -2.0]], jnp.float32)
    d = jnp.asarray([[0.6, -0.64, 0.48]], jnp.float32)
    d = d / jnp.linalg.norm(d)
    for spin in (0.0, 0.7):
        p = kerr.null_momentum(x, d, 1.0, spin)
        h = float(kerr.hamiltonian(x, p, 1.0, spin)[0])
        assert abs(h) < 1e-5


def test_hamiltonian_conserved_along_orbit():
    import jax

    x = jnp.asarray([[-30.0, 8.0, 0.5]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    p = kerr.null_momentum(x, d, 1.0, 0.5)

    @jax.jit
    def run(x, p):
        def body(carry, _):
            x, p = carry
            hh = kerr.adaptive_h(x, 1.0, 0.5, 0.05)
            nx, npp = kerr.step_rk4(x, p, hh, 1.0, 0.5)
            # Freeze once the ray leaves the strong-field region (H error
            # is only meaningful along the integrated orbit, and a captured
            # ray would blow up at the ring singularity).
            outside = kerr.bl_radius(nx, 1.0, 0.5) > 100.0
            x = jnp.where(outside[:, None], x, nx)
            p = jnp.where(outside[:, None], p, npp)
            return (x, p), kerr.hamiltonian(x, p, 1.0, 0.5)[0]

        (x, p), hs = jax.lax.scan(body, (x, p), None, length=2000)
        return jnp.max(jnp.abs(hs))

    assert float(run(x, p)) < 5e-3


@pytest.mark.slow
def test_schwarzschild_limit_capture_exact():
    """a=0 Kerr is exact Schwarzschild: capture iff b < 3*sqrt(3)*M."""
    b_crit = 3.0 * np.sqrt(3.0)
    s_in, _, _ = _march([-150.0, 0.97 * b_crit, 0.0], [1.0, 0.0, 0.0])
    s_out, _, _ = _march([-150.0, 1.03 * b_crit, 0.0], [1.0, 0.0, 0.0])
    assert s_in == "captured"
    assert s_out == "escaped"


@pytest.mark.slow
def test_frame_dragging_asymmetry():
    """For a=0.9, prograde photons are captured at smaller |b| than
    retrograde ones (Bardeen: b_pro ~ 2.32 M, b_retro ~ 6.8 M for a=0.9)."""
    spin = 0.9
    # b = +4M on one side, -4M on the other (same |b|, opposite angular
    # momentum about the spin axis z).
    s_plus, _, _ = _march([-150.0, 4.0, 0.0], [1.0, 0.0, 0.0], spin=spin)
    s_minus, _, _ = _march([-150.0, -4.0, 0.0], [1.0, 0.0, 0.0], spin=spin)
    assert {s_plus, s_minus} == {"captured", "escaped"}


@pytest.mark.slow
def test_kerr_render_smoke():
    import numpy as np

    from bhx.tracer import trace_image

    scene = small_scene()
    bh = dataclasses.replace(
        scene.black_hole, spin=jnp.float32(0.7), mass=jnp.float32(0.5)
    )
    scene_k = dataclasses.replace(scene, black_hole=bh)
    cfg = dataclasses.replace(FAST_CFG, geodesics="kerr", max_iterations=400)
    img = np.asarray(trace_image(scene_k, cfg, 48, 27))
    assert np.isfinite(img).all()
    # Shadow present (alpha-1 dark pixels near center).
    assert img[13, 24, 3] == 1.0
    # Differs from the pseudo-Newtonian render.
    img_pseudo = np.asarray(trace_image(scene_k, FAST_CFG, 48, 27))
    assert np.abs(img - img_pseudo).max() > 0.05
