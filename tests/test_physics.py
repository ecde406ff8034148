"""Physics + integrator unit tests (SURVEY.md §4.1-4.2).

The reference ships zero tests; these validate our geodesic core against
closed-form GR results: straight-line limit, photon-sphere capture at
b_crit = 3*sqrt(3)*M, and the weak-field deflection angle 4M/b.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhx.integrate import euler_step, rk45_step
from bhx.physics import (
    angular_momentum_sq,
    critical_impact_parameter,
    geodesic_accel,
    weak_field_deflection,
)

BH = jnp.zeros(3)


def _march_to_escape(pos, d, mass=1.0, r_escape=400.0, h=0.05, max_steps=200000):
    """Simple host-side Euler march until escape or capture."""
    pos = np.asarray(pos, np.float64)
    d = np.asarray(d, np.float64)
    for _ in range(max_steps):
        r = np.linalg.norm(pos)
        # Captured = reached the horizon sphere (renderer terminates rays
        # there; inside it the r^-5 pseudo-force is numerically wild).
        if r < 2.0 * mass:
            return pos, d, "captured"
        if r > r_escape:
            return pos, d, "escaped"
        h2 = np.sum(np.cross(pos, d) ** 2)
        acc = -3.0 * mass * h2 * pos / r**5
        d = d + acc * h
        d = d / np.linalg.norm(d)
        pos = pos + d * h
    return pos, d, "timeout"


def test_accel_zero_for_radial_rays():
    # Radial rays have h = 0 -> no bending.
    pos = jnp.array([[10.0, 0.0, 0.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    h2 = angular_momentum_sq(pos, d)
    assert float(h2[0]) == pytest.approx(0.0, abs=1e-6)
    acc = geodesic_accel(pos, h2, 1.0)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-8)


def test_accel_points_inward():
    pos = jnp.array([[0.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    h2 = angular_momentum_sq(pos, d)
    acc = geodesic_accel(pos, h2, 1.0)
    assert float(acc[0, 1]) < 0.0  # toward the hole
    assert float(acc[0, 0]) == pytest.approx(0.0, abs=1e-8)


def test_euler_straight_line_limit():
    # Far from the hole the ray must go straight.
    pos = jnp.array([[0.0, 1e4, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    p2, d2 = euler_step(pos, d, 0.1, BH, 1.0)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(pos + d * 0.1), atol=1e-6
    )


def test_rk45_matches_euler_at_small_h():
    pos = jnp.array([[0.0, 6.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    h = jnp.array([1e-3])
    pe, de = euler_step(pos, d, h, BH, 1.0)
    rk = rk45_step(pos, d, h, BH, 1.0)
    assert bool(rk.accept[0])
    np.testing.assert_allclose(np.asarray(rk.direction), np.asarray(de), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rk.pos), np.asarray(pe), atol=1e-5)


def test_rk45_rejects_horrible_steps():
    # A huge step right at the photon sphere must fail the error test.
    pos = jnp.array([[3.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    rk = rk45_step(pos, d, jnp.array([5.0]), BH, 1.0, rtol=1e-6)
    assert not bool(rk.accept[0])
    assert float(rk.h_next[0]) < 5.0


def test_photon_capture_critical_impact_parameter():
    """Rays with b < 3*sqrt(3) captured, b > 3*sqrt(3) escape."""
    b_crit = float(critical_impact_parameter(1.0))
    for b, expect in [(b_crit * 0.9, "captured"), (b_crit * 1.15, "escaped")]:
        pos = [-200.0, b, 0.0]
        d = [1.0, 0.0, 0.0]
        _, _, status = _march_to_escape(pos, d, h=0.02)
        assert status == expect, f"b={b}: {status}"


def test_weak_field_deflection_angle():
    """Deflection at large b matches 4M/b + (15*pi/4)(M/b)^2 (the
    second-order Schwarzschild expansion) within integrator error."""
    b = 50.0
    pos = [-1000.0, b, 0.0]
    d = [1.0, 0.0, 0.0]
    _, d_out, status = _march_to_escape(pos, d, h=0.25, r_escape=2000.0,
                                        max_steps=40000)
    assert status == "escaped"
    angle = np.arccos(np.clip(np.dot(d_out, [1.0, 0.0, 0.0]), -1, 1))
    expected = float(weak_field_deflection(1.0, b)) + 15.0 * np.pi / 4.0 / b**2
    assert angle == pytest.approx(expected, rel=0.03)


def test_h2_conserved_along_exact_geodesic():
    """The integrator approximately conserves |r x v| along the path."""
    pos = jnp.array([[-20.0, 7.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    h0 = float(angular_momentum_sq(pos, d)[0])
    p, dd = pos, d
    for _ in range(2000):
        p, dd = euler_step(p, dd, 0.02, BH, 1.0)
    h1 = float(angular_momentum_sq(p, dd)[0])
    assert h1 == pytest.approx(h0, rel=0.05)
