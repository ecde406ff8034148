"""Geodesic physics: bending acceleration and conserved quantities.

The reference implements a pseudo-Newtonian second-order approximation of
null geodesics (ray.wgsl:401-403):

    f(pos) = -1.5 * h^2 * (pos - bh) / |pos - bh|^5,   h^2 = |pos x dir|^2

Via the Binet equation, a central force -K/r^4 with angular momentum h gives
u'' + u = (K/h^2) u^2, while the exact Schwarzschild photon-orbit equation
is u'' + u = 3 M u^2.  The reference's K = 1.5 h^2 therefore bends light
like a hole of mass M_eff = 0.5 — consistent with its opaque sphere of
radius 1 (= 2 * M_eff, the Schwarzschild radius), and verified numerically:
its critical capture parameter is 3*sqrt(3)*0.5 = 2.598, not 5.196.

We make mass physical:

    f(pos) = -3 * M * h^2 * r_vec / r^5

so capture happens at b = 3*sqrt(3)*M and weak-field deflection is 4M/b
(both tested).  The default scene uses M = 0.5, reproducing the reference's
bending exactly.

Other divergences from the reference (documented per SURVEY.md §2 row 15):
  * the reference computes h^2 from the *absolute* position
    (``cross(ray.position, ray.direction)``, ray.wgsl:419,470) which is only
    correct for a black hole at the origin; we use pos - bh_position.
  * ``dist`` is recomputed from the current position at every RK stage
    (the reference freezes it per step, ray.wgsl:410,429-433).

All functions are shaped (..., 3) -> broadcast over any batch of rays and
usable both in plain jnp code and inside Pallas kernel bodies (they only use
elementwise math).
"""

from __future__ import annotations

import jax.numpy as jnp


def angular_momentum_sq(rel_pos, direction):
    """Conserved h^2 = |r x v|^2 for a ray (batched over leading dims)."""
    cx = rel_pos[..., 1] * direction[..., 2] - rel_pos[..., 2] * direction[..., 1]
    cy = rel_pos[..., 2] * direction[..., 0] - rel_pos[..., 0] * direction[..., 2]
    cz = rel_pos[..., 0] * direction[..., 1] - rel_pos[..., 1] * direction[..., 0]
    return cx * cx + cy * cy + cz * cz


def geodesic_accel(rel_pos, h2, mass, eps: float = 1e-12):
    """Bending acceleration  -3 * M * h2 * rel_pos / |rel_pos|^5.

    ``rel_pos`` is position relative to the black hole, shape (..., 3);
    ``h2`` shape (...,); ``mass`` scalar or (...,).  M = 0.5 reproduces the
    reference shader exactly (see module docstring).

    The r^-5 pole at the singularity is regularized with ``eps`` — rays
    inside the horizon are terminated by the opaque-sphere hit test anyway,
    so the clamp never affects visible output.
    """
    r2 = jnp.sum(rel_pos * rel_pos, axis=-1)
    inv_r5 = (r2 + eps) ** -2.5
    scale = (-3.0) * mass * h2 * inv_r5
    return scale[..., None] * rel_pos


def geodesic_accel_components(rx, ry, rz, h2, mass, eps: float = 1e-12):
    """Component-wise variant for SoA layouts (Pallas kernels).

    Same math as :func:`geodesic_accel` with rel_pos given as three
    same-shaped arrays; returns (ax, ay, az).
    """
    r2 = rx * rx + ry * ry + rz * rz
    inv_r5 = (r2 + eps) ** -2.5
    scale = (-3.0) * mass * h2 * inv_r5
    return scale * rx, scale * ry, scale * rz


def photon_sphere_radius(mass):
    """r_ph = 3M for Schwarzschild — used by physics tests."""
    return 3.0 * mass


def critical_impact_parameter(mass):
    """b_crit = 3*sqrt(3)*M: rays with smaller impact parameter are captured."""
    return 3.0 * jnp.sqrt(3.0) * mass


def weak_field_deflection(mass, impact_parameter):
    """First-order deflection angle 4M/b for a ray passing far from the hole."""
    return 4.0 * mass / impact_parameter
