"""Exact Kerr null geodesics via an autodiff Hamiltonian (new capability).

The reference bends rays with a pseudo-Newtonian force (ray.wgsl:401-403 —
no spin, approximate).  This module adds *exact* geodesics in Kerr
spacetime (BASELINE.json north star: "Schwarzschild/Kerr"), built the JAX
way: instead of hand-deriving the 6 Christoffel-symbol equations, we write
the super-Hamiltonian

    H(x, p) = 1/2 g^{mu nu}(x) p_mu p_nu

in Kerr-Schild Cartesian coordinates, where the inverse metric has the
closed form  g^{mu nu} = eta^{mu nu} - f l^mu l^nu  with

    r^2 = ( (rho^2 - a^2) + sqrt((rho^2 - a^2)^2 + 4 a^2 z^2) ) / 2
    f   = 2 M r^3 / (r^4 + a^2 z^2)
    l_mu = (1, (r x + a y)/(r^2 + a^2), (r y - a x)/(r^2 + a^2), z / r)

and obtain Hamilton's equations by automatic differentiation:

    dx/dlam =  dH/dp        (analytic in p — quadratic form)
    dp/dlam = -dH/dx        (jax.grad of H in x)

Photons satisfy H = 0; the conserved energy is p_t = -1 (stationary
metric), so the state is (x, p_spatial) in R^6.  a = 0 reduces to exact
Schwarzschild in Kerr-Schild form — the capture impact parameter is
3*sqrt(3)*M (tested), and frame dragging for a > 0 makes prograde and
retrograde capture radii asymmetric (tested).

Spin is dimensionless: the physical spin parameter is a = spin * M.
Everything is differentiable w.r.t. mass and spin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _kerr_scalars(x, mass, a):
    """(r, f, l_spatial) for position x (..., 3)."""
    px, py, pz = x[..., 0], x[..., 1], x[..., 2]
    rho2 = px * px + py * py + pz * pz
    a2 = a * a
    b = rho2 - a2
    r2 = 0.5 * (b + jnp.sqrt(b * b + 4.0 * a2 * pz * pz + 1e-20))
    r2 = jnp.maximum(r2, 1e-12)
    r = jnp.sqrt(r2)
    f = 2.0 * mass * r2 * r / (r2 * r2 + a2 * pz * pz + 1e-20)
    denom = r2 + a2
    lx = (r * px + a * py) / denom
    ly = (r * py - a * px) / denom
    lz = pz / r
    return r, f, jnp.stack([lx, ly, lz], axis=-1)


def hamiltonian(x, p, mass, spin):
    """Super-Hamiltonian H(x, p) with p_t = -1 folded in.

    x, p: (..., 3).  H = 1/2 (|p|^2 - 1 - f (1 + l . p)^2), using
    l^mu p_mu = l^t p_t + l . p = 1 + l . p for p_t = -1 (eta^{tt} = -1,
    l_t = 1).
    """
    a = spin * mass
    _, f, l = _kerr_scalars(x, mass, a)
    lp = 1.0 + jnp.sum(l * p, axis=-1)
    return 0.5 * (jnp.sum(p * p, axis=-1) - 1.0 - f * lp * lp)


def null_momentum(x, direction, mass, spin):
    """Spatial momentum p with H(x, p) = 0 along ``direction`` (unit).

    Solves the quadratic (1 - f c^2) s^2 - 2 f c s - (1 + f) = 0 for the
    scale s with p = s * direction, c = l . direction, taking the root with
    s > 0 (future-directed photon).
    """
    a = spin * mass
    _, f, l = _kerr_scalars(x, mass, a)
    c = jnp.sum(l * direction, axis=-1)
    qa = 1.0 - f * c * c
    qb = -2.0 * f * c
    qc = -(1.0 + f)
    disc = jnp.sqrt(jnp.maximum(qb * qb - 4.0 * qa * qc, 0.0))
    s = (-qb + disc) / (2.0 * qa)
    return direction * s[..., None]


_dHdx = jax.grad(lambda x, p, m, s: jnp.sum(hamiltonian(x, p, m, s)), argnums=0)


def rhs(x, p, mass, spin):
    """(dx/dlam, dp/dlam) — Hamilton's equations, dH/dx by autodiff.

    dH/dp is analytic:  p - f (1 + l.p) l.
    """
    a = spin * mass
    _, f, l = _kerr_scalars(x, mass, a)
    lp = 1.0 + jnp.sum(l * p, axis=-1)
    dxdl = p - (f * lp)[..., None] * l
    dpdl = -_dHdx(x, p, mass, spin)
    return dxdl, dpdl


def horizon_radius(mass, spin):
    """Outer horizon r+ = M (1 + sqrt(1 - spin^2)) in Boyer-Lindquist r."""
    return mass * (1.0 + jnp.sqrt(jnp.clip(1.0 - spin * spin, 0.0, 1.0)))


def bl_radius(x, mass, spin):
    """Kerr-Schild/Boyer-Lindquist radial coordinate r at position x."""
    r, _, _ = _kerr_scalars(x, mass, spin * mass)
    return r


def step_rk4(x, p, h, mass, spin):
    """One classical RK4 step of Hamilton's equations (fixed step).

    The march loop drives step size from the field strength; plain RK4 is
    accurate enough between the adaptive-h decisions and costs 4 RHS evals.
    """
    hh = h[..., None] if jnp.ndim(h) else h

    k1x, k1p = rhs(x, p, mass, spin)
    k2x, k2p = rhs(x + 0.5 * hh * k1x, p + 0.5 * hh * k1p, mass, spin)
    k3x, k3p = rhs(x + 0.5 * hh * k2x, p + 0.5 * hh * k2p, mass, spin)
    k4x, k4p = rhs(x + hh * k3x, p + hh * k3p, mass, spin)
    nx = x + (hh / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x)
    np_ = p + (hh / 6.0) * (k1p + 2 * k2p + 2 * k3p + k4p)
    return nx, np_


def adaptive_h(x, mass, spin, h_base, h_min=2e-3, h_max=1.0):
    """Field-strength-scaled step size: h ~ h_base * (r / 3M)^1.5 clipped.

    Near the photon sphere the geodesic curvature scales like M/r^2; this
    keeps the local truncation error roughly uniform without an embedded
    error estimate (the RK4 step is 5th-order locally).
    """
    r = bl_radius(x, mass, spin)
    scale = jnp.clip((r / (3.0 * mass)) ** 1.5, 0.0, None)
    return jnp.clip(h_base * scale, h_min, h_max)
