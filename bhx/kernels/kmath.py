"""Math shim for Pallas TPU kernels.

Mosaic lowers most jnp elementwise ops, but not all (atan2 is
unimplemented as of jax 0.8).  The shared procedural-texture code in
bhx.procedural takes an ``xp`` namespace parameter; kernels pass ``KXP``,
which proxies to jnp and overrides the unsupported ops with
Mosaic-lowerable compositions.
"""

from __future__ import annotations

import jax.numpy as jnp

HALF_PI = 1.5707963267948966
PI = 3.141592653589793

# Odd-polynomial minimax fit of atan(w) on [0, 1] (max abs error ~1e-5 rad
# — far below the tracer's fp32 geometry noise).
_ATAN_C = (
    0.99997726,
    -0.33262347,
    0.19354346,
    -0.11643287,
    0.05265332,
    -0.01172120,
)


def atan2(y, x):
    """Polynomial atan2 via first-octant folding.

    Matches jnp.arctan2 on all four quadrants (x = y = 0 returns 0); the
    only divergence is the ~1e-5 rad polynomial error.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    w = num / jnp.maximum(den, 1e-30)
    w2 = w * w
    acc = jnp.full_like(w, _ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        acc = acc * w2 + c
    a = acc * w
    a = jnp.where(ay > ax, HALF_PI - a, a)
    a = jnp.where(x < 0.0, PI - a, a)
    return jnp.where(y < 0.0, -a, a)


class _KernelMath:
    """jnp proxy with kernel-safe overrides (use as ``xp`` in shared code)."""

    arctan2 = staticmethod(atan2)

    def __getattr__(self, name):
        return getattr(jnp, name)


KXP = _KernelMath()
