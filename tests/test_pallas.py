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
    cfg_pl = dataclasses.replace(
        cfg_jnp, march_mode="pallas_interpret", pallas_vote_every=4
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
