"""Shared test fixtures: tiny scenes/configs that keep XLA compile cheap.

Each distinct (config, scene-structure) pair costs a full trace compile
(~1-2 min on the 2-vCPU test box), so tests reuse these instances to share
the jit cache within the pytest process.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from bhx.config import BloomConfig, FxaaConfig, Integrator, LadderConfig, RenderConfig
from bhx.scene import Camera, Scene
from bhx.geometry.obj import make_mesh

# Low-res procedural assets for tests (cheap to generate, cached on disk).
TEST_ASSETS = dict(disk_size=64, sky=(128, 64))


@lru_cache(maxsize=1)
def small_scene() -> Scene:
    from bhx import assets

    return Scene.default(
        disk_texture=assets.disk_texture(64),
        sky_texture=assets.sky_texture(128, 64, num_stars=200),
        temp_lut=assets.blackbody_lut(64, 16),
    )


def outside_camera() -> Camera:
    """Camera outside the relativity sphere (radius 20)."""
    return Camera(
        position=jnp.asarray([0.0, 0.0, -40.0], jnp.float32),
        forward=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        fov=jnp.float32(1.0),
    )


# One small forward config reused by most tracer/pipeline tests.
FAST_CFG = RenderConfig(
    width=64,
    height=36,
    use_ladder=False,
    max_iterations=300,
    integrator=Integrator.EULER,
    march_mode="fast",
    fxaa=FxaaConfig(enabled=False),
    bloom=BloomConfig(enabled=False),
    tonemap=False,
)

# Differentiable config (checkpointed scan).
DIFF_CFG = dataclasses.replace(
    FAST_CFG, march_mode="diff", max_iterations=200, checkpoint_every=50
)

# Ladder config at small scale.
LADDER_CFG = dataclasses.replace(
    FAST_CFG,
    use_ladder=True,
    width=85,
    height=49,
    ladder=LadderConfig(base=(22, 13), multiplier=3, levels=3),
)


def cube_mesh(position=(6.0, 0.0, -30.0), half=1.5, name="cube"):
    v = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float32
    ) * half
    faces = [
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
        [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ]
    tri = np.array(faces, np.int32)
    fn = []
    for t in range(len(faces)):
        a, b, c = v[tri[t]]
        n = np.cross(b - a, c - a)
        fn.append(n / np.linalg.norm(n))
    norm = np.array(fn, np.float32)
    tn = np.arange(len(faces), dtype=np.int32)[:, None] * np.ones((1, 3), np.int32)
    # scale=1, no flip: vertices given directly in world units.
    return make_mesh((v, norm, tri, tn), position=position, name=name,
                     scale=1.0, flip_y=False)
