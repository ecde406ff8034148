"""Image + scene I/O: PNG save/load, scene/config checkpoints.

Covers the reference's save path (texture_to_output_buffer + PNG encode,
renderer/mod.rs:435-486 — there a 256-byte-row-aligned GPU readback; here a
single device_get) and adds what it lacks: scene/config serialization and
render checkpoints (SURVEY.md §5 "Checkpoint / resume").
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from bhx.config import RenderConfig
from bhx.scene import Scene


def to_uint8(img) -> np.ndarray:
    a = np.asarray(img)
    return (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img) -> None:
    """img: (H, W, 3|4) float in [0,1] or uint8."""
    from PIL import Image

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = to_uint8(a)
    Image.fromarray(a).save(path)


def load_image(path: str) -> np.ndarray:
    """PNG/JPG -> float32 RGB(A) in [0,1] (reference texture.rs:10-76)."""
    from PIL import Image

    img = Image.open(path)
    return np.asarray(img).astype(np.float32) / 255.0


def save_scene(path: str, scene: Scene, cfg: Optional[RenderConfig] = None) -> None:
    """Scene arrays -> .npz next to a .json of static config."""
    flat: Dict[str, np.ndarray] = {}

    def put(prefix, obj):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if f.name == "meshes":
                continue
            if f.name == "name":
                continue
            flat[f"{prefix}{f.name}"] = np.asarray(v)

    put("camera.", scene.camera)
    put("bh.", scene.black_hole)
    for field in ("disk_texture", "sky_texture", "temp_lut", "time"):
        flat[field] = np.asarray(getattr(scene, field))
    if scene.disk_gain is not None:
        flat["disk_gain"] = np.asarray(scene.disk_gain)
    if scene.materials is not None:
        flat["materials"] = np.asarray(scene.materials)
    for i, mesh in enumerate(scene.meshes):
        put(f"mesh{i}.", mesh)
    flat["num_meshes"] = np.asarray(len(scene.meshes))
    np.savez_compressed(path, **flat)
    if cfg is not None:
        with open(os.path.splitext(path)[0] + ".json", "w") as fp:
            json.dump(config_to_dict(cfg), fp, indent=2, default=str)


def load_scene(path: str) -> Scene:
    import jax.numpy as jnp

    from bhx.scene import BlackHole, Camera, Mesh

    z = np.load(path)

    def get(prefix, cls, extra=None):
        kw = dict(extra or {})
        for f in dataclasses.fields(cls):
            key = f"{prefix}{f.name}"
            if key in z:
                kw[f.name] = jnp.asarray(z[key])
        return cls(**kw)

    meshes = []
    for i in range(int(z["num_meshes"])):
        meshes.append(get(f"mesh{i}.", Mesh, extra={"name": f"mesh{i}"}))
    return Scene(
        camera=get("camera.", Camera),
        black_hole=get("bh.", BlackHole),
        disk_texture=jnp.asarray(z["disk_texture"]),
        sky_texture=jnp.asarray(z["sky_texture"]),
        temp_lut=jnp.asarray(z["temp_lut"]),
        time=jnp.asarray(z["time"]),
        meshes=tuple(meshes),
        disk_gain=jnp.asarray(z["disk_gain"]) if "disk_gain" in z else None,
        materials=jnp.asarray(z["materials"]) if "materials" in z else None,
    )


def config_to_dict(cfg: RenderConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
