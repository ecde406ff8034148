#!/usr/bin/env python
"""Cold vs warm compile of the default 1080p pipeline (VERDICT r4 #8).

Spawns two child processes compiling the exact bench graph (1080p ladder,
march_mode=pallas): the first against a FRESH compilation-cache directory
(cold — populates it), the second against the same directory (warm — must
hit the persistent XLA/Mosaic cache).  Writes scripts/out/COMPILE_CACHE.json
with both timings and the speedup.  Run on the chip.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import bhx
bhx.enable_compile_cache(os.environ["BHX_CACHE_DIR"])
import dataclasses
import jax, jax.numpy as jnp
from bhx.config import LadderConfig, RenderConfig
from bhx.pipeline import render_jit
from bhx.scene import Scene

W, H = 1918, 1081
scene = Scene.default()
cfg = RenderConfig(width=W, height=H, use_ladder=True,
                   ladder=LadderConfig.for_resolution(W, H, 4),
                   march_mode="pallas")
t0 = time.perf_counter()
img = render_jit(scene, cfg)
print("FIRST_CALL_S", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
print("CHECKSUM", float(jnp.sum(img)), flush=True)
print("SYNC_S", time.perf_counter() - t0, flush=True)
"""


def run_child(cache_dir: str) -> dict:
    env = dict(os.environ, BHX_CACHE_DIR=cache_dir)
    p = subprocess.run(
        [sys.executable, "-u", "-c", CHILD % {"repo": REPO}],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    out = {}
    for line in p.stdout.splitlines():
        parts = line.split()
        if parts and parts[0] in ("FIRST_CALL_S", "SYNC_S", "CHECKSUM"):
            out[parts[0].lower()] = float(parts[1])
    if p.returncode != 0 or "first_call_s" not in out:
        raise RuntimeError(f"child failed rc={p.returncode}:\n{p.stderr[-2000:]}")
    return out


def main():
    import jax

    with tempfile.TemporaryDirectory(prefix="jaxcomp_cold_") as cache:
        cold = run_child(cache)
        warm = run_child(cache)
    out = dict(
        config="1918x1081 ladder(4) march_mode=pallas (the bench graph)",
        cold_first_call_s=round(cold["first_call_s"], 1),
        warm_first_call_s=round(warm["first_call_s"], 1),
        speedup=round(cold["first_call_s"] / max(warm["first_call_s"], 1e-9), 1),
        checksums_equal=cold.get("checksum") == warm.get("checksum"),
        device=jax.devices()[0].device_kind,
        note=(
            "first_call_s = jit trace + compile + one frame; the warm run "
            "is a fresh process hitting the on-disk XLA/Mosaic cache"
        ),
    )
    odir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(odir, exist_ok=True)
    with open(os.path.join(odir, "COMPILE_CACHE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
