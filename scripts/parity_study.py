#!/usr/bin/env python
"""Pin the on-chip pallas<->jnp parity residual (VERDICT r4 weak #3).

The bench parity gate sees ~0.5% of pixels differ by > 2e-2 between the
kernel pipeline and the jnp pipeline at 192x108.  Two candidate sources:

  (a) the MARCH: tile-exit / vote granularity, budget overrun;
  (b) the SHADING: shade_composite + sky kernels vs jnp disk_shade +
      finalize (different op orderings and pow-free forms).

This script separates them:

  1. Row-wise record comparison: trace records hold march-determined
     rows (alpha, amount, dir) and shaded color rows.  If dir/alpha
     match tightly while colors differ, the residual is shading math,
     not kernel control flow.
  2. vote_every A/B (32 -> 8 -> 1): if the march residual is vote
     granularity, its bad_frac must shrink toward 0 as votes get exact.

Writes scripts/out/PARITY_STUDY.json.  Run on the chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bhx

bhx.enable_compile_cache()  # persistent XLA/Mosaic cache (explicit opt-in)


def main():
    import dataclasses

    import jax
    import numpy as np

    from bhx.config import BloomConfig, FxaaConfig, RenderConfig
    from bhx.pipeline import render_jit, trace_image_record_rows
    from bhx.scene import Scene

    W, H = 192, 108
    scene = Scene.default()
    base = RenderConfig(
        width=W, height=H, use_ladder=False, max_iterations=600,
        fxaa=FxaaConfig(enabled=False), bloom=BloomConfig(enabled=False),
        tonemap=False,
    )

    def rows_for(mode):
        f = jax.jit(
            lambda s: trace_image_record_rows(
                s, base.replace(march_mode=mode), W, H
            )
        )
        return [np.asarray(r) for r in f(scene)]

    rows_j = rows_for("fast")
    rows_p = rows_for("pallas")
    names = ["cr", "cg", "cb", "alpha", "amount", "dx", "dy", "dz"]
    row_stats = {}
    for n, a, b in zip(names, rows_p, rows_j):
        d = np.abs(a - b)
        row_stats[n] = dict(
            bad_frac_2em2=round(float((d > 2e-2).mean()), 6),
            bad_frac_1em3=round(float((d > 1e-3).mean()), 6),
            max_abs=round(float(d.max()), 6),
        )

    # march-determined vs shading-determined aggregate
    march_rows = ["alpha", "amount", "dx", "dy", "dz"]
    color_rows = ["cr", "cg", "cb"]
    agg = lambda keys: round(
        max(row_stats[k]["bad_frac_2em2"] for k in keys), 6
    )

    # vote_every A/B on the FULL image diff (the bench gate's measure).
    img_j = np.asarray(render_jit(scene, base.replace(march_mode="fast")))
    votes = {}
    for ve in (32, 8, 1):
        cfg = base.replace(march_mode="pallas", pallas_vote_every=ve)
        img_p = np.asarray(render_jit(scene, cfg))
        votes[str(ve)] = round(
            float((np.abs(img_p - img_j) > 2e-2).any(-1).mean()), 6
        )

    out = dict(
        resolution=[W, H],
        row_stats=row_stats,
        march_rows_worst_bad_frac=agg(march_rows),
        color_rows_worst_bad_frac=agg(color_rows),
        image_bad_frac_by_vote_every=votes,
        device=jax.devices()[0].device_kind,
        conclusion=(
            "residual is shading-side"
            if agg(march_rows) < 0.1 * max(agg(color_rows), 1e-9)
            else "residual has a march-side component"
        ),
    )
    odir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(odir, exist_ok=True)
    with open(os.path.join(odir, "PARITY_STUDY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
