#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Metric: effective Mrays/s at 1080p for the full default pipeline (adaptive
ladder, RK45 off/Euler on per default config, disk + redshift + sky + bloom
+ ACES + FXAA) on the available TPU chip.  vs_baseline is against the
BASELINE.md target of 50 Mrays/s/chip.
"""

import json
import sys


def main() -> int:
    import bhx

    bhx.enable_compile_cache()  # bench entry point opts in
    from bhx.bench import grad_check, parity_check, run_bench

    result = run_bench(width=1918, height=1081, iters=5)
    parity = parity_check()
    grad = grad_check()
    out = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "detail": {
            k: result[k]
            for k in ("best_s", "mean_s", "compile_s", "devices", "device_kind")
        }
        | parity
        | grad,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
