import json, sys
sys.path.insert(0, "/root/repo")
import bhx
bhx.enable_compile_cache()
from bhx.bench import run_bench
out = {}
# Interleave to decorrelate drift: on, off, on, off
for tag, flag in (("adaptive_1", True), ("fixed_1", False),
                  ("adaptive_2", True), ("fixed_2", False)):
    r = run_bench(iters=5, adaptive_sublanes=flag)
    out[tag] = dict(mrays=r["value"], best_s=r["best_s"], compile_s=r["compile_s"])
    print(tag, out[tag], flush=True)
json.dump(out, open("/root/repo/scripts/out/SUBLANES_AB.json", "w"), indent=1)
