"""Forced-layout sweep of the resident kernel at one N (real TPU).

The auto chooser minimizes padded body count, which at N=16384 picks a
narrow 43x384 layout that measured SLOWER than the standard path (182.7
vs 202.5 G/s); wide-tile layouts pay more ghost-pair work but fewer
phase overheads.  Usage: python scripts/r6_resident_lay.py 16384 "17,1024,128;9,2048,64"
"""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/bench_results_r3.jsonl"


def main():
    import numpy as np
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.init import init_state
    from nbody_tpu.ops.resident import run_steps_resident
    from nbody_tpu.utils.compcache import enable_compilation_cache
    from nbody_tpu.utils.timing import sync

    enable_compilation_cache()
    n = int(sys.argv[1])
    layouts = [tuple(int(x) for x in part.split(","))
               for part in sys.argv[2].split(";")]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    cfg = SimConfig(n_bodies=n, seed=0)
    st0 = init_state(cfg)
    for lay in layouts:
        try:
            st = st0
            t0 = time.perf_counter()
            st = run_steps_resident(st, cfg, steps, layout=lay)
            sync(st.pos)
            warm = time.perf_counter() - t0
            per = []
            for _ in range(3):
                t0 = time.perf_counter()
                st = run_steps_resident(st, cfg, steps, layout=lay)
                sync(st.pos)
                per.append(time.perf_counter() - t0)
            med = float(np.sort(per)[1])
            gs = sorted(n * n * steps / s / 1e9 for s in per)
            rec = {"what": "resident_layout_sweep", "n": n, "steps": steps,
                   "layout": list(lay),
                   "ginter": round(n * n * steps / med / 1e9, 2),
                   "ginter_min": round(gs[0], 2),
                   "ginter_max": round(gs[-1], 2),
                   "warm_s": round(warm, 1),
                   "finite": bool(np.isfinite(np.asarray(st.pos[:64])).all()),
                   "script": "r6_resident_lay"}
        except Exception:
            print(f"layout {lay} CRASHED:\n" + traceback.format_exc(),
                  flush=True)
            rec = {"what": "resident_layout_sweep", "n": n,
                   "layout": list(lay), "crashed": True,
                   "script": "r6_resident_lay"}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
