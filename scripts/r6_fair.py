"""Fair small-N ladder: resident vs standard at EQUAL steps-per-program.

scripts/r6_resident.py's first ladder compared resident chunks of
STEPS[n] steps against bench_lib's default 100-step programs — at small
N a 100-step program is ~10-40 ms of device compute, so per-dispatch
relay sync dominated the baseline and inflated the resident "speedup"
(44 G/s "standard" at N=4096 vs 123.6 measured honestly).  This script
times both paths over identical K-step programs, identical sync pattern
(device_get per trial), compile excluded, median of 3.

Usage: python scripts/r6_fair.py [n1,n2,...]   (real TPU)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/bench_results_r3.jsonl"
STEPS = {1024: 6000, 2048: 4000, 3072: 3000, 4096: 2000, 8192: 1000,
         12288: 500, 16384: 400, 20480: 300, 24576: 200}


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r6_fair.log", "a") as f:
        f.write(msg + "\n")


def emit(rec):
    rec["script"] = "r6_fair"
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec))


def _time(advance, st, steps, n):
    import numpy as np
    from nbody_tpu.utils.timing import sync
    t0 = time.perf_counter()
    st = advance(st, steps)
    sync(st.pos)
    warm_s = time.perf_counter() - t0
    per = []
    for _ in range(3):
        t0 = time.perf_counter()
        st = advance(st, steps)
        sync(st.pos)
        per.append(time.perf_counter() - t0)
    med = float(np.sort(per)[1])
    gs = sorted(n * n * steps / s / 1e9 for s in per)
    finite = bool(np.isfinite(np.asarray(st.pos[:64])).all())
    return {"ginter": round(n * n * steps / med / 1e9, 2),
            "ginter_min": round(gs[0], 2), "ginter_max": round(gs[-1], 2),
            "ms_per_step": round(med / steps * 1e3, 4),
            "warm_s": round(warm_s, 1), "finite": finite}


def main():
    import jax
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.init import init_state
    from nbody_tpu.ops.resident import resident_layout, run_steps_resident
    from nbody_tpu.ops.step import run_steps
    from nbody_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    sizes = (tuple(int(s) for s in sys.argv[1].split(","))
             if len(sys.argv) > 1 else (4096, 8192, 12288, 16384))
    for n in sizes:
        steps = STEPS.get(n, 400)
        cfg = SimConfig(n_bodies=n, seed=0)
        st = init_state(cfg)
        lay = resident_layout(n)
        for name, advance in (
                ("resident", lambda s, k: run_steps_resident(s, cfg, k)),
                ("standard", lambda s, k: run_steps(s, cfg, k,
                                                    impl="pallas_sym2")),
                ("pallas", lambda s, k: run_steps(s, cfg, k,
                                                  impl="pallas"))):
            if name == "resident" and lay is None:
                log(f"N={n}: no resident layout, skipping")
                continue
            try:
                rec = _time(advance, st, steps, n)
                rec.update({"what": "fair_ladder", "n": n, "steps": steps,
                            "path": name,
                            "layout": list(lay) if name == "resident"
                            else None})
                emit(rec)
            except Exception:
                log(f"{name} N={n} CRASHED:\n" + traceback.format_exc())
    return 0


if __name__ == "__main__":
    sys.exit(main())
