"""Compiled verification + small-N ladder for the VMEM-resident kernel.

The resident multi-step kernel (ops/resident.py) passes its interpret-mode
gates; interpret mode does NOT exercise the platform operand-ingestion bug
(docs/PERF.md) nor server-side Mosaic support for the in-kernel
transposes, so this script must pass on the real chip before the kernel
can route production traffic:

1. Oracle gate at N=4096: one compiled resident step vs the f64 oracle
   (exact-tier bar: zero components outside the 1% min-magnitude gate).
2. Multi-step sanity: 5 compiled resident steps vs the standard fused
   path (reassociation tolerance).
3. Throughput ladder at N in {4096, 8192, 16384}: resident K-step chunks
   vs the current auto path (bench_lib protocol: median of trials,
   device_get-timed, compile excluded).

Usage: python scripts/r6_resident.py [n1,n2,...]   (real TPU)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/bench_results_r3.jsonl"
STEPS = {4096: 1000, 8192: 500, 12288: 300, 16384: 200}


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r6_resident.log", "a") as f:
        f.write(msg + "\n")


def emit(rec):
    rec["script"] = "r6_resident"
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec))


def main():
    import jax
    import numpy as np
    from nbody_tpu.bench_lib import run_benchmark
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.init import init_state
    from nbody_tpu.ops.resident import resident_layout, run_steps_resident
    from nbody_tpu.ops.step import run_steps
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache
    from nbody_tpu.utils.timing import sync

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")

    # --- 1. compiled oracle gate at 4096 -------------------------------
    n = 4096
    cfg = SimConfig(n_bodies=n, seed=0)
    st = init_state(cfg)
    try:
        t0 = time.perf_counter()
        out1 = run_steps_resident(st, cfg, 1)
        acc = np.asarray(out1.acc)
        log(f"gate compile+run: {time.perf_counter() - t0:.1f}s "
            f"layout={resident_layout(n)}")
        ref = oracle_forces(np.asarray(st.pos), np.asarray(st.mass),
                            cfg.eps2)
        bad = relative_mismatch(acc, ref, 0.01, 1e-4)
        err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
        emit({"what": "resident_oracle_gate", "n": n,
              "badfrac": float(bad.mean()),
              "p99": float(np.percentile(err, 99))})
        if bad.mean() > 1e-6:
            log("ORACLE GATE FAILED — stopping (platform bug suspected)")
            return 1
    except Exception:
        log("gate CRASHED:\n" + traceback.format_exc())
        return 1

    # --- 2. multi-step sanity vs the fused path ------------------------
    try:
        r5 = run_steps_resident(st, cfg, 5)
        f5 = run_steps(st, cfg, 5, impl="pallas_sym2")
        dp = np.abs(np.asarray(r5.pos) - np.asarray(f5.pos))
        scale = np.abs(np.asarray(f5.pos)) + 1e3
        emit({"what": "resident_5step_vs_fused", "n": n,
              "max_rel": float((dp / scale).max())})
    except Exception:
        log("multi-step sanity CRASHED:\n" + traceback.format_exc())
        return 1

    # --- 3. throughput ladder ------------------------------------------
    sizes = (tuple(int(s) for s in sys.argv[1].split(","))
             if len(sys.argv) > 1 else (4096, 8192, 16384))
    for n in sizes:
        steps = STEPS.get(n, 200)
        lay = resident_layout(n)
        if lay is None:
            log(f"N={n}: no resident layout, skipping")
            continue
        try:
            cfg = SimConfig(n_bodies=n, seed=0)
            st = init_state(cfg)
            t0 = time.perf_counter()
            st = run_steps_resident(st, cfg, steps)
            sync(st.pos)
            warm_s = time.perf_counter() - t0
            per = []
            for _ in range(3):
                t0 = time.perf_counter()
                st = run_steps_resident(st, cfg, steps)
                sync(st.pos)
                per.append(time.perf_counter() - t0)
            med = float(np.sort(per)[1])
            gs = sorted(n * n * steps / s / 1e9 for s in per)
            emit({"what": "resident_ladder", "n": n, "steps": steps,
                  "layout": list(lay),
                  "ginter": round(n * n * steps / med / 1e9, 2),
                  "ginter_min": round(gs[0], 2),
                  "ginter_max": round(gs[-1], 2),
                  "ms_per_step": round(med / steps * 1e3, 4),
                  "warm_s": round(warm_s, 1),
                  "finite": bool(np.isfinite(np.asarray(st.pos[:64])).all())})
        except Exception:
            log(f"resident N={n} CRASHED:\n" + traceback.format_exc())
        try:
            r = run_benchmark(n=n, steps=min(steps, 100), trials=3)
            emit({"what": "auto_ladder", "n": n, "impl": r["impl"],
                  "ginter": r["value"], "ms_per_step": r["ms_per_step"],
                  "spread_pct": r["spread_pct"]})
        except Exception:
            log(f"auto N={n} CRASHED:\n" + traceback.format_exc())
    return 0


if __name__ == "__main__":
    sys.exit(main())
