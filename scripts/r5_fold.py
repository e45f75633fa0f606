"""Measure the "fold" grid schedule for the VPU exact tiers on the chip.

Fold (grid (I, dd, si), si innermost, scratch-folded scatter) cuts the
resident scatter buffer's dynamic-offset RMWs and the j-stream DMAs by
the sub-factor (3x at 512x1536).  The round-2 ablation priced the
classic scatter at ~9% of the exact tier; this measures how much of
that fold recovers, plus a compiled accuracy gate (interpret mode does
NOT catch the platform operand-ingestion bug, docs/PERF.md).

Usage: python scripts/r5_fold.py            (real TPU; ~20 min cold)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/bench_results_r3.jsonl"


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r5_fold.log", "a") as f:
        f.write(msg + "\n")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.init import init_state
    log(f"backend: {jax.default_backend()}")

    # Route the exact tiers through fold for this whole process (resolved
    # at trace time; nothing was traced yet).
    fps.DEFAULT_SCHEDULE["vpu"] = "fold"
    fps.DEFAULT_SCHEDULE["vpu2"] = "fold"

    # 1) Compiled accuracy gate at N=8192 (platform-bug sentinel).
    s = init_state(SimConfig(n_bodies=8192))
    pos, mass = s.pos, s.mass
    for variant in ("vpu2", "vpu"):
        acc = np.asarray(fps.forces_pallas_sym(
            jnp.asarray(pos), jnp.asarray(mass), 0.002,
            block_i=512, block_u=1536, variant=variant, interpret=False))
        ref = oracle_forces(np.asarray(pos, np.float64),
                            np.asarray(mass, np.float64), 0.002)
        bad = relative_mismatch(acc, ref, 0.01, 1e-4).mean()
        err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
        p99 = float(np.percentile(err, 99))
        log(f"[fold-acc] {variant} badfrac={bad:.3g} p99={p99:.3g}")
        with open(OUT, "a") as f:
            f.write(json.dumps({"stage": "r5_fold_acc", "variant": variant,
                                "badfrac": float(bad), "p99": p99}) + "\n")
        if bad > 0 or p99 > 1e-4:
            log("[fold-acc] FAILED exact gate -- stopping before perf")
            return 1

    # 2) Bench-harness throughput, fold schedule (classic comparison rows
    #    already measured: 314.13 at 1M, 273.0 at 65k, 309.6 at 262k).
    from nbody_tpu.bench_lib import run_benchmark
    for n, steps in ((65536, 20), (262144, 20), (1048576, 10)):
        try:
            t0 = time.perf_counter()
            r = run_benchmark(n=n, steps=steps, impl="pallas_sym2", trials=3)
            log(f"[fold] n={n}: {r['value']} G/s (spread {r['spread_pct']}%, "
                f"total {time.perf_counter() - t0:.0f} s)")
            with open(OUT, "a") as f:
                f.write(json.dumps({"stage": "r5_fold", "n": n,
                                    "schedule": "fold",
                                    **{k: r[k] for k in (
                                        "impl", "value", "ginter_min",
                                        "ginter_max", "ms_per_step",
                                        "finite")}}) + "\n")
        except Exception:
            log(f"[fold] n={n} FAILED:\n{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
