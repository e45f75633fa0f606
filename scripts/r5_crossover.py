"""Small-N exact-backend crossover sweep (auto-impl policy check).

resolve_impl routes TPU exact work to `pallas` below 16384 bodies and
`pallas_sym2` above — a threshold set in round 2, before the
symmetric-weight tier, its 1536 retune, and the XLA chunked-backend
matmul fix.  This measures the exact candidates (one-sided pallas,
pallas_sym2, xla_nxn <=16k, xla) at N=4k..32k to re-place (or confirm)
the crossover.

Usage: python scripts/r5_crossover.py     (real TPU; ~15 min cold)
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
    with open("/tmp/r5_crossover.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu.bench_lib import run_benchmark
    log(f"backend: {jax.default_backend()}")
    for n in (4096, 8192, 16384, 32768):
        impls = ["pallas", "pallas_sym2", "xla"]
        if n <= 16384:
            impls.append("xla_nxn")
        for impl in impls:
            try:
                t0 = time.perf_counter()
                r = run_benchmark(n=n, steps=50, impl=impl, trials=3)
                log(f"[xover] n={n} {impl}: {r['value']} G/s "
                    f"(spread {r['spread_pct']}%, "
                    f"total {time.perf_counter() - t0:.0f} s)")
                with open(OUT, "a") as f:
                    f.write(json.dumps({"stage": "r5_crossover", "n": n,
                                        **{k: r[k] for k in (
                                            "impl", "value", "ginter_min",
                                            "ginter_max", "ms_per_step",
                                            "finite")}}) + "\n")
            except Exception:
                log(f"[xover] n={n} {impl} FAILED:\n"
                    f"{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
