"""Round-7 perf sweep: the ladder's two sub-north-star rows (VERDICT r3
weak #1 / next #4).

1. N=65,536 exact (`pallas_sym2`): 290.9 G/s = 0.97x under the honest
   duration-targeted protocol at the auto tile (512x1536).  Sweep
   (block_i, block_u) around the incumbent — the 1536 tile was tuned
   under the OLD 20-step protocol (docs/PERF.md round-5 sweep); the
   honest protocol moved the measured rate +6.6%, so the optimum may
   have moved too.
2. N=1M near-exact (`pallas_sym_mxu`): 275.6 = 0.92x at turbo-shaped
   tiles (512x2048).  The tier is VPU-bound (~15 flops/pair at ~65% of
   the peak the exact tier reaches 89% of), so block-shape slack is the
   cheapest lever before an SOL settlement.

Protocol: bench harness, duration-targeted trials (steps=None sizes
~1.5 s of device work), median of 3, device_get-timed — the same
protocol as BASELINE's round-6 addendum, so rows compare 1:1.

Usage: python scripts/r7_perf.py [65k|mxu|all]   (real TPU)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/bench_results_r4.jsonl"


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r7_perf.log", "a") as f:
        f.write(msg + "\n")


def run(stage, n, impl, block_i, block_u):
    from nbody_tpu.bench_lib import run_benchmark
    try:
        t0 = time.perf_counter()
        r = run_benchmark(n=n, impl=impl, trials=3,
                          block_i=block_i, block_u=block_u)
        log(f"[{stage}] n={n} {impl} bi={block_i} bu={block_u}: "
            f"{r['value']} G/s (spread {r['spread_pct']}%, steps "
            f"{r['steps']}, total {time.perf_counter() - t0:.0f} s)")
        with open(OUT, "a") as f:
            f.write(json.dumps({
                "stage": stage, "n": n, "block_i": block_i,
                "block_u": block_u,
                **{k: r[k] for k in ("impl", "value", "steps",
                                     "ginter_min", "ginter_max",
                                     "spread_pct", "ms_per_step",
                                     "finite")}}) + "\n")
        return r["value"]
    except Exception:
        log(f"[{stage}] n={n} {impl} bi={block_i} bu={block_u} FAILED:\n"
            f"{traceback.format_exc()}")
        return None


def main():
    import jax
    log(f"backend: {jax.default_backend()}")
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("65k", "all"):
        for bi, bu in ((512, 1536),    # incumbent (290.9 r6 addendum)
                       (512, 1024), (512, 2048),
                       (256, 1536), (1024, 1536)):
            run("r7_65k_exact", 65536, "pallas_sym2", bi, bu)
    if what in ("mxu", "all"):
        for bi, bu in ((512, 2048),    # incumbent (275.6 r5 sweep)
                       (1024, 2048), (512, 2560), (512, 3072)):
            run("r7_mxu_1m", 1048576, "pallas_sym_mxu", bi, bu)
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
