"""Round-9 ladder completion: the two unmeasured dyadic N on the exact tier.

The exact (`pallas_sym2`) single-chip ladder is measured at 4k-16k
(resident), 65,536 (291.6, quantization-settled), 262,144 (309.6), 1M
(314.2), 4M/8M/16.7M/33.5M (315) — but the dyadic points N=32,768 and
N=131,072 between the resident window and the >=300 region were never
measured.  This sweep fills them under the same honest protocol
(duration-targeted trials, median of 3, device_get-timed) so the
BASELINE ladder has no holes:

- N=32,768: auto tile is (512, 1024) (below the 65k 1536-crossover);
  measure 1024 vs 1536 to confirm the crossover from below.
- N=131,072: auto tile is (512, 1536) (the 65k-up vpu2 policy, tuned
  at 65k and 262k); measure 1536 vs 2048 — turbo's 2048-crossover sits
  exactly at 131k, so check whether vpu2's does too.

Usage: python scripts/r9_ladder.py [32k|131k|all]   (real TPU)
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
    with open("/tmp/r9_ladder.log", "a") as f:
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
    if what in ("32k", "all"):
        for bi, bu in ((512, 1024),    # auto (below the 1536 crossover)
                       (512, 1536)):
            run("r9_32k_exact", 32768, "pallas_sym2", bi, bu)
    if what in ("131k", "all"):
        for bi, bu in ((512, 1536),    # auto (65k-up vpu2 policy)
                       (512, 2048)):
            run("r9_131k_exact", 131072, "pallas_sym2", bi, bu)
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
