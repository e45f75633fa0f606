"""Wide-tile probe for the MXU-bound tiers (turbo, mxu) at N=1M.

Every tile sweep so far stopped at block_u=2048.  OUTCOME: closed
WITHOUT chip time — (512, 2560) is killed by the VMEM wall: the fused
working set alone is ~11.9 MB, capping the resident scatter buffer at
panel_nb<=33 (odd), and a 33x2560 panel layout at N=1M needs 13 panels
x 33 = 429 blocks for 410 needed (+4.6% ghost bodies = ~9% extra pair
work) — structurally worse than 2048's balanced layouts before any
kernel effect.  The auto layout's preferred nb=41 (10x41 = 410 exact)
is correctly REJECTED by _validate_sym_blocks (15.2 MB > 14.7 budget).
(512, 3072) exceeds the budget on the working set alone; (256, 2560)
fits but block_i=256 measured -15% (scripts/r5_mxu.py).  2048 is a real
optimum, not a sweep boundary.

Usage: python scripts/r5_wide.py     (real TPU; kept for re-testing if
the VMEM budget or panel-layout constraints ever change)
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
    with open("/tmp/r5_wide.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu.bench_lib import run_benchmark
    log(f"backend: {jax.default_backend()}")
    n = 1 << 20
    for impl in ("pallas_sym_turbo", "pallas_sym_mxu"):
        try:
            t0 = time.perf_counter()
            r = run_benchmark(n=n, steps=10, impl=impl, trials=3,
                              block_i=512, block_u=2560)
            log(f"[wide] {impl} bu=2560: {r['value']} G/s "
                f"(spread {r['spread_pct']}%, "
                f"total {time.perf_counter() - t0:.0f} s)")
            with open(OUT, "a") as f:
                f.write(json.dumps({"stage": "r5_wide", "n": n,
                                    "block_i": 512, "block_u": 2560,
                                    **{k: r[k] for k in (
                                        "impl", "value", "ginter_min",
                                        "ginter_max", "ms_per_step",
                                        "finite")}}) + "\n")
        except Exception:
            log(f"[wide] {impl} FAILED:\n{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
