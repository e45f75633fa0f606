"""Tile sweep for the near-exact MXU tier (`pallas_sym_mxu`, p99 ~4e-4).

Round 2 measured mxu at 245 G/s @1M on the exact family's auto tile
(512x1536).  Like turbo, mxu moves both accumulations onto the MXU
(hi/lo inv limbs x mass-folded packs), so its VPU live set is small and
its optimum may sit at turbo's 2048 — this sweeps block_u (and one
block_i=256 point) at N=1M to place the capability row properly.

Usage: python scripts/r5_mxu.py            (real TPU; ~20 min cold)
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
    with open("/tmp/r5_mxu.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu.bench_lib import run_benchmark
    log(f"backend: {jax.default_backend()}")
    n = 1 << 20
    for block_i, block_u in ((512, 1536), (512, 2048), (256, 2048)):
        try:
            t0 = time.perf_counter()
            r = run_benchmark(n=n, steps=10, impl="pallas_sym_mxu",
                              trials=3, block_i=block_i, block_u=block_u)
            log(f"[mxu] bi={block_i} bu={block_u}: {r['value']} G/s "
                f"(spread {r['spread_pct']}%, "
                f"total {time.perf_counter() - t0:.0f} s)")
            with open(OUT, "a") as f:
                f.write(json.dumps({"stage": "r5_mxu", "n": n,
                                    "block_i": block_i, "block_u": block_u,
                                    **{k: r[k] for k in (
                                        "impl", "value", "ginter_min",
                                        "ginter_max", "ms_per_step",
                                        "finite")}}) + "\n")
        except Exception:
            log(f"[mxu] bi={block_i} bu={block_u} FAILED:\n"
                f"{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
