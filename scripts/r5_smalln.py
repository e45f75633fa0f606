"""Small-N exact-tier tile sweep for the symmetric-weight kernel.

The auto tile policy (`resolve_block_u`) returns 1024 below 512k for the
exact family — tuned in round 3 on the CLASSIC pair-symmetric kernel
(`vpu`: "loses 14% above 1024 at 65k", docs/PERF.md tile sweeps).  The
round-4 production default `vpu2` (symmetric-weight, 23 flops/pair) has
a smaller per-pair live set, so its small-N optimum may sit higher.
This sweeps block_u at N=65k/262k on the bench harness (median of
trials, device_get-timed) to confirm or update the policy.

Usage: python scripts/r5_smalln.py [n1,n2,...]   (real TPU; ~10 min warm)
       default sizes: 65536,262144
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
    with open("/tmp/r5_smalln.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu.bench_lib import run_benchmark
    log(f"backend: {jax.default_backend()}")
    sizes = (tuple(int(s) for s in sys.argv[1].split(","))
             if len(sys.argv) > 1 else (65536, 262144))
    for n in sizes:
        for block_u in (1024, 1536, 2048):
            try:
                t0 = time.perf_counter()
                r = run_benchmark(n=n, steps=20, impl="pallas_sym2",
                                  trials=3, block_u=block_u)
                log(f"[smalln] n={n} block_u={block_u}: {r['value']} G/s "
                    f"(spread {r['spread_pct']}%, "
                    f"total {time.perf_counter() - t0:.0f} s)")
                with open(OUT, "a") as f:
                    f.write(json.dumps({"stage": "r5_smalln", "n": n,
                                        "block_u": block_u,
                                        **{k: r[k] for k in (
                                            "impl", "value", "ginter_min",
                                            "ginter_max", "ms_per_step",
                                            "finite")}}) + "\n")
            except Exception:
                log(f"[smalln] n={n} block_u={block_u} FAILED:\n"
                    f"{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
