"""Round-4 scale ladder re-measure: the exact tier at 4M/8M(/16M) with
the symmetric-weight kernel (`pallas_sym2`, bounded programs) — expect
the round-3 exact rows (271/267/271) to lift ~16% with the per-pair
flop reduction.  Uses the bench harness (median-of-trials, device_get
timed); continue-on-error per config.

Usage: python scripts/r4_scale.py [4m,8m,16m]
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
    with open("/tmp/r4_scale.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu.bench_lib import run_benchmark
    log(f"backend: {jax.default_backend()}")
    which = set((sys.argv[1] if len(sys.argv) > 1 else "4m,8m").split(","))
    ladder = {"4m": (1 << 22, 2, 2), "8m": (1 << 23, 1, 2),
              "16m": (1 << 24, 1, 1)}
    for key, (n, steps, trials) in ladder.items():
        if key not in which:
            continue
        for impl in ("pallas_sym2", "pallas_sym_turbo"):
            if key == "16m" and impl != "pallas_sym2":
                continue   # turbo 16M is the round-3 412.9 record; skip
            try:
                t0 = time.perf_counter()
                r = run_benchmark(n=n, steps=steps, impl=impl,
                                  trials=trials, warmup_steps=1)
                log(f"[scale] {key} {impl}: {r['value']} G/s "
                    f"({r['ms_per_step'] / 1000:.1f} s/step, spread "
                    f"{r['spread_pct']}%, total "
                    f"{time.perf_counter() - t0:.0f} s)")
                with open(OUT, "a") as f:
                    f.write(json.dumps({"stage": "r4_scale", "n": n,
                                        **{k: r[k] for k in (
                                            "impl", "value", "ginter_min",
                                            "ginter_max", "ms_per_step",
                                            "finite")}}) + "\n")
            except Exception:
                log(f"[scale] {key} {impl} FAILED:\n"
                    f"{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
