"""Capstone exact-tier probe: N=2^25 (33.5M) with `pallas_sym2` — one
timed step via the flat-state mode (~95 bounded programs; expect
~3600 s/step at the 310-315 G/s ladder rate).  Completes the round-4
story: the exact tier above the 300 north-star at the LARGEST N the
chip can hold.

Usage: python scripts/r4_33m_exact.py
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r4_33m_exact.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu import SimConfig
    from nbody_tpu.models.init import init_state_flat
    from nbody_tpu.ops.step import run_steps_multiprog_flat
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    n = 1 << 25
    impl = "pallas_sym2"
    try:
        cfg = SimConfig(n_bodies=n, impl=impl)
        pos, vel, acc, mass = init_state_flat(cfg)
        t0 = time.time()
        pos, vel, acc = run_steps_multiprog_flat(
            pos, vel, acc, mass, cfg, 1, impl=impl)
        np.asarray(pos[:8])
        log(f"[33M-exact] compile+first step {time.time() - t0:.0f}s")
        t0 = time.time()
        pos, vel, acc = run_steps_multiprog_flat(
            pos, vel, acc, mass, cfg, 1, impl=impl)
        p = np.asarray(pos[:8])
        wall = time.time() - t0
        g = n * float(n) / wall / 1e9
        log(f"[33M-exact] {wall:.1f} s/step = {g:.1f} GInter/s "
            f"finite={np.all(np.isfinite(p))}")
        with open("/root/repo/bench_results_r3.jsonl", "a") as f:
            f.write(json.dumps({"stage": "r4_scale_flat", "n": n,
                                "impl": impl, "s_per_step": wall,
                                "ginter_per_s": g}) + "\n")
    except Exception:
        log(f"[33M-exact] FAILED:\n{traceback.format_exc()[-600:]}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
