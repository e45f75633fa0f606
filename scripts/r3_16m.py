"""16.7M-body turbo attempt with the scanned self-sweep program (bounded
temporaries) and full OOM reporting on failure."""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_16m.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    from nbody_tpu import SimConfig, init_state
    from nbody_tpu.ops.step import run_steps_multiprog
    from nbody_tpu.utils.compcache import enable_compilation_cache
    import json

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    n = 1 << 24
    try:
        cfg = SimConfig(n_bodies=n, impl="pallas_sym_turbo")
        state = init_state(cfg)
        t0 = time.time()
        state = run_steps_multiprog(state, cfg, 1, impl="pallas_sym_turbo")
        np.asarray(state.pos[:8])
        log(f"[16M] compile+first step {time.time() - t0:.0f}s")
        t0 = time.time()
        state = run_steps_multiprog(state, cfg, 1, impl="pallas_sym_turbo")
        p = np.asarray(state.pos[:8])
        wall = time.time() - t0
        g = n * float(n) / wall / 1e9
        log(f"[16M] {wall:.1f} s/step = {g:.1f} GInter/s "
            f"finite={np.all(np.isfinite(p))}")
        with open("/root/repo/bench_results_r3.jsonl", "a") as f:
            f.write(json.dumps({"stage": "r3_scale", "n": n,
                                "impl": "pallas_sym_turbo", "block_u": 2048,
                                "s_per_step": wall,
                                "ginter_per_s": g}) + "\n")
    except Exception:
        log("[16M] FAILED (full traceback):")
        log(traceback.format_exc())
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
