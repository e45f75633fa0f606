"""Capstone scale probe: N=2^25 (33.5M) turbo, one timed step (~98 bounded
programs, ~46 min/step at the 16M rate)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_32m.log", "a") as f:
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
    try:
        cfg = SimConfig(n_bodies=n, impl="pallas_sym_turbo")
        pos, vel, acc, mass = init_state_flat(cfg)
        t0 = time.time()
        pos, vel, acc = run_steps_multiprog_flat(
            pos, vel, acc, mass, cfg, 1, impl="pallas_sym_turbo")
        np.asarray(pos[:8])
        log(f"[32M] compile+first step {time.time()-t0:.0f}s")
        t0 = time.time()
        pos, vel, acc = run_steps_multiprog_flat(
            pos, vel, acc, mass, cfg, 1, impl="pallas_sym_turbo")
        p = np.asarray(pos[:8])
        wall = time.time() - t0
        g = n * float(n) / wall / 1e9
        log(f"[32M] {wall:.1f} s/step = {g:.1f} GInter/s "
            f"finite={np.all(np.isfinite(p))}")
        with open("/root/repo/bench_results_r3.jsonl", "a") as f:
            f.write(json.dumps({"stage": "r3_scale_flat", "n": n,
                                "impl": "pallas_sym_turbo",
                                "s_per_step": wall,
                                "ginter_per_s": g}) + "\n")
    except Exception:
        log(f"[32M] FAILED:\n{traceback.format_exc()[-600:]}")
    log("DONE")
    return 0

if __name__ == "__main__":
    sys.exit(main())
